"""Device ops on the LiDAR map: frustum culling, depth projection, NN search.

TPU-first re-design of src/lidar/pcd_projection.cc and src/lidar/kdtree.cc.
The reference walks a hash-grid of ~1 m^3 cells with OpenMP, splats points into
a z-buffered depth image behind mutexes, and 1-NN queries a FLANN kd-tree.
None of that maps to a vector machine, so the formulation here is different
but produces the same associations:

  * frustum culling  — a vectorized 5-half-space test over all grid-cell
    centers at once (pcd_projection.cc:499-559 semantics, one fused kernel).
  * depth projection — instead of scatter-splatting points into an image and
    reading feature pixels back, we compute for every (feature, candidate
    point) pair whether the point's depth-dependent splat footprint covers the
    feature pixel, and take the nearest covering point per feature with a
    blocked running argmin (pcd_projection.cc:376-462 semantics, no scatter,
    no mutexes, exact — the reference's OpenMP insert order races are gone).
  * NN search        — blocked brute-force 1-NN over the map with a running
    min, exact (the kd-tree replacement). The map distance matrix is never
    materialized: candidates stream through VMEM-sized chunks.

All shapes static; candidate sets are padded & masked by the host layer
(models/lidar_map.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import camera_models as cm
from . import se3

Array = jax.Array

# The reference normalizes splat footprints by this focal length
# (pcd_projection.cc:384-388 magic constant) and by depth_image_scale/0.2.
_REF_FOCAL = 3039.0
_REF_SCALE = 0.2


class ProjOptions(NamedTuple):
    """Depth-projection options (PcdProjectionOptions, pcd_projection.h:31-46)."""

    depth_image_scale: float = 0.2
    max_proj_scale: int = 10
    min_proj_scale: int = 2
    min_proj_dist: float = 2.0
    choose_meter: float = 40.0
    min_lidar_proj_dist: float = 0.5
    submap_cell: float = 1.0  # submap_length/width/height (cubical cells)


def frustum_planes(q: Array, t: Array, fx, fy, cx, cy, width, height, choose_meter):
    """The 5 planes of the view pyramid (camera apex + 4 corners at depth D).

    Returns planes [5,4] with inward side satisfying a.x+b.y+c.z+d <= 0,
    matching SearchSubMap/SearchImageMap (pcd_projection.cc:258-297,499-559).
    (fx..cy, width, height are at full resolution; the reference builds the
    pyramid from the scaled depth image but the frustum is scale-invariant.)
    """
    qi = se3.quat_conj(q)
    center = se3.projection_center(q, t)  # apex
    x_min = -cx / fx
    x_max = (width - cx) / fx
    y_min = -cy / fy
    y_max = (height - cy) / fy
    D = choose_meter
    corners_cam = jnp.stack(
        [
            jnp.stack([x_max * D, y_max * D, D]),
            jnp.stack([x_max * D, y_min * D, D]),
            jnp.stack([x_min * D, y_min * D, D]),
            jnp.stack([x_min * D, y_max * D, D]),
        ]
    )  # [4,3]
    corners = se3.quat_rotate(qi[None, :], corners_cam) + center[None, :]

    # orient each plane so that the frustum centroid is on the inside (<= 0)
    centroid = (center + jnp.sum(corners, axis=0)) / 5.0

    def oriented(p0, p1, p2):
        n = jnp.cross(p1 - p0, p2 - p0)
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
        d = -jnp.dot(n, p0)
        flip = jnp.where(jnp.dot(n, centroid) + d > 0, -1.0, 1.0)
        return jnp.concatenate([n * flip, jnp.array([d * flip])])

    c1, c2, c3, c4 = corners[0], corners[1], corners[2], corners[3]
    planes = jnp.stack(
        [
            oriented(c1, c2, c3),  # far plane through the 4 corners
            oriented(center, c1, c2),
            oriented(center, c2, c3),
            oriented(center, c3, c4),
            oriented(center, c4, c1),
        ]
    )
    return planes


@jax.jit
def points_in_frustum(planes: Array, pts: Array) -> Array:
    """Boolean mask of pts [M,3] inside all 5 half-spaces."""
    vals = pts @ planes[:, :3].T + planes[None, :, 3]  # [M,5]
    return jnp.all(vals <= 0.0, axis=-1)


def splat_scales(dist: Array, fx, fy, opts: ProjOptions):
    """Depth-dependent splat half-extent in scaled pixels (x and y).

    Linear from max_proj_scale at min_proj_dist down to min_proj_scale at
    choose_meter, normalized by focal/3039 and scale/0.2
    (pcd_projection.cc:376-413; the reference's b_y uses min_proj_scale
    unscaled — an apparent typo we do not reproduce: both axes use the
    scaled min).
    """
    s = opts.depth_image_scale / _REF_SCALE

    def one_axis(f):
        mx = opts.max_proj_scale * (f / _REF_FOCAL) * s
        mn = opts.min_proj_scale * (f / _REF_FOCAL) * s
        a = (mx - mn) / (opts.min_proj_dist - opts.choose_meter)
        b = mn - a * opts.choose_meter
        sc = jnp.where(dist <= opts.min_proj_dist, mx, a * dist + b)
        return jnp.floor(sc)

    return one_axis(fx), one_axis(fy)


@functools.partial(jax.jit, static_argnames=("model_id", "opts", "block"))
def depth_project(
    feat_xy: Array,  # [F,2] full-res feature pixels
    feat_valid: Array,  # [F] f32
    cand_pts: Array,  # [M,3] world-frame candidate lidar points (frustum-culled)
    cand_nrm: Array,  # [M,3]
    cand_valid: Array,  # [M] f32
    q: Array,
    t: Array,
    params: Array,  # [12] camera params
    width: int,
    height: int,
    model_id: int,
    opts: ProjOptions,
    block: int = 8192,
) -> tuple[Array, Array, Array]:
    """For each feature pixel, the nearest lidar point whose splat covers it.

    Returns (lidar_pt [F,3], lidar_nrm [F,3], found [F] bool). Implements the
    ImageMapProj z-buffer semantics (pcd_projection.cc:315-462): points project
    through the full camera model (the reference hardcodes OpenCV distortion,
    DistortOpenCV pcd_projection.cc:561-594 — we use the image's actual model),
    cover a rectangle of +-scale pixels in the depth_image_scale grid, and the
    covering point with minimum distance-to-camera-center wins.
    """
    sc = opts.depth_image_scale
    fx, fy, _, _ = cm.focal_pp(params, model_id)
    # feature pixels in scaled-int grid (reference: (xy*scale).cast<int>)
    fuv = jnp.floor(feat_xy * sc)
    in_img = (
        (fuv[:, 0] >= 0)
        & (fuv[:, 0] < jnp.floor(width * sc))
        & (fuv[:, 1] >= 0)
        & (fuv[:, 1] < jnp.floor(height * sc))
    )
    feat_ok = (feat_valid > 0) & in_img

    F = feat_xy.shape[0]
    M = cand_pts.shape[0]
    nblk = -(-M // block)
    Mp = nblk * block
    if Mp != M:
        cand_pts = jnp.pad(cand_pts, ((0, Mp - M), (0, 0)))
        cand_nrm = jnp.pad(cand_nrm, ((0, Mp - M), (0, 0)))
        cand_valid = jnp.pad(cand_valid, ((0, Mp - M),))

    big = jnp.float32(1e30)

    def body(carry, blk_idx):
        best_dist, best_idx = carry
        start = blk_idx * block
        pts = jax.lax.dynamic_slice_in_dim(cand_pts, start, block)
        val = jax.lax.dynamic_slice_in_dim(cand_valid, start, block)
        pc = se3.se3_apply(q, t, pts)  # [B,3]
        z = pc[:, 2]
        dist = jnp.linalg.norm(pc, axis=-1)
        xy, _ = cm.project(model_id, params, q, t, pts)  # full-model projection
        puv = jnp.round(xy * sc)  # [B,2]
        sx, sy = splat_scales(z, fx, fy, opts)
        # choose_meter caps candidate depth exactly (the frustum pyramid's
        # far plane, pcd_projection.cc:258-297 — applied here so the
        # full-map path needs no host-side culling at all)
        ok = (
            (val > 0)
            & (z > 0)
            & (z >= opts.min_lidar_proj_dist)
            & (z <= opts.choose_meter)
        )
        # coverage test per (feature, candidate): |fu - pu| <= sx etc.
        du = jnp.abs(fuv[:, 0:1] - puv[None, :, 0])  # [F,B]
        dv = jnp.abs(fuv[:, 1:2] - puv[None, :, 1])
        cover = (du <= sx[None, :]) & (dv <= sy[None, :]) & ok[None, :]
        d = jnp.where(cover, dist[None, :], big)  # [F,B]
        bi = jnp.argmin(d, axis=1)  # [F]
        bd = jnp.take_along_axis(d, bi[:, None], axis=1)[:, 0]
        upd = bd < best_dist
        best_dist = jnp.where(upd, bd, best_dist)
        best_idx = jnp.where(upd, start + bi, best_idx)
        return (best_dist, best_idx), None

    init = (jnp.full((F,), big), jnp.zeros((F,), jnp.int32))
    (best_dist, best_idx), _ = jax.lax.scan(body, init, jnp.arange(nblk, dtype=jnp.int32))
    found = (best_dist < big) & feat_ok
    lpt = cand_pts[best_idx]
    lnr = cand_nrm[best_idx]
    return lpt, lnr, found


@functools.partial(jax.jit, static_argnames=("width", "height", "model_id", "opts", "block"))
def depth_project_batch(
    feat_xy, feat_valid, cand_pts, cand_nrm, cand_valid, q, t, params,
    width, height, model_id, opts: ProjOptions, block: int = 8192,
):
    """vmapped depth_project over a batch of views (leading axis B)."""
    return jax.vmap(
        lambda fx, fv, cp, cn, cv, qq, tt, pp: depth_project(
            fx, fv, cp, cn, cv, qq, tt, pp, width, height, model_id, opts, block
        )
    )(feat_xy, feat_valid, cand_pts, cand_nrm, cand_valid, q, t, params)


@functools.partial(jax.jit, static_argnames=("width", "height", "model_id", "opts", "block"))
def depth_project_shared(
    feat_xy,  # [B,F,2]
    feat_valid,  # [B,F]
    map_pts,  # [M,3] — the FULL map, resident on device, shared across views
    map_nrm,  # [M,3]
    map_valid,  # [M]
    q,  # [B,4]
    t,  # [B,3]
    params,  # [B,12]
    width, height, model_id, opts: ProjOptions, block: int = 8192,
):
    """depth_project vmapped over views with ONE shared candidate set: the
    whole map. The projection itself culls (in-image, z in
    [min_lidar_proj_dist, choose_meter]), so host-side frustum gathering —
    and the [B,M] candidate-index upload it forces through the tunnel every
    local-BA round — disappears entirely; the map streams from HBM."""
    return jax.vmap(
        lambda fx, fv, qq, tt, pp: depth_project(
            fx, fv, map_pts, map_nrm, map_valid, qq, tt, pp,
            width, height, model_id, opts, block
        )
    )(feat_xy, feat_valid, q, t, params)


@functools.partial(jax.jit, static_argnames=("block",))
def nn_query(
    queries: Array,  # [Q,3]
    map_pts: Array,  # [M,3]
    map_valid: Array,  # [M] f32
    block: int = 65536,
) -> tuple[Array, Array]:
    """Exact 1-NN: returns (nn_idx [Q], nn_dist [Q]) with a blocked running min.

    Replaces pcl::KdTreeFLANN (src/lidar/kdtree.cc:5-21). Brute force on the
    MXU beats pointer-chasing on a vector machine for the map sizes involved:
    the distance matrix streams through in blocks and is never materialized.
    """
    Q = queries.shape[0]
    M = map_pts.shape[0]
    nblk = -(-M // block)
    Mp = nblk * block
    if Mp != M:
        map_pts = jnp.pad(map_pts, ((0, Mp - M), (0, 0)))
        map_valid = jnp.pad(map_valid, ((0, Mp - M),))

    qn = jnp.sum(queries * queries, axis=-1)  # [Q]
    big = jnp.float32(1e30)

    def body(carry, blk_idx):
        best_d2, best_i = carry
        start = blk_idx * block
        pts = jax.lax.dynamic_slice_in_dim(map_pts, start, block)
        val = jax.lax.dynamic_slice_in_dim(map_valid, start, block)
        pn = jnp.sum(pts * pts, axis=-1)
        cross = queries @ pts.T  # [Q,B] — MXU
        d2 = qn[:, None] + pn[None, :] - 2.0 * cross
        d2 = jnp.where(val[None, :] > 0, d2, big)
        bi = jnp.argmin(d2, axis=1)
        bd = jnp.take_along_axis(d2, bi[:, None], axis=1)[:, 0]
        upd = bd < best_d2
        best_d2 = jnp.where(upd, bd, best_d2)
        best_i = jnp.where(upd, start + bi, best_i)
        return (best_d2, best_i), None

    init = (jnp.full((Q,), big), jnp.zeros((Q,), jnp.int32))
    (best_d2, best_i), _ = jax.lax.scan(body, init, jnp.arange(nblk, dtype=jnp.int32))
    return best_i, jnp.sqrt(jnp.maximum(best_d2, 0.0))


@functools.partial(jax.jit, static_argnames=("model_id",))
def ray_plane_points(
    feat_xy: Array,  # [F,2]
    planes: Array,  # [F,4] world-frame plane (a,b,c,d) per feature
    found: Array,  # [F] bool
    q: Array,
    t: Array,
    params: Array,
    model_id: int,
) -> tuple[Array, Array]:
    """World 3D points: camera ray through each feature intersected with plane.

    X = C + s*dir with s = -(n.C + d)/(n.dir). NOTE: the reference solves this
    in the camera frame with world-frame plane coefficients
    (pcd_projection.cc:188-207) — correct only when the seed pose is identity;
    we solve in the world frame so any init pose / pose prior works.
    Returns (xyz [F,3], ok [F] bool); ok requires found, a non-grazing ray
    (|n.dir| > 1e-6) and positive depth.
    """
    center, direction = cm.unproject_ray(model_id, params, q, t, feat_xy)
    n = planes[:, :3]
    d = planes[:, 3]
    denom = jnp.sum(n * direction, axis=-1)
    denom_safe = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    s = -(jnp.sum(n * center, axis=-1) + d) / denom_safe
    X = center + s[:, None] * direction
    # depth must be positive in the camera
    z = se3.se3_apply(q, t, X)[..., 2]
    ok = found & (jnp.abs(denom) > 1e-6) & (s > 0) & (z > 0)
    return X, ok


def classify_ground(normals: Array, ratio: float = 10.0) -> Array:
    """Ground test: |ny/nx| > ratio and |ny/nz| > ratio (y is vertical in the
    converted camera-world frame; incremental_mapper.cc:1447-1459)."""
    nx = jnp.abs(normals[..., 0])
    ny = jnp.abs(normals[..., 1])
    nz = jnp.abs(normals[..., 2])
    return (ny > ratio * nx) & (ny > ratio * nz)


def plane_through(points: Array, normals: Array) -> Array:
    """Plane (a,b,c,d) with unit normal through each point (LidarPoint::Normalize,
    lidar_point.cc:39-50)."""
    n = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    d = -jnp.sum(points * n, axis=-1, keepdims=True)
    return jnp.concatenate([n, d], axis=-1)
