"""Camera models: vectorized project / unproject for all 11 reference models.

Re-designs the reference's CRTP camera-model family (src/base/camera_models.h:147-347)
as pure, batched JAX functions. Param layouts and model ids match COLMAP exactly so
databases and model files interoperate:

  id  name                    params
  0   SIMPLE_PINHOLE          f, cx, cy
  1   PINHOLE                 fx, fy, cx, cy
  2   SIMPLE_RADIAL           f, cx, cy, k
  3   RADIAL                  f, cx, cy, k1, k2
  4   OPENCV                  fx, fy, cx, cy, k1, k2, p1, p2
  5   OPENCV_FISHEYE          fx, fy, cx, cy, k1, k2, k3, k4
  6   FULL_OPENCV             fx, fy, cx, cy, k1, k2, p1, p2, k3, k4, k5, k6
  7   FOV                     fx, fy, cx, cy, omega
  8   SIMPLE_RADIAL_FISHEYE   f, cx, cy, k
  9   RADIAL_FISHEYE          f, cx, cy, k1, k2
  10  THIN_PRISM_FISHEYE      fx, fy, cx, cy, k1, k2, p1, p2, k3, k4, sx1, sy1

All functions take `params` padded to MAX_PARAMS=12 and operate on normalized
camera coordinates (u, v) = (x/z, y/z). `world_to_image` applies distortion then
the affine intrinsics; `image_to_world` inverts the affine part and undistorts
with a fixed-iteration Gauss-Newton (jit-safe, no data-dependent loops), mirroring
the reference's IterativeUndistortion (camera_models.h:950-1000).

`model_id` must be a static Python int (one camera model per compiled program —
the common case; distinct models trigger distinct specializations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

MAX_PARAMS = 12

MODEL_NAMES = [
    "SIMPLE_PINHOLE", "PINHOLE", "SIMPLE_RADIAL", "RADIAL", "OPENCV",
    "OPENCV_FISHEYE", "FULL_OPENCV", "FOV", "SIMPLE_RADIAL_FISHEYE",
    "RADIAL_FISHEYE", "THIN_PRISM_FISHEYE",
]
MODEL_IDS = {n: i for i, n in enumerate(MODEL_NAMES)}
NUM_PARAMS = [3, 4, 3 + 1, 3 + 2, 4 + 4, 4 + 4, 4 + 8, 4 + 1, 3 + 1, 3 + 2, 4 + 8]

# Index of (fx, fy, cx, cy) within each model's param vector; fy index equals fx
# index for single-focal models.
_FOCAL_IDX = {
    0: (0, 0, 1, 2), 1: (0, 1, 2, 3), 2: (0, 0, 1, 2), 3: (0, 0, 1, 2),
    4: (0, 1, 2, 3), 5: (0, 1, 2, 3), 6: (0, 1, 2, 3), 7: (0, 1, 2, 3),
    8: (0, 0, 1, 2), 9: (0, 0, 1, 2), 10: (0, 1, 2, 3),
}

_FISHEYE_MODELS = frozenset([5, 8, 9, 10])


def pad_params(params, model_id: int) -> jnp.ndarray:
    """Pad a raw param list/array to MAX_PARAMS."""
    p = jnp.asarray(params, dtype=jnp.float32)
    n = NUM_PARAMS[model_id]
    assert p.shape[-1] == n, f"model {MODEL_NAMES[model_id]} expects {n} params, got {p.shape[-1]}"
    pad = [(0, 0)] * (p.ndim - 1) + [(0, MAX_PARAMS - n)]
    return jnp.pad(p, pad)


def focal_pp(params: Array, model_id: int) -> tuple[Array, Array, Array, Array]:
    fi, fj, ci, cj = _FOCAL_IDX[model_id]
    return params[..., fi], params[..., fj], params[..., ci], params[..., cj]


def _fisheye_forward(u: Array, v: Array) -> tuple[Array, Array]:
    """Equidistant fisheye map (u,v) -> (theta/r * u, theta/r * v).

    reference: camera_models.h OpenCVFisheyeCameraModel::Distortion head.
    """
    r = jnp.sqrt(u * u + v * v)
    theta = jnp.arctan(r)
    scale = jnp.where(r > 1e-8, theta / jnp.maximum(r, 1e-8), 1.0)
    return u * scale, v * scale


def _distort(model_id: int, p: Array, u: Array, v: Array) -> tuple[Array, Array]:
    """Model-specific distortion deltas (du, dv) on normalized coords.

    For fisheye models the equidistant map is applied first (matching the
    reference, where Distortion includes it), so callers use `_distort` as the
    complete normalized->distorted-normalized map: (u+du, v+dv).
    """
    if model_id in (0, 1):  # pinhole family: no distortion
        return jnp.zeros_like(u), jnp.zeros_like(v)

    if model_id in _FISHEYE_MODELS:
        uf, vf = _fisheye_forward(u, v)
    else:
        uf, vf = u, v
    r2 = uf * uf + vf * vf

    if model_id in (2, 8):  # SIMPLE_RADIAL(_FISHEYE): k
        k = p[..., 3]
        radial = k * r2
        du, dv = uf * radial, vf * radial
    elif model_id in (3, 9):  # RADIAL(_FISHEYE): k1, k2
        k1, k2 = p[..., 3], p[..., 4]
        radial = k1 * r2 + k2 * r2 * r2
        du, dv = uf * radial, vf * radial
    elif model_id == 4:  # OPENCV: k1, k2, p1, p2
        k1, k2, p1, p2 = p[..., 4], p[..., 5], p[..., 6], p[..., 7]
        uv = uf * vf
        radial = k1 * r2 + k2 * r2 * r2
        du = uf * radial + 2 * p1 * uv + p2 * (r2 + 2 * uf * uf)
        dv = vf * radial + 2 * p2 * uv + p1 * (r2 + 2 * vf * vf)
    elif model_id == 5:  # OPENCV_FISHEYE: k1, k2, k3, k4 (theta polynomial)
        # reference applies theta-polynomial distortion: here expressed on the
        # already-equidistant-mapped coords where radius == theta.
        k1, k2, k3, k4 = p[..., 4], p[..., 5], p[..., 6], p[..., 7]
        theta2 = r2
        radial = k1 * theta2 + k2 * theta2**2 + k3 * theta2**3 + k4 * theta2**4
        du, dv = uf * radial, vf * radial
    elif model_id == 6:  # FULL_OPENCV
        k1, k2, p1, p2 = p[..., 4], p[..., 5], p[..., 6], p[..., 7]
        k3, k4, k5, k6 = p[..., 8], p[..., 9], p[..., 10], p[..., 11]
        uv = uf * vf
        r4, r6 = r2 * r2, r2 * r2 * r2
        num = 1 + k1 * r2 + k2 * r4 + k3 * r6
        den = 1 + k4 * r2 + k5 * r4 + k6 * r6
        radial = num / den - 1.0
        du = uf * radial + 2 * p1 * uv + p2 * (r2 + 2 * uf * uf)
        dv = vf * radial + 2 * p2 * uv + p1 * (r2 + 2 * vf * vf)
    elif model_id == 7:  # FOV: omega (Devernay & Faugeras)
        omega = p[..., 4]
        r = jnp.sqrt(jnp.maximum(r2, 1e-16))
        omega_safe = jnp.where(jnp.abs(omega) < 1e-6, 1e-6, omega)
        # As omega -> 0: factor = atan(2r tan(w/2))/(r w) -> 1 - (r w)^2 / 3.
        factor = jnp.where(
            jnp.abs(omega) < 1e-6,
            -(r2 * omega * omega) / 3.0,
            jnp.arctan(2.0 * r * jnp.tan(omega_safe * 0.5)) / jnp.maximum(r * omega_safe, 1e-12) - 1.0,
        )
        du, dv = uf * factor, vf * factor
    elif model_id == 10:  # THIN_PRISM_FISHEYE
        k1, k2, p1, p2 = p[..., 4], p[..., 5], p[..., 6], p[..., 7]
        k3, k4, sx1, sy1 = p[..., 8], p[..., 9], p[..., 10], p[..., 11]
        uv = uf * vf
        r4, r6, r8 = r2 * r2, r2**3, r2**4
        radial = k1 * r2 + k2 * r4 + k3 * r6 + k4 * r8
        du = uf * radial + 2 * p1 * uv + p2 * (r2 + 2 * uf * uf) + sx1 * r2
        dv = vf * radial + 2 * p2 * uv + p1 * (r2 + 2 * vf * vf) + sy1 * r2
    else:
        raise ValueError(f"unknown camera model id {model_id}")

    return uf + du - u, vf + dv - v


def distorted_normalized(model_id: int, params: Array, uv: Array) -> Array:
    """Apply the full distortion map on normalized coords (..., 2) -> (..., 2)."""
    u, v = uv[..., 0], uv[..., 1]
    du, dv = _distort(model_id, params, u, v)
    return jnp.stack([u + du, v + dv], axis=-1)


def world_to_image(model_id: int, params: Array, uv: Array) -> Array:
    """Normalized camera coords (..., 2) -> pixel coords (..., 2).

    reference: camera_models.h CameraModel::WorldToImage.
    """
    fx, fy, cx, cy = focal_pp(params, model_id)
    d = distorted_normalized(model_id, params, uv)
    return jnp.stack([fx * d[..., 0] + cx, fy * d[..., 1] + cy], axis=-1)


def image_to_world(model_id: int, params: Array, xy: Array, num_iters: int = 20) -> Array:
    """Pixel coords (..., 2) -> normalized camera coords (..., 2).

    Fixed-iteration Gauss-Newton undistortion (jit-safe), mirroring the
    reference's IterativeUndistortion (camera_models.h). For pinhole models the
    solve is exact at iteration 0.
    """
    fx, fy, cx, cy = focal_pp(params, model_id)
    target = jnp.stack([(xy[..., 0] - cx) / fx, (xy[..., 1] - cy) / fy], axis=-1)
    if model_id in (0, 1):
        return target

    def fwd(uv):
        return distorted_normalized(model_id, params, uv)

    def gn_step(uv, _):
        # Per-point 2x2 Jacobian via jvp on the two basis directions.
        e1 = jnp.broadcast_to(jnp.array([1.0, 0.0], uv.dtype), uv.shape)
        e2 = jnp.broadcast_to(jnp.array([0.0, 1.0], uv.dtype), uv.shape)
        f, j1 = jax.jvp(fwd, (uv,), (e1,))
        _, j2 = jax.jvp(fwd, (uv,), (e2,))
        # J = [[j1_x, j2_x], [j1_y, j2_y]]; solve J d = (target - f)
        r = target - f
        a, b = j1[..., 0], j2[..., 0]
        c, d = j1[..., 1], j2[..., 1]
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = (d * r[..., 0] - b * r[..., 1]) / det
        dy = (-c * r[..., 0] + a * r[..., 1]) / det
        return uv + jnp.stack([dx, dy], axis=-1), None

    uv0 = target
    uv, _ = jax.lax.scan(gn_step, uv0, None, length=num_iters)
    return uv


def project(model_id: int, params: Array, q: Array, t: Array, X: Array) -> tuple[Array, Array]:
    """Full world-point -> pixel chain. Returns (xy_pixel, depth).

    Points behind the camera yield negative depth; callers mask on depth > 0.
    """
    from . import se3

    xc = se3.se3_apply(q, t, X)
    z = xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uv = xc[..., :2] / zs[..., None]
    return world_to_image(model_id, params, uv), z


def unproject_ray(model_id: int, params: Array, q: Array, t: Array, xy: Array) -> tuple[Array, Array]:
    """Pixel -> (camera_center, unit world ray direction)."""
    from . import se3

    uv = image_to_world(model_id, params, xy)
    d_cam = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    qi, ti = se3.se3_inverse(q, t)
    center = se3.projection_center(q, t)
    d_world = se3.quat_rotate(qi, d_cam)
    return center, d_world
