"""Cross-check the numpy geometry mirrors against the JAX implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from colmap_pcd_tpu.ops import camera_models as cm
from colmap_pcd_tpu.ops import np_geom, se3

from test_camera_models import PARAMS


def test_quat_ops_match(rng):
    q = rng.normal(size=(16, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(16, 3))
    np.testing.assert_allclose(
        np_geom.quat_rotate(q, v),
        np.asarray(se3.quat_rotate(jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32))),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np_geom.quat_to_rotmat(q),
        np.asarray(se3.quat_to_rotmat(jnp.asarray(q, jnp.float32))),
        atol=1e-5,
    )
    q2 = np_geom.rotmat_to_quat(np_geom.quat_to_rotmat(q))
    qc = q * np.where(q[:, :1] < 0, -1, 1)
    np.testing.assert_allclose(q2, qc, atol=1e-6)
    np.testing.assert_allclose(
        np_geom.projection_center(q[0], v[0]),
        np.asarray(se3.projection_center(jnp.asarray(q[0], jnp.float32), jnp.asarray(v[0], jnp.float32))),
        atol=1e-4,
    )


@pytest.mark.parametrize("model_id", list(range(11)))
def test_camera_project_matches_jax(model_id, rng):
    params = np.asarray(cm.pad_params(PARAMS[model_id], model_id))
    uv = rng.uniform(-0.25, 0.25, (32, 2))
    xy_np = np_geom.world_to_image(model_id, params, uv)
    xy_jx = np.asarray(cm.world_to_image(model_id, jnp.asarray(params), jnp.asarray(uv, jnp.float32)))
    np.testing.assert_allclose(xy_np, xy_jx, atol=5e-2)  # f32 vs f64
    back = np_geom.image_to_world(model_id, params, xy_np)
    np.testing.assert_allclose(back, uv, atol=2e-5)


def test_full_project_matches(rng):
    params = np.asarray(cm.pad_params(PARAMS[4], 4))
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    X = rng.normal(size=(20, 3)) + [0, 0, 10]
    xy_np, z_np = np_geom.project(4, params, q, t, X)
    xy_jx, z_jx = cm.project(
        4, jnp.asarray(params), jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32), jnp.asarray(X, jnp.float32)
    )
    np.testing.assert_allclose(z_np, np.asarray(z_jx), atol=1e-3)
    np.testing.assert_allclose(xy_np, np.asarray(xy_jx), atol=0.3)
