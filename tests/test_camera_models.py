import jax.numpy as jnp
import numpy as np
import pytest

from colmap_pcd_tpu.ops import camera_models as cm
from colmap_pcd_tpu.ops import se3

# Representative params per model (f ~ 1000, 640x480-ish pp, mild distortion).
PARAMS = {
    0: [1000.0, 320.0, 240.0],
    1: [1000.0, 1010.0, 320.0, 240.0],
    2: [1000.0, 320.0, 240.0, 0.05],
    3: [1000.0, 320.0, 240.0, 0.05, -0.01],
    4: [1000.0, 1010.0, 320.0, 240.0, 0.05, -0.01, 0.001, -0.002],
    5: [1000.0, 1010.0, 320.0, 240.0, 0.02, -0.005, 0.001, -0.001],
    6: [1000.0, 1010.0, 320.0, 240.0, 0.05, -0.01, 0.001, -0.002, 0.002, 0.01, -0.002, 0.001],
    7: [1000.0, 1010.0, 320.0, 240.0, 0.8],
    8: [1000.0, 320.0, 240.0, 0.02],
    9: [1000.0, 320.0, 240.0, 0.02, -0.005],
    10: [1000.0, 1010.0, 320.0, 240.0, 0.02, -0.005, 0.001, -0.001, 0.0005, -0.0002, 0.001, -0.001],
}


@pytest.mark.parametrize("model_id", list(range(11)))
def test_project_unproject_roundtrip(model_id, rng):
    params = cm.pad_params(PARAMS[model_id], model_id)
    # normalized coords in a modest FOV cone
    uv = jnp.asarray(rng.uniform(-0.25, 0.25, size=(64, 2)), jnp.float32)
    xy = cm.world_to_image(model_id, params, uv)
    uv2 = cm.image_to_world(model_id, params, xy)
    np.testing.assert_allclose(uv, uv2, atol=2e-4)


def test_world_to_image_pinhole_exact():
    params = cm.pad_params(PARAMS[1], 1)
    uv = jnp.array([[0.1, -0.2]], jnp.float32)
    xy = cm.world_to_image(1, params, uv)
    np.testing.assert_allclose(xy, [[1000 * 0.1 + 320, 1010 * -0.2 + 240]], rtol=1e-6)


def test_full_projection_chain(rng):
    params = cm.pad_params(PARAMS[4], 4)
    q = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    t = jnp.asarray([[0.0, 0, 0]], jnp.float32)
    X = jnp.asarray([[1.0, 2.0, 10.0]], jnp.float32)
    xy, z = cm.project(4, params, q, t, X)
    np.testing.assert_allclose(z, 10.0, rtol=1e-6)
    uv2 = cm.image_to_world(4, params, xy)
    np.testing.assert_allclose(uv2, [[0.1, 0.2]], atol=1e-5)


def test_unproject_ray_hits_point(rng):
    params = cm.pad_params(PARAMS[2], 2)
    q = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    X = se3.projection_center(q, t) + se3.quat_rotate(se3.quat_conj(q), jnp.array([0.5, -0.3, 8.0]))
    xy, z = cm.project(2, params, q, t, X)
    assert float(z) > 0
    center, direction = cm.unproject_ray(2, params, q, t, xy)
    # The point must lie on the ray: X = center + s * direction
    s = jnp.dot(X - center, direction)
    np.testing.assert_allclose(center + s * direction, X, atol=1e-3)
