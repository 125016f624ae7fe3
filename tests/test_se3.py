import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colmap_pcd_tpu.ops import se3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_rotmat(rng):
    q = jnp.asarray(random_quats(rng, 32), jnp.float32)
    v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    R = se3.quat_to_rotmat(q)
    out1 = se3.quat_rotate(q, v)
    out2 = jnp.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_rotmat_quat_roundtrip(rng):
    q = random_quats(rng, 64)
    q *= np.where(q[:, :1] < 0, -1.0, 1.0)  # canonical sign
    R = se3.quat_to_rotmat(jnp.asarray(q, jnp.float32))
    q2 = se3.rotmat_to_quat(R)
    np.testing.assert_allclose(q, q2, atol=1e-4)


@pytest.mark.parametrize("scale", [1.0, 1e-5, 3.0])
def test_so3_exp_log_roundtrip(rng, scale):
    # log returns the principal axis-angle (|theta| <= pi), so keep inputs there
    w = rng.normal(size=(16, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 0.99 * np.pi, (16, 1))
    w = jnp.asarray(w * min(scale, 1.0), jnp.float32)
    q = se3.so3_exp_quat(w)
    w2 = se3.so3_log(q)
    np.testing.assert_allclose(w, w2, atol=1e-4 * max(scale, 1.0))


def test_se3_compose_inverse(rng):
    q = jnp.asarray(random_quats(rng, 8), jnp.float32)
    t = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    qi, ti = se3.se3_inverse(q, t)
    qc, tc = se3.se3_compose(q, t, qi, ti)
    np.testing.assert_allclose(np.abs(qc[:, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(tc, 0.0, atol=1e-5)


def test_se3_apply_and_center(rng):
    q = jnp.asarray(random_quats(rng, 4), jnp.float32)
    t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    c = se3.projection_center(q, t)
    # camera center maps to origin
    out = se3.se3_apply(q, t, c)
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_retract_zero_is_identity(rng):
    q = jnp.asarray(random_quats(rng, 4), jnp.float32)
    t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    q2, t2 = se3.se3_retract(q, t, jnp.zeros((4, 6), jnp.float32))
    np.testing.assert_allclose(np.abs(np.sum(q * q2, axis=-1)), 1.0, atol=1e-6)
    np.testing.assert_allclose(t, t2, atol=1e-6)


def test_euler_roundtrip():
    rpy = jnp.asarray([[0.1, -0.4, 1.2], [0.0, 0.0, 0.0], [-1.0, 0.5, -2.0]], jnp.float32)
    q = se3.euler_zyx_to_quat(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    r, p, y = se3.quat_to_euler_zyx(q)
    np.testing.assert_allclose(jnp.stack([r, p, y], -1), rpy, atol=1e-5)


def test_jit_and_grad():
    f = jax.jit(lambda w: jnp.sum(se3.so3_exp_quat(w) ** 2))
    g = jax.grad(f)(jnp.array([0.1, 0.2, 0.3], jnp.float32))
    assert g.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(g)))
