"""Pallas kernel equivalence tests (interpret mode on CPU) against the XLA
reference formulations."""

import jax.numpy as jnp
import numpy as np

from colmap_pcd_tpu.ops import matching, pallas_kernels as pk


def test_match_top2_matches_xla(rng):
    N1, N2, D = 256, 1024, 128
    d1 = rng.normal(size=(N1, D)).astype(np.float32)
    d2 = rng.normal(size=(N2, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    s1, s2, idx = pk.match_top2(jnp.asarray(d1), jnp.asarray(d2), interpret=True)
    sim = d1 @ d2.T
    order = np.argsort(-sim, axis=1)
    np.testing.assert_allclose(np.asarray(s1), sim[np.arange(N1), order[:, 0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), sim[np.arange(N1), order[:, 1]], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), order[:, 0])


def test_match_descriptors_pallas_agrees(rng):
    N = 256
    base = rng.normal(size=(N, 128)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    perm = rng.permutation(N)
    d2 = base[perm] + rng.normal(0, 0.05, (N, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    v = np.ones(N, np.float32)
    idx_ref, ok_ref, _ = matching.match_descriptors(
        jnp.asarray(base), jnp.asarray(d2), jnp.asarray(v), jnp.asarray(v)
    )
    idx_pl, ok_pl = pk.match_descriptors_pallas(
        jnp.asarray(base), jnp.asarray(d2), jnp.asarray(v), jnp.asarray(v), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_pl))
    ok = np.asarray(ok_ref)
    np.testing.assert_array_equal(np.asarray(idx_ref)[ok], np.asarray(idx_pl)[ok])


def test_nn_argmin_exact(rng):
    Q, N = 256, 4096
    q = rng.uniform(-5, 5, (Q, 3)).astype(np.float32)
    p = rng.uniform(-5, 5, (N, 3)).astype(np.float32)
    idx, dist = pk.nn_argmin(jnp.asarray(q), jnp.asarray(p), interpret=True)
    d = np.linalg.norm(q[:, None] - p[None], axis=-1)
    oracle = np.argmin(d, axis=1)
    np.testing.assert_array_equal(np.asarray(idx), oracle)
    np.testing.assert_allclose(np.asarray(dist), d[np.arange(Q), oracle], atol=1e-4)
