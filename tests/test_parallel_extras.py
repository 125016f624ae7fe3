"""Distributed matching + 7-point fundamental tests."""

import jax.numpy as jnp
import numpy as np

from colmap_pcd_tpu.ops import se3, solvers
from colmap_pcd_tpu.parallel import dist_matching

from conftest import cpu_mesh
from test_matching import make_descriptors
from test_solvers import project_norm


def test_match_pairs_batch_sharded(rng):
    mesh = cpu_mesh((4,), ("work",))
    B, N = 8, 128
    d1 = np.zeros((B, N, 128), np.float32)
    d2 = np.zeros((B, N, 128), np.float32)
    perms = []
    for b in range(B):
        base = make_descriptors(rng, N)
        perm = rng.permutation(N)
        noisy = base[perm] + rng.normal(0, 0.05, (N, 128)).astype(np.float32)
        noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
        d1[b] = base
        d2[b] = noisy
        perms.append(perm)
    v = np.ones((B, N), np.float32)
    idx, ok = dist_matching.match_pairs_batch(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v), jnp.asarray(v), mesh=mesh
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    for b in range(B):
        sel = ok[b]
        assert sel.sum() > N * 0.8, sel.sum()
        assert (perms[b][idx[b][sel]] == np.nonzero(sel)[0]).mean() > 0.98


def test_match_pair_list(rng):
    mesh = cpu_mesh((2,), ("work",))
    descs = {i: (make_descriptors(rng, 100) * 255).astype(np.float32) for i in range(1, 4)}
    descs[2] = descs[1].copy()  # identical image 1-2
    out = dist_matching.match_pair_list(descs, [(1, 2), (1, 3)], mesh=mesh, cap=128)
    m12 = out[(1, 2)]
    assert len(m12) > 90
    assert (m12[:, 0] == m12[:, 1]).all()


def test_match_pool_sharded_matches_local(rng):
    """MatchPool (replicated pool + sharded pair indices) must produce the
    SAME matches as the local stacked path — and pads ragged batches."""
    mesh = cpu_mesh((4,), ("work",))
    base = make_descriptors(rng, 100)
    descs = {
        i: ((base + rng.normal(0, 0.03, base.shape)) * 255).astype(np.float32)
        for i in range(1, 7)
    }  # noisy copies of one scene: every pair matches
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]  # 5 pairs on 4 devices
    pool_m = dist_matching.MatchPool(descs, mesh=mesh, cap=128)
    pool_l = dist_matching.MatchPool(descs, mesh=None, cap=128)
    idx_m, ok_m = pool_m.match_pairs(pairs)
    idx_l, ok_l = pool_l.match_pairs(pairs)
    assert (ok_m == ok_l).all()
    assert (idx_m[ok_m] == idx_l[ok_l]).all()
    assert ok_m.shape[0] == len(pairs)
    assert ok_m.any(axis=1).all()  # every pair found matches


def test_seven_point_fundamental(rng):
    q2 = se3.so3_exp_quat(jnp.asarray(rng.normal(size=3) * 0.1, jnp.float32))
    t2 = jnp.asarray([1.0, 0.3, -0.2], jnp.float32)
    X = jnp.asarray(rng.uniform(-2, 2, (7, 3)).astype(np.float32) + np.array([0, 0, 8]))
    uv1, _ = project_norm(jnp.asarray([1.0, 0, 0, 0], jnp.float32), jnp.zeros(3), X)
    uv2, _ = project_norm(q2, t2, X)
    Fs, valid = solvers.seven_point(uv1, uv2)
    Fs, valid = np.asarray(Fs), np.asarray(valid)
    # at least one valid solution must satisfy all 7 correspondences
    best = np.inf
    for k in range(3):
        if not valid[k]:
            continue
        e = np.asarray(solvers.sampson_error(jnp.asarray(Fs[k]), uv1, uv2))
        best = min(best, e.max())
    assert best < 1e-6, best
