"""Durand-Kerner root finding + Nister 5-point essential matrix solver.

Mirrors the reference's polynomial tests (base/polynomial_test.cc) and
essential-matrix estimator tests (estimators/essential_matrix_test.cc) with
quantitative ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from colmap_pcd_tpu.ops import polynomial as poly_ops
from colmap_pcd_tpu.ops import ransac as ransac_ops
from colmap_pcd_tpu.ops import se3, solvers

import jax


def _poly_from_roots(roots):
    c = np.array([1.0])
    for r in roots:
        c = np.convolve(c, [1.0, -r])
    return c


def test_find_roots_known_real(rng):
    gt = np.array([-3.0, -1.0, 0.5, 2.0, 4.0], np.float64)
    coeffs = _poly_from_roots(gt).astype(np.float32)
    roots, ok = poly_ops.find_roots(jnp.asarray(coeffs))
    assert bool(ok)
    found = np.sort(np.real(np.asarray(roots)))
    assert np.abs(found - np.sort(gt)).max() < 1e-3, found


def test_find_roots_batched_scaled(rng):
    # batch of polynomials with random roots incl. large-magnitude ones
    B, deg = 64, 6
    gts = rng.uniform(-20, 20, (B, deg))
    coeffs = np.stack([_poly_from_roots(g) for g in gts]).astype(np.float32)
    # random overall scaling (the solver must be scale-invariant)
    coeffs *= rng.uniform(0.01, 100.0, (B, 1)).astype(np.float32)
    roots, ok = poly_ops.find_roots(jnp.asarray(coeffs))
    roots = np.asarray(roots)
    assert bool(np.all(np.asarray(ok)))
    for b in range(B):
        found = np.sort(np.real(roots[b]))
        gt = np.sort(gts[b])
        rel = np.abs(found - gt) / (1.0 + np.abs(gt))
        # clustered random roots are ill-conditioned in f32 coefficients
        # (sensitivity ~ eps^(1/m) for an m-cluster); 2% covers that regime
        assert rel.max() < 2e-2, (b, found, gt)


def test_find_roots_tiny_leading_coefficient():
    """Near-degenerate degree: lead ~ 1e-7 of max (the 5-point det-B regime).
    The finite roots must still be recovered via coefficient balancing."""
    gt_finite = np.array([-2.0, 1.0, 3.0])
    c3 = _poly_from_roots(gt_finite)
    # multiply by (eps z + 1): adds one huge root at -1/eps
    eps = 1e-6
    c4 = np.convolve(c3, [eps, 1.0]).astype(np.float32)
    roots, ok = poly_ops.find_roots(jnp.asarray(c4))
    assert bool(ok)
    re = np.real(np.asarray(roots))
    im = np.imag(np.asarray(roots))
    near_real = np.abs(im) < 1e-2 * (1 + np.abs(re))
    finite = near_real & (np.abs(re) < 100.0)
    found = np.sort(re[finite])
    assert found.size >= 3
    for g in gt_finite:
        assert np.min(np.abs(found - g)) < 1e-2, (found, g)


def _random_pose_and_points(rng, n=12):
    w = rng.normal(0, 0.3, 3)
    th = np.linalg.norm(w)
    q = np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * w / max(th, 1e-9)]).astype(
        np.float32
    )
    R = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
    t = rng.normal(0, 1, 3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-2, 2, (n, 3)) + [0, 0, 6]
    x1 = (X[:, :2] / X[:, 2:3]).astype(np.float32)
    Xc2 = X @ R.T + t
    x2 = (Xc2[:, :2] / Xc2[:, 2:3]).astype(np.float32)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = tx @ R
    return x1, x2, E_gt / np.linalg.norm(E_gt)


def test_five_point_exact_recovery(rng):
    hits = 0
    trials = 20
    for _ in range(trials):
        x1, x2, E_gt = _random_pose_and_points(rng)
        Es, valid = solvers.five_point(jnp.asarray(x1[:5]), jnp.asarray(x2[:5]))
        Es, valid = np.asarray(Es), np.asarray(valid)
        best = 1e9
        for k in range(10):
            if not valid[k]:
                continue
            e = np.asarray(
                solvers.sampson_error(jnp.asarray(Es[k]), jnp.asarray(x1), jnp.asarray(x2))
            )
            best = min(best, float(e.max()))
        if best < 1e-5:
            hits += 1
    # f32 Durand-Kerner loses the occasional near-degenerate sample; RANSAC
    # absorbs that (each bank draws hundreds of samples)
    assert hits >= trials - 2, f"{hits}/{trials}"


def test_ransac_essential_five_point_outliers(rng):
    x1, x2, E_gt = _random_pose_and_points(rng, n=200)
    # 40% outliers
    n_out = 80
    x2 = x2.copy()
    x2[:n_out] += rng.uniform(0.05, 0.3, (n_out, 2)).astype(np.float32)
    # 10 models per 5-point sample: 2048 hypotheses = ~204 minimal samples,
    # ~16 expected all-inlier at 40% outliers
    opts = ransac_ops.RansacOptions(num_hypotheses=2048, max_error=1e-3)
    res = ransac_ops.ransac_essential(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(x1)), jax.random.PRNGKey(0), opts
    )
    mask = np.asarray(res.inlier_mask)
    assert mask[n_out:].mean() > 0.95, mask[n_out:].mean()
    assert mask[:n_out].mean() < 0.1, mask[:n_out].mean()
    e = np.asarray(
        solvers.sampson_error(res.model, jnp.asarray(x1[n_out:]), jnp.asarray(x2[n_out:]))
    )
    assert np.median(e) < 1e-7, np.median(e)
