"""GR6P generalized relative pose: solver + LORANSAC bank.

Mirrors the acceptance shape of the reference's estimator test
(src/estimators/generalized_relative_pose_test.cc): a 3-camera rig observed
from two rig poses, correspondences spread across camera pairs, recovery of
the rig-to-rig transform within tight tolerance, residuals under threshold.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from colmap_pcd_tpu.ops import ransac as ransac_ops
from colmap_pcd_tpu.ops import se3, solvers
from colmap_pcd_tpu.ops import np_geom


def _make_rig_scene(rng, n_pts=80, qx=0.15, tx=0.4, noise=0.0, n_outliers=0):
    """3-camera rig seen from two poses; returns ray correspondences in each
    rig frame plus the GT (R, t) with x2 = R x1 + t."""
    # rig-camera offsets (camera center in rig frame), identity cam rotations
    cam_offsets = np.asarray([[0.0, 0, 0], [0.25, 0.05, 0], [-0.2, 0.1, 0.05]])
    # rig pose 1 = identity; rig pose 2 = (R, t) world->rig? define rig2 pose
    # in world: points x_w; rig1 frame == world; rig2: x2 = R x_w + t
    q_gt = np.asarray([np.cos(qx / 2), np.sin(qx / 2), 0.0, 0.0])
    R_gt = np_geom.quat_to_rotmat(q_gt)
    t_gt = np.asarray([tx, 0.1, -0.2])

    X = rng.uniform(-8, 8, size=(n_pts, 3)) + np.asarray([0, 0, 12.0])
    f1, c1, f2, c2 = [], [], [], []
    for i in range(n_pts):
        o1 = cam_offsets[i % 3]
        o2 = cam_offsets[(i + 1) % 3]
        d1 = X[i] - o1
        x2 = R_gt @ X[i] + t_gt
        d2 = x2 - o2
        d1 = d1 / np.linalg.norm(d1)
        d2 = d2 / np.linalg.norm(d2)
        if noise:
            d1 = d1 + rng.normal(scale=noise, size=3)
            d2 = d2 + rng.normal(scale=noise, size=3)
            d1 /= np.linalg.norm(d1)
            d2 /= np.linalg.norm(d2)
        f1.append(d1)
        c1.append(o1)
        f2.append(d2)
        c2.append(o2)
    f1, c1, f2, c2 = map(np.asarray, (f1, c1, f2, c2))
    for k in range(n_outliers):
        j = rng.integers(0, n_pts)
        f2[j] = rng.normal(size=3)
        f2[j] /= np.linalg.norm(f2[j])
    return (
        jnp.asarray(f1, jnp.float32), jnp.asarray(c1, jnp.float32),
        jnp.asarray(f2, jnp.float32), jnp.asarray(c2, jnp.float32),
        q_gt, t_gt,
    )


def test_gr6p_minimal_clean():
    rng = np.random.default_rng(0)
    f1, c1, f2, c2, q_gt, t_gt = _make_rig_scene(rng, n_pts=8)
    q, ts, t_ok = solvers.gr6p(f1, c1, f2, c2, key=jax.random.PRNGKey(1))
    # one of the four translation candidates matches GT with the recovered R
    R = np.asarray(se3.quat_to_rotmat(q))
    R_gt = np_geom.quat_to_rotmat(q_gt)
    assert np.linalg.norm(R - R_gt) < 2e-2, np.linalg.norm(R - R_gt)
    errs = [
        np.linalg.norm(np.asarray(t) - t_gt)
        for t, ok in zip(ts, np.asarray(t_ok)) if ok
    ]
    assert min(errs) < 5e-2, errs


def test_gr6p_nonminimal_weighted():
    rng = np.random.default_rng(3)
    f1, c1, f2, c2, q_gt, t_gt = _make_rig_scene(rng, n_pts=60, noise=1e-4)
    q, ts, t_ok = solvers.gr6p(f1, c1, f2, c2, key=jax.random.PRNGKey(2))
    R = np.asarray(se3.quat_to_rotmat(q))
    R_gt = np_geom.quat_to_rotmat(q_gt)
    assert np.linalg.norm(R - R_gt) < 3e-2
    errs = [
        np.linalg.norm(np.asarray(t) - t_gt)
        for t, ok in zip(ts, np.asarray(t_ok)) if ok
    ]
    assert min(errs) < 8e-2


def test_gr6p_sampson_zero_at_gt():
    rng = np.random.default_rng(5)
    f1, c1, f2, c2, q_gt, t_gt = _make_rig_scene(rng, n_pts=40)
    e = solvers.generalized_sampson_error(
        jnp.asarray(q_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32),
        f1, c1, f2, c2,
    )
    assert float(jnp.max(e)) < 1e-8


@pytest.mark.parametrize("qx,tx", [(0.1, 0.2), (0.3, 0.4)])
def test_gr6p_ransac_with_outliers(qx, tx):
    rng = np.random.default_rng(7)
    f1, c1, f2, c2, q_gt, t_gt = _make_rig_scene(
        rng, n_pts=100, qx=qx, tx=tx, noise=5e-5, n_outliers=25
    )
    valid = jnp.ones(100, jnp.float32)
    res = ransac_ops.ransac_generalized_relative_pose(
        f1, c1, f2, c2, valid, jax.random.PRNGKey(11),
        ransac_ops.RansacOptions(max_error=2e-3, num_hypotheses=128, lo_rounds=2),
    )
    R = np.asarray(se3.quat_to_rotmat(res.q))
    R_gt = np_geom.quat_to_rotmat(q_gt)
    assert int(res.num_inliers) >= 60
    assert np.linalg.norm(R - R_gt) < 5e-2, np.linalg.norm(R - R_gt)
    assert np.linalg.norm(np.asarray(res.t) - t_gt) < 0.1
