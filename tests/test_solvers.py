"""Minimal-solver and RANSAC tests on synthetic ground truth
(mirrors the reference's estimators/*_test.cc strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from colmap_pcd_tpu.ops import ransac, se3, solvers


def rand_pose(rng, t_scale=1.0):
    q = rng.normal(size=4)
    q = (q / np.linalg.norm(q)).astype(np.float32)
    t = (rng.normal(size=3) * t_scale).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(t)


def project_norm(q, t, X):
    xc = se3.se3_apply(q, t, X)
    return xc[:, :2] / xc[:, 2:3], xc[:, 2]


def make_pnp_scene(rng, n=100, behind_ok=False):
    """Points in front of a random camera; normalized observations."""
    q, t = rand_pose(rng)
    # generate points in the camera frame then lift to world
    uv = rng.uniform(-0.4, 0.4, (n, 2))
    z = rng.uniform(2, 20, (n, 1))
    Xc = np.concatenate([uv * z, z], axis=-1).astype(np.float32)
    qi, ti = se3.se3_inverse(q, t)
    X = se3.quat_rotate(qi, jnp.asarray(Xc)) + se3.projection_center(q, t)
    return q, t, jnp.asarray(X), jnp.asarray(uv.astype(np.float32))


def test_triangulate_dlt(rng):
    q1, t1 = rand_pose(rng)
    q2, t2 = rand_pose(rng)
    X = jnp.asarray(rng.uniform(-1, 1, (50, 3)).astype(np.float32) + np.array([0, 0, 10]))
    P1 = solvers.proj_matrix(q1, t1)
    P2 = solvers.proj_matrix(q2, t2)
    uv1, z1 = project_norm(q1, t1, X)
    uv2, z2 = project_norm(q2, t2, X)
    Xt = solvers.triangulate_dlt(
        jnp.broadcast_to(P1, (50, 3, 4)), jnp.broadcast_to(P2, (50, 3, 4)), uv1, uv2
    )
    np.testing.assert_allclose(Xt, X, atol=1e-2)


def test_triangulate_multiview(rng):
    X = jnp.asarray([1.0, -0.5, 8.0], jnp.float32)
    qs, ts, uvs = [], [], []
    for _ in range(5):
        q, t = rand_pose(rng)
        qs.append(q)
        ts.append(t)
        uv, _ = project_norm(q, t, X[None])
        uvs.append(uv[0])
    mask = jnp.asarray([1, 1, 1, 1, 0], jnp.float32)  # last view masked out
    # corrupt the masked view
    uvs[4] = uvs[4] + 100.0
    Xt = solvers.triangulate_multiview(jnp.stack(qs), jnp.stack(ts), jnp.stack(uvs), mask)
    np.testing.assert_allclose(Xt, X, atol=1e-3)


def test_p6p_dlt_exact(rng):
    q, t, X, uv = make_pnp_scene(rng, n=6)
    q_e, t_e = solvers.p6p_dlt(uv, X)
    assert float(se3.angle_between(q_e, q)) < 1e-3
    np.testing.assert_allclose(t_e, t, atol=1e-3)


def test_p3p_exact(rng):
    """P3P recovers the true pose as one of its (up to 4) solutions
    (P3PEstimator parity, estimators/absolute_pose.cc:47-172)."""
    hits = 0
    for _ in range(20):
        q, t, X, uv = make_pnp_scene(rng, n=3)
        qs, ts, vs = jax.jit(solvers.p3p)(uv, X)
        best = np.inf
        for k in range(4):
            if not bool(vs[k]):
                continue
            dq = float(se3.angle_between(qs[k], q))
            dt = float(jnp.linalg.norm(ts[k] - t))
            best = min(best, dq + dt)
        if best < 2e-2:
            hits += 1
    # f32 quartic rooting loses a marginal sample occasionally; RANSAC
    # scoring + EPnP LO absorb those
    assert hits >= 18, hits


def test_epnp_noisy(rng):
    q, t, X, uv = make_pnp_scene(rng, n=50)
    uv_n = uv + jnp.asarray(rng.normal(0, 5e-4, uv.shape).astype(np.float32))
    q_e, t_e = solvers.epnp(uv_n, X)
    assert float(se3.angle_between(q_e, q)) < 0.01
    np.testing.assert_allclose(t_e, t, atol=0.05)


def test_umeyama(rng):
    q, t = rand_pose(rng)
    s = 2.5
    src = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    dst = s * se3.quat_rotate(q, src) + t
    q_e, t_e, s_e = solvers.umeyama(src, dst, with_scale=True)
    assert float(se3.angle_between(q_e, q)) < 1e-3
    np.testing.assert_allclose(s_e, s, rtol=1e-4)
    np.testing.assert_allclose(t_e, t, atol=1e-3)


def test_eight_point_essential(rng):
    q1 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t1 = jnp.zeros(3, jnp.float32)
    w = rng.normal(size=3) * 0.1
    q2 = se3.so3_exp_quat(jnp.asarray(w, jnp.float32))
    t2 = jnp.asarray([1.0, 0.2, -0.1], jnp.float32)
    t2 = t2 / jnp.linalg.norm(t2)
    X = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32) + np.array([0, 0, 8]))
    uv1, _ = project_norm(q1, t1, X)
    uv2, _ = project_norm(q2, t2, X)
    E = solvers.eight_point(uv1, uv2, essential=True)
    errs = solvers.sampson_error(E, uv1, uv2)
    assert float(jnp.max(errs)) < 1e-5  # f32 SVD + manifold projection
    mask = jnp.ones(64, jnp.float32)
    q_r, t_r = solvers.decompose_essential(E, uv1, uv2, mask)
    assert float(se3.angle_between(q_r, q2)) < 1e-2
    # translation up to scale
    cosang = float(jnp.abs(jnp.dot(t_r, t2)))
    assert cosang > 0.999


def test_homography_dlt(rng):
    H_true = jnp.asarray(
        [[1.1, 0.02, 5.0], [-0.03, 0.95, -3.0], [1e-4, -2e-4, 1.0]], jnp.float32
    )
    uv1 = jnp.asarray(rng.uniform(0, 500, (32, 2)).astype(np.float32))
    x1 = jnp.concatenate([uv1, jnp.ones((32, 1))], axis=-1)
    y = x1 @ H_true.T
    uv2 = y[:, :2] / y[:, 2:3]
    H = solvers.homography_dlt(uv1, uv2)
    err = solvers.homography_transfer_error(H, uv1, uv2)
    assert float(jnp.max(err)) < 1e-3


def test_ransac_pnp_outliers(rng):
    q, t, X, uv = make_pnp_scene(rng, n=256)
    uv = np.array(uv)  # writable copy
    # 40% outliers
    n_out = 102
    idx = rng.choice(256, n_out, replace=False)
    uv[idx] += rng.uniform(0.05, 0.5, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    opts = ransac.RansacOptions(max_error=4.0 / 1000.0, num_hypotheses=2048)
    res = ransac.ransac_pnp(
        jnp.asarray(uv), X, jnp.ones(256, jnp.float32), jax.random.PRNGKey(0), opts
    )
    assert int(res.num_inliers) >= 140, int(res.num_inliers)
    assert float(se3.angle_between(res.q, q)) < 5e-3
    np.testing.assert_allclose(res.t, t, atol=0.02)
    # inlier mask should exclude the corrupted points
    assert np.asarray(res.inlier_mask)[idx].sum() <= 3


def test_ransac_fundamental_outliers(rng):
    q2 = se3.so3_exp_quat(jnp.asarray(rng.normal(size=3) * 0.05, jnp.float32))
    t2 = jnp.asarray([0.5, 0.1, 0.05], jnp.float32)
    X = jnp.asarray(rng.uniform(-3, 3, (256, 3)).astype(np.float32) + np.array([0, 0, 10]))
    f, cx, cy = 800.0, 320.0, 240.0
    uv1n, _ = project_norm(jnp.asarray([1.0, 0, 0, 0], jnp.float32), jnp.zeros(3), X)
    uv2n, _ = project_norm(q2, t2, X)
    uv1 = np.asarray(uv1n) * f + [cx, cy]
    uv2 = np.asarray(uv2n) * f + [cx, cy]
    idx = rng.choice(256, 80, replace=False)
    uv2[idx] += rng.uniform(30, 200, (80, 2)) * rng.choice([-1, 1], (80, 2))
    res = ransac.ransac_fundamental(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.ones(256, jnp.float32), jax.random.PRNGKey(1),
        ransac.RansacOptions(max_error=2.0, num_hypotheses=2048),
    )
    assert int(res.num_inliers) >= 160, int(res.num_inliers)
    assert np.asarray(res.inlier_mask)[idx].sum() <= 5


def test_ransac_homography_outliers(rng):
    H_true = np.asarray([[1.0, 0.01, 10.0], [0.02, 1.05, -5.0], [1e-5, 0.0, 1.0]])
    uv1 = rng.uniform(0, 500, (200, 2))
    x1 = np.concatenate([uv1, np.ones((200, 1))], -1)
    y = x1 @ H_true.T
    uv2 = y[:, :2] / y[:, 2:3]
    idx = rng.choice(200, 60, replace=False)
    uv2[idx] += rng.uniform(20, 100, (60, 2))
    res = ransac.ransac_homography(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.ones(200, jnp.float32), jax.random.PRNGKey(2),
        ransac.RansacOptions(max_error=2.0, num_hypotheses=1024),
    )
    assert int(res.num_inliers) >= 130
    assert np.asarray(res.inlier_mask)[idx].sum() <= 3


def test_pnp_outlier_envelope(rng):
    """Quantify the P6P-DLT+EPnP substitution for Kneip P3P (PARITY §2.6):
    6-point samples need (1-w)^6 all-inlier draws instead of (1-w)^3, so the
    batched 2048-hypothesis bank must still recover the pose up to 60%
    outliers — the envelope incremental mapping actually operates in
    (abs_pose_min_inlier_ratio defaults to 0.25)."""
    import jax

    from colmap_pcd_tpu.ops import np_geom, ransac

    n = 256
    X = rng.uniform(-4, 4, (n, 3)).astype(np.float32) + [0, 0, 8]
    q_gt = np_geom.quat_normalize(np.asarray([1.0, 0.05, -0.03, 0.02]))
    t_gt = np.asarray([0.3, -0.2, 0.5])
    pc = np_geom.quat_rotate(q_gt, X) + t_gt
    uv = (pc[:, :2] / pc[:, 2:3]).astype(np.float32)  # normalized coords
    for w in (0.3, 0.5, 0.6):
        bad = rng.random(n) < w
        uv_n = uv.copy()
        uv_n[bad] = rng.uniform(-0.6, 0.6, (int(bad.sum()), 2))
        res = ransac.ransac_pnp(
            jnp.asarray(uv_n), jnp.asarray(X), jnp.asarray(np.ones(n, np.float32)),
            jax.random.PRNGKey(int(w * 100)),
            ransac.RansacOptions(max_error=4.0 / 500.0, num_hypotheses=2048),
        )
        q = np.asarray(res.q)
        ang = 2 * np.arccos(np.clip(abs(np.dot(q, q_gt)), -1, 1))
        n_in = int(res.num_inliers)
        assert n_in >= 0.8 * (~bad).sum(), (w, n_in)
        assert ang < np.deg2rad(1.0), (w, np.rad2deg(ang))
