"""Bundle adjuster tests on synthetic problems with known ground truth.

Mirrors the reference's optim/bundle_adjustment_test.cc strategy (tiny synthetic
reconstructions, checking solver behavior) but with quantitative ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from colmap_pcd_tpu.ops import ba, camera_models as cm, se3


def look_at_quat(center, target, up=(0, 0, 1)):
    """World-to-camera quaternion for a camera at `center` looking at `target`."""
    z = np.asarray(target, np.float64) - center
    z /= np.linalg.norm(z)
    x = np.cross(z, np.asarray(up, np.float64))
    if np.linalg.norm(x) < 1e-6:
        x = np.cross(z, [0, 1, 0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)  # rows: camera axes in world
    from colmap_pcd_tpu.ops import se3 as s

    q = np.asarray(s.rotmat_to_quat(jnp.asarray(R, jnp.float32)))
    return q


def make_synthetic(rng, n_cams=6, n_pts=200, noise_px=0.0, focal=1000.0):
    """Cameras on a ring looking at a cloud of points near the origin."""
    pts = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float64)
    centers = []
    qs, ts = [], []
    for i in range(n_cams):
        ang = 2 * np.pi * i / max(n_cams, 1)
        c = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        q = look_at_quat(c, np.zeros(3))
        t = -np.asarray(se3.quat_rotate(jnp.asarray(q, jnp.float32), jnp.asarray(c, jnp.float32)))
        centers.append(c)
        qs.append(q)
        ts.append(t)
    qs = np.stack(qs).astype(np.float32)
    ts = np.stack(ts).astype(np.float32)
    intr = cm.pad_params([focal, focal, 320.0, 240.0], 1)

    obs_cam, obs_pt, obs_uv = [], [], []
    for i in range(n_cams):
        xy, z = cm.project(1, intr, jnp.asarray(qs[i]), jnp.asarray(ts[i]), jnp.asarray(pts, jnp.float32))
        xy = np.asarray(xy)
        for j in range(n_pts):
            if z[j] > 0.1:
                obs_cam.append(i)
                obs_pt.append(j)
                obs_uv.append(xy[j] + rng.normal(0, noise_px, 2))
    return (
        qs,
        ts,
        np.asarray(intr),
        pts.astype(np.float32),
        np.asarray(obs_cam, np.int32),
        np.asarray(obs_pt, np.int32),
        np.asarray(obs_uv, np.float32),
    )


def test_ba_recovers_perturbed_points(rng):
    qs, ts, intr, pts, oc, op, ouv = make_synthetic(rng)
    pts_noisy = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    prob = ba.make_problem(
        qs, ts, intr, pts_noisy, oc, op, ouv,
        pose_fixed=np.ones(len(qs), np.float32),  # poses frozen: triangulation-only
        track_len=8,
    )
    cfg = ba.BAConfig(model_id=1, max_iterations=20)
    res = ba.solve(prob, cfg)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-3
    err = np.abs(np.asarray(res.points) - pts).max()
    assert err < 1e-2, f"max point error {err}"


def test_ba_recovers_perturbed_poses_and_points(rng):
    qs, ts, intr, pts, oc, op, ouv = make_synthetic(rng)
    # perturb all but the first two poses (gauge fixed by freezing them)
    qs_n, ts_n = qs.copy(), ts.copy()
    for i in range(2, len(qs)):
        dq = np.asarray(se3.so3_exp_quat(jnp.asarray(rng.normal(0, 0.01, 3), jnp.float32)))
        qs_n[i] = np.asarray(se3.quat_mul(jnp.asarray(dq), jnp.asarray(qs[i])))
        ts_n[i] = ts[i] + rng.normal(0, 0.05, 3)
    pts_n = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    pose_fixed = np.zeros(len(qs), np.float32)
    pose_fixed[:2] = 1.0
    prob = ba.make_problem(qs_n, ts_n, intr, pts_n, oc, op, ouv, pose_fixed=pose_fixed, track_len=8)
    cfg = ba.BAConfig(model_id=1, max_iterations=30)
    res = ba.solve(prob, cfg)
    # residual cost should collapse to ~0 (noiseless observations)
    assert float(res.final_cost) < 1e-2, float(res.final_cost)
    q_out = np.asarray(res.cam_q)
    t_out = np.asarray(res.cam_t)
    for i in range(2, len(qs)):
        ang = float(se3.angle_between(jnp.asarray(q_out[i]), jnp.asarray(qs[i])))
        assert ang < 1e-3, f"cam {i} rotation error {ang}"
        assert np.linalg.norm(t_out[i] - ts[i]) < 5e-3


def test_ba_lidar_plane_constraint(rng):
    """Points with lidar plane constraints get pulled onto their planes."""
    qs, ts, intr, pts, oc, op, ouv = make_synthetic(rng, n_cams=4, n_pts=50)
    # constrain every point to the plane z = point's own z -> plane through
    # ground-truth point with normal +z; offset points in z and check recovery.
    pts_n = pts.copy()
    pts_n[:, 2] += 0.2
    planes = np.zeros((len(pts), 4), np.float32)
    planes[:, 2] = 1.0
    planes[:, 3] = -pts[:, 2]
    prob = ba.make_problem(
        qs, ts, intr, pts_n, oc, op, ouv,
        pose_fixed=np.ones(len(qs), np.float32),
        lidar_plane=planes,
        lidar_w=np.full(len(pts), 10.0, np.float32),
        track_len=8,
    )
    cfg = ba.BAConfig(model_id=1, max_iterations=25)
    res = ba.solve(prob, cfg)
    plane_dist = np.abs(np.asarray(res.points)[:, 2] - pts[:, 2]).max()
    assert plane_dist < 1e-2, plane_dist


def test_ba_robust_loss_rejects_outliers(rng):
    qs, ts, intr, pts, oc, op, ouv = make_synthetic(rng)
    # corrupt 5% of observations
    n_out = len(ouv) // 20
    idx = rng.choice(len(ouv), n_out, replace=False)
    ouv_c = ouv.copy()
    ouv_c[idx] += rng.uniform(50, 200, (n_out, 2))
    pts_n = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    prob = ba.make_problem(
        qs, ts, intr, pts_n, oc, op, ouv_c,
        pose_fixed=np.ones(len(qs), np.float32), track_len=8,
    )
    cfg = ba.BAConfig(model_id=1, loss_type=ba.LOSS_CAUCHY, loss_scale=2.0, max_iterations=30)
    res = ba.solve(prob, cfg)
    err = np.median(np.abs(np.asarray(res.points) - pts))
    assert err < 5e-3, err


def test_ba_intrinsics_refinement(rng):
    qs, ts, intr, pts, oc, op, ouv = make_synthetic(rng, n_cams=8, n_pts=300)
    intr_n = np.asarray(intr).copy()
    intr_n[0] *= 1.02  # 2% focal error
    intr_n[1] *= 1.02
    prob = ba.make_problem(
        qs, ts, intr_n, pts, oc, op, ouv,
        pose_fixed=np.ones(len(qs), np.float32),
        point_fixed=np.ones(len(pts), np.float32),
        track_len=8,
    )
    cfg = ba.BAConfig(
        model_id=1, max_iterations=30, refine_intrinsics=True,
        refine_focal=True, refine_principal=False, refine_extra=False,
    )
    res = ba.solve(prob, cfg)
    f_out = float(np.asarray(res.intr)[0, 0])
    assert abs(f_out - 1000.0) < 1.0, f_out


def test_ba_per_camera_intrinsics_mixed_models(rng):
    """Two cameras with different focal lengths AND different camera models
    (PINHOLE + SIMPLE_RADIAL) in one problem: per-slot intrinsics refinement
    must converge each to its own ground truth (the reference parameterizes
    every camera's own params, bundle_adjustment.cc:1047-1100)."""
    PINHOLE = cm.MODEL_IDS["PINHOLE"]
    SIMPLE_RADIAL = cm.MODEL_IDS["SIMPLE_RADIAL"]
    pts = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
    qs, ts = [], []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        c = np.array([8 * np.cos(ang), 8 * np.sin(ang), 2.0])
        q = look_at_quat(c, np.zeros(3))
        t = -np.asarray(se3.quat_rotate(jnp.asarray(q, jnp.float32), jnp.asarray(c, jnp.float32)))
        qs.append(q)
        ts.append(t)
    qs = np.stack(qs).astype(np.float32)
    ts = np.stack(ts).astype(np.float32)
    intr_true = np.stack([
        cm.pad_params([1000.0, 1000.0, 320.0, 240.0], PINHOLE),
        cm.pad_params([1450.0, 330.0, 250.0, 0.05], SIMPLE_RADIAL),
    ])
    model_ids = (PINHOLE, SIMPLE_RADIAL)
    cam_model = np.asarray([0, 1], np.int32)
    cam_k = np.asarray([i % 2 for i in range(8)], np.int32)  # alternate cameras
    obs_cam, obs_pt, obs_uv = [], [], []
    for i in range(8):
        mid = model_ids[cam_k[i]]
        xy, z = cm.project(
            mid, jnp.asarray(intr_true[cam_k[i]]),
            jnp.asarray(qs[i]), jnp.asarray(ts[i]), jnp.asarray(pts),
        )
        xy, z = np.asarray(xy), np.asarray(z)
        for j in range(len(pts)):
            if z[j] > 0.1:
                obs_cam.append(i)
                obs_pt.append(j)
                obs_uv.append(xy[j])
    # perturb both focals (and the radial k) and refine with poses/points fixed
    intr_n = intr_true.copy()
    intr_n[0, 0] *= 1.03
    intr_n[0, 1] *= 1.03
    intr_n[1, 0] *= 0.97
    prob = ba.make_problem(
        qs, ts, intr_n, pts,
        np.asarray(obs_cam, np.int32), np.asarray(obs_pt, np.int32),
        np.asarray(obs_uv, np.float32),
        cam_k=cam_k, cam_model=cam_model,
        pose_fixed=np.ones(8, np.float32),
        point_fixed=np.ones(len(pts), np.float32),
        track_len=8,
    )
    cfg = ba.BAConfig(
        model_id=model_ids[0], model_ids=model_ids, max_iterations=30,
        refine_intrinsics=True, refine_focal=True,
        refine_principal=False, refine_extra=False,
    )
    res = ba.solve(prob, cfg)
    out = np.asarray(res.intr)
    assert abs(out[0, 0] - 1000.0) < 1.5, out[0]
    assert abs(out[0, 1] - 1000.0) < 1.5, out[0]
    assert abs(out[1, 0] - 1450.0) < 2.0, out[1]
    # the untouched model-specific extra param stays intact
    np.testing.assert_allclose(out[1, 3], 0.05, atol=1e-6)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-3


def test_ba_fixed_tvec_components(rng):
    """Frozen tvec components must not move (subset manifold parity)."""
    qs, ts, intr, pts, oc, op, ouv = make_synthetic(rng, n_cams=4, n_pts=100)
    ts_n = ts.copy()
    ts_n[2] += [0.1, 0.0, 0.0]
    pose_fixed = np.zeros(len(qs), np.float32)
    pose_fixed[:2] = 1.0
    tvec_fixed = np.zeros((len(qs), 3), np.float32)
    tvec_fixed[2, 1] = 1.0  # freeze y of cam 2
    tvec_fixed[2, 2] = 1.0  # freeze z of cam 2
    prob = ba.make_problem(
        qs, ts_n, intr, pts, oc, op, ouv,
        pose_fixed=pose_fixed, tvec_fixed=tvec_fixed,
        point_fixed=np.ones(len(pts), np.float32), track_len=8,
    )
    cfg = ba.BAConfig(model_id=1, max_iterations=20)
    res = ba.solve(prob, cfg)
    t_out = np.asarray(res.cam_t)
    # frozen components unchanged
    np.testing.assert_allclose(t_out[2, 1:], ts_n[2, 1:], atol=1e-6)
    # unfrozen x recovered — but note rotation also moves; just check cost drop
    assert float(res.final_cost) < float(res.initial_cost) * 0.5
