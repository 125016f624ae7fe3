"""Camera-rig subsystem tests: CameraRig model, rig BA, generalized pose.

Covers the reference's rig machinery (src/base/camera_rig.{h,cc},
src/optim/bundle_adjustment.h:322-379 RigBundleAdjuster,
src/estimators/generalized_absolute_pose.{h,cc}) — which the reference itself
never tests.
"""

import json

import numpy as np
import pytest

from colmap_pcd_tpu.models.camera_rig import CameraRig, average_quaternions, read_rig_config
from colmap_pcd_tpu.models.reconstruction import Camera, Image, Reconstruction
from colmap_pcd_tpu.models.rig_adjuster import RigBAOptions, RigBundleAdjuster
from colmap_pcd_tpu.ops import np_geom, solvers

PINHOLE = 1


def _random_quat(rng, scale=1.0):
    w = rng.normal(size=3) * scale
    return np_geom.so3_exp_quat(w)


def _make_rig_scene(rng, n_snapshots=6, n_points=120, noise=0.0):
    """Two-camera rig moving along +x looking at a fronto wall of points."""
    rel_q2 = np_geom.so3_exp_quat(np.asarray([0.0, 0.12, 0.0]))
    rel_t2 = np.asarray([-0.5, 0.0, 0.0])  # stereo baseline
    rec = Reconstruction()
    f = 500.0
    for cid in (1, 2):
        rec.add_camera(Camera(cid, PINHOLE, 640, 480, np.asarray([f, f, 320.0, 240.0])))

    pts = np.stack(
        [
            rng.uniform(-4, 10, n_points),
            rng.uniform(-3, 3, n_points),
            rng.uniform(6, 12, n_points),
        ],
        axis=-1,
    )

    rig_poses = []
    images = {}
    iid = 1
    snapshots = []
    for s in range(n_snapshots):
        # world-to-rig: rig at x = s, small rotation
        q_rig = np_geom.so3_exp_quat(np.asarray([0.0, 0.03 * s, 0.01 * s]))
        t_rig = -np_geom.quat_rotate(q_rig, np.asarray([s * 0.8, 0.0, 0.0]))
        rig_poses.append((q_rig, t_rig))
        snap = []
        for cid, (rq, rt) in ((1, (np.asarray([1.0, 0, 0, 0]), np.zeros(3))), (2, (rel_q2, rel_t2))):
            q, t = np_geom.se3_compose(rq, rt, q_rig, t_rig)
            Xc = np_geom.se3_apply(q, t, pts)
            uv = np.stack(
                [f * Xc[:, 0] / Xc[:, 2] + 320.0, f * Xc[:, 1] / Xc[:, 2] + 240.0], -1
            )
            if noise:
                uv = uv + rng.normal(size=uv.shape) * noise
            img = Image(iid, f"cam{cid}/{s:04d}.jpg", cid, qvec=q.copy(), tvec=t.copy(), xys=uv)
            rec.add_image(img)
            rec.register_image(iid)
            images[(s, cid)] = iid
            snap.append(iid)
            iid += 1
        snapshots.append(snap)

    # tracks: every point seen in every image (all in front, inside frame not
    # enforced — rig BA doesn't need it)
    for p in range(n_points):
        track = [(images[(s, c)], p) for s in range(n_snapshots) for c in (1, 2)]
        rec.add_point3D(pts[p], track)

    rig = CameraRig()
    rig.ref_camera_id = 1
    rig.add_camera(1)
    rig.add_camera(2, rel_q2, rel_t2)
    for snap in snapshots:
        rig.add_snapshot(snap)
    return rec, rig, pts, rig_poses, (rel_q2, rel_t2)


def test_compute_relative_poses(rng):
    rec, rig, _, _, (rel_q2, rel_t2) = _make_rig_scene(rng)
    rig2 = CameraRig()
    rig2.ref_camera_id = 1
    rig2.add_camera(1)
    rig2.add_camera(2)
    rig2.snapshots = rig.snapshots
    assert rig2.compute_relative_poses(rec)
    q, t = rig2.rel_poses[2]
    assert np_geom.angle_between(q, rel_q2) < 1e-6
    np.testing.assert_allclose(t, rel_t2, atol=1e-9)
    # scale of a metric reconstruction is 1
    assert abs(rig2.compute_scale(rec) - 1.0) < 1e-9


def test_compute_absolute_pose_averages(rng):
    rec, rig, _, rig_poses, _ = _make_rig_scene(rng)
    for s, (q_gt, t_gt) in enumerate(rig_poses):
        pose = rig.compute_absolute_pose(s, rec)
        assert pose is not None
        assert np_geom.angle_between(pose[0], q_gt) < 1e-6
        np.testing.assert_allclose(pose[1], t_gt, atol=1e-9)


def test_average_quaternions_weighted():
    q = np.asarray([1.0, 0, 0, 0])
    q2 = np_geom.so3_exp_quat(np.asarray([0.2, 0, 0]))
    avg = average_quaternions(np.stack([q, q2]), [1.0, 1.0])
    mid = np_geom.so3_exp_quat(np.asarray([0.1, 0, 0]))
    assert np_geom.angle_between(avg, mid) < 1e-9


def test_rig_ba_recovers_from_noise(rng):
    rec, rig, pts, rig_poses, (rel_q2, rel_t2) = _make_rig_scene(rng)
    # perturb image poses + points; keep first snapshot exact (gauge)
    for iid in rec.registered_ids[2:]:
        img = rec.images[iid]
        img.qvec = np_geom.quat_mul(_random_quat(rng, 0.01), img.qvec)
        img.tvec = img.tvec + rng.normal(size=3) * 0.05
    for pid, p in rec.points3D.items():
        p.xyz = p.xyz + rng.normal(size=3) * 0.05

    adj = RigBundleAdjuster(RigBAOptions(refine_relative_poses=False, max_iterations=60))
    assert adj.solve(rec, [rig])
    assert adj.final_cost < adj.initial_cost * 1e-3

    # every snapshot must satisfy the exact rig constraint after the solve:
    # pose(cam2 image) == rel2 ∘ pose(cam1 image)
    for snap in rig.snapshots:
        i1, i2 = snap
        q1, t1 = rec.images[i1].qvec, rec.images[i1].tvec
        q2, t2 = rec.images[i2].qvec, rec.images[i2].tvec
        qc, tc = np_geom.se3_compose(rel_q2, rel_t2, q1, t1)
        assert np_geom.angle_between(qc, q2) < 1e-4
        np.testing.assert_allclose(tc, t2, atol=1e-3)

    # reprojection error must be tiny after convergence
    errs = []
    for iid in rec.registered_ids:
        img = rec.images[iid]
        for fi in np.nonzero(img.point3D_ids >= 0)[0]:
            pid = int(img.point3D_ids[fi])
            Xc = np_geom.se3_apply(img.qvec, img.tvec, rec.points3D[pid].xyz)
            uv = 500.0 * Xc[:2] / Xc[2] + np.asarray([320.0, 240.0])
            errs.append(np.linalg.norm(uv - img.xys[fi]))
    assert np.mean(errs) < 0.05


def test_rig_ba_refines_relative_pose(rng):
    rec, rig, *_ , (rel_q2, rel_t2) = _make_rig_scene(rng, n_snapshots=8)
    # corrupt the rig calibration; image poses + points stay at GT
    rig.rel_poses[2] = (
        np_geom.quat_mul(_random_quat(rng, 0.01), rel_q2),
        rel_t2 + rng.normal(size=3) * 0.03,
    )
    adj = RigBundleAdjuster(RigBAOptions(refine_relative_poses=True, max_iterations=80))
    assert adj.solve(rec, [rig])
    q, t = rig.rel_poses[2]
    assert np_geom.angle_between(q, rel_q2) < 2e-3
    np.testing.assert_allclose(t, rel_t2, atol=5e-3)


def test_gp6p_dlt(rng):
    """Generalized absolute pose from multi-pinhole rays."""
    import jax.numpy as jnp

    q_gt = _random_quat(rng, 0.3)
    t_gt = rng.normal(size=3)
    n = 24
    X = rng.uniform(-2, 2, (n, 3)) + np.asarray([0, 0, 6.0])
    # rays in the rig frame: two origins (stereo), directions toward the points
    origins = np.where(rng.random((n, 1)) < 0.5, 0.0, 0.4) * np.asarray([[1.0, 0, 0]])
    Xr = np_geom.se3_apply(q_gt, t_gt, X)  # world -> rig
    d = Xr - origins
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    q, t = solvers.gp6p_dlt(
        jnp.asarray(origins, jnp.float32), jnp.asarray(d, jnp.float32), jnp.asarray(X, jnp.float32)
    )
    assert np_geom.angle_between(np.asarray(q, np.float64), q_gt) < 1e-3
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-3)


def test_rig_bundle_adjuster_cli(tmp_path, rng):
    from colmap_pcd_tpu.cli import main

    rec, rig, *_ , (rel_q2, rel_t2) = _make_rig_scene(rng, n_snapshots=4)
    for iid in rec.registered_ids[2:]:
        img = rec.images[iid]
        img.tvec = img.tvec + rng.normal(size=3) * 0.02
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    rec.write(str(in_dir))
    cfg = [
        {
            "ref_camera_id": 1,
            "cameras": [
                {"camera_id": 1, "image_prefix": "cam1/"},
                {"camera_id": 2, "image_prefix": "cam2/"},
            ],
        }
    ]
    rig_json = tmp_path / "rig.json"
    rig_json.write_text(json.dumps(cfg))
    rc = main(
        [
            "rig_bundle_adjuster",
            "--input_path", str(in_dir),
            "--output_path", str(out_dir),
            "--rig_config_path", str(rig_json),
            "--RigBundleAdjustment.refine_relative_poses", "0",
        ]
    )
    assert rc == 0
    out = Reconstruction.read(str(out_dir))
    assert out.num_reg_images == rec.num_reg_images


def test_read_rig_config(tmp_path, rng):
    rec, rig, *_ , (rel_q2, rel_t2) = _make_rig_scene(rng, n_snapshots=4)
    cfg = [
        {
            "ref_camera_id": 1,
            "cameras": [
                {"camera_id": 1, "image_prefix": "cam1/"},
                {"camera_id": 2, "image_prefix": "cam2/"},
            ],
        }
    ]
    path = tmp_path / "rig.json"
    path.write_text(json.dumps(cfg))
    rigs = read_rig_config(str(path), rec)
    assert len(rigs) == 1
    r = rigs[0]
    assert r.num_cameras() == 2 and r.num_snapshots() == 4
    # snapshots pair same-suffix images
    for snap in r.snapshots:
        names = {rec.images[i].name.split("/")[1] for i in snap}
        assert len(names) == 1
    # relative poses recovered from the model (no explicit rel given)
    q, t = r.rel_poses[2]
    assert np_geom.angle_between(q, rel_q2) < 1e-6
    np.testing.assert_allclose(t, rel_t2, atol=1e-9)
