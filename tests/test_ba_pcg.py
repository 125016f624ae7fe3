"""Iterative-Schur (PCG) camera-solver tier tests.

The reference escalates DENSE_SCHUR -> SPARSE_SCHUR -> ITERATIVE_SCHUR +
SCHUR_JACOBI above 1000 images (optim/bundle_adjustment.cc:499-512). Our
equivalent is a matrix-free preconditioned-CG path in ops/ba.py selected by
BAConfig.camera_solver ("auto" above dense_max_pose_blocks variable blocks).
These tests check (a) PCG matches the dense solver on an overlapping mid-size
problem, and (b) a camera count far beyond the dense tier's practical range
solves to convergence without ever forming the reduced system.
"""

import numpy as np
import pytest

from colmap_pcd_tpu.ops import ba, camera_models as cm

from test_ba import make_synthetic


def _perturbed(rng, n_cams=30, n_pts=300):
    qs, ts, intr, pts, oc, op, ouv = make_synthetic(rng, n_cams=n_cams, n_pts=n_pts)
    qs_n, ts_n = qs.copy(), ts.copy()
    ts_n[2:] += rng.normal(0, 0.03, ts_n[2:].shape).astype(np.float32)
    pts_n = pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)
    pose_fixed = np.zeros(len(qs), np.float32)
    pose_fixed[:2] = 1.0  # gauge
    # the ring synthetic has every camera observing nearly every point
    prob = ba.make_problem(
        qs_n, ts_n, intr, pts_n, oc, op, ouv, pose_fixed=pose_fixed,
        track_len=n_cams,
    )
    return prob, qs, ts, pts


def test_pcg_matches_dense(rng):
    prob, qs, ts, pts = _perturbed(rng)
    cfg_d = ba.BAConfig(
        model_id=1, max_iterations=25, camera_solver="dense", point_chunk=128
    )
    cfg_p = ba.BAConfig(
        model_id=1, max_iterations=25, camera_solver="pcg", point_chunk=128
    )
    res_d = ba.solve(prob, cfg_d)
    res_p = ba.solve(prob, cfg_p)
    # noiseless observations: both tiers must collapse the cost
    assert float(res_d.final_cost) < 1e-2, float(res_d.final_cost)
    assert float(res_p.final_cost) < 1e-2, float(res_p.final_cost)
    # and land on the same reconstruction
    t_d = np.asarray(res_d.cam_t)
    t_p = np.asarray(res_p.cam_t)
    assert np.abs(t_d - t_p).max() < 5e-3, np.abs(t_d - t_p).max()
    assert np.abs(t_p - ts).max() < 5e-3
    assert np.abs(np.asarray(res_p.points) - pts).max() < 2e-2


def test_pcg_matches_dense_with_intrinsics(rng):
    prob, qs, ts, pts = _perturbed(rng, n_cams=16, n_pts=200)
    kw = dict(
        model_id=1,
        max_iterations=25,
        refine_intrinsics=True,
        refine_principal=False,
        point_chunk=64,
    )
    res_d = ba.solve(prob, ba.BAConfig(camera_solver="dense", **kw))
    res_p = ba.solve(prob, ba.BAConfig(camera_solver="pcg", **kw))
    assert float(res_d.final_cost) < 1e-2
    assert float(res_p.final_cost) < 1e-2
    f_d = np.asarray(res_d.intr)[0, 0]
    f_p = np.asarray(res_p.intr)[0, 0]
    assert abs(f_d - f_p) < 1.0, (f_d, f_p)


def _corridor_problem(rng, n_cams):
    """A long corridor: camera i at (i,0,0) looking +z at points 8-12 m ahead.

    Identity rotations and a PINHOLE camera keep ground-truth projection a
    two-line numpy expression, so thousands of cameras build in milliseconds.
    """
    n_pts = n_cams * 4
    pts = np.stack(
        [
            rng.uniform(0, n_cams, n_pts),
            rng.uniform(-2, 2, n_pts),
            rng.uniform(8, 12, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)
    f, cx, cy = 500.0, 320.0, 240.0
    intr = np.asarray(cm.pad_params([f, f, cx, cy], 1))
    qs = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n_cams, 1))
    ts = np.stack(
        [-np.arange(n_cams, dtype=np.float32), np.zeros(n_cams, np.float32),
         np.zeros(n_cams, np.float32)], axis=-1
    )
    # visibility: |x_pt - x_cam| < 3 (track length <= 7 at unit spacing)
    cam_x = np.arange(n_cams, dtype=np.float32)
    vis = np.abs(pts[None, :, 0] - cam_x[:, None]) < 3.0  # [C,P]
    oc, op = np.nonzero(vis)
    xc = pts[op] + ts[oc]  # R = I
    ouv = np.stack([f * xc[:, 0] / xc[:, 2] + cx, f * xc[:, 1] / xc[:, 2] + cy], -1)
    return qs, ts, intr, pts, oc.astype(np.int32), op.astype(np.int32), ouv.astype(np.float32)


@pytest.mark.slow
def test_pcg_large_corridor_converges(rng):
    """2000 variable cameras: auto tier must pick PCG and still converge.

    The dense tier would need a 12000^2 reduced system here; PCG never forms
    it (memory O(blocks)), which is the point of the iterative tier.
    """
    n_cams = 2000
    qs, ts, intr, pts, oc, op, ouv = _corridor_problem(rng, n_cams)
    ts_n = ts.copy()
    ts_n[2:] += rng.normal(0, 0.02, ts_n[2:].shape).astype(np.float32)
    pts_n = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    pose_fixed = np.zeros(n_cams, np.float32)
    pose_fixed[:2] = 1.0
    prob = ba.make_problem(
        qs, ts_n, intr, pts_n, oc, op, ouv, pose_fixed=pose_fixed, track_len=8
    )
    cfg = ba.BAConfig(model_id=1, max_iterations=15, camera_solver="auto")
    res = ba.solve(prob, cfg)
    assert np.isfinite(float(res.final_cost))
    assert float(res.final_cost) < float(res.initial_cost) * 1e-2
    # drift gone: every camera back on the corridor axis (gauge is anchored
    # at one end of a 2000 m corridor, so allow ~cm-level far-end residue)
    assert np.abs(np.asarray(res.cam_t) - ts).max() < 0.1
