"""Distributed Schur BA on a virtual 8-device CPU mesh: the multi-chip path
must produce the same solution as the single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np

from colmap_pcd_tpu.ops import ba, se3
from colmap_pcd_tpu.parallel import dist_ba, mesh as mesh_lib

from conftest import cpu_mesh
from test_ba import make_synthetic


def _problem(rng, n_cams=6, n_pts=256):
    qs, ts, intr, pts, oc, op, ouv = make_synthetic(rng, n_cams=n_cams, n_pts=n_pts)
    pts_n = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    qs_n, ts_n = qs.copy(), ts.copy()
    for i in range(2, n_cams):
        dq = np.asarray(se3.so3_exp_quat(jnp.asarray(rng.normal(0, 0.01, 3), jnp.float32)))
        qs_n[i] = np.asarray(se3.quat_mul(jnp.asarray(dq), jnp.asarray(qs[i])))
        ts_n[i] = ts[i] + rng.normal(0, 0.03, 3)
    pose_fixed = np.zeros(n_cams, np.float32)
    pose_fixed[:2] = 1.0
    prob = ba.make_problem(qs_n, ts_n, intr, pts_n, oc, op, ouv, pose_fixed=pose_fixed, track_len=8)
    return prob, qs, ts, pts


def test_distributed_matches_single(rng):
    prob, qs, ts, pts = _problem(rng)
    cfg = ba.BAConfig(model_id=1, max_iterations=20)
    m = cpu_mesh((8,), ("work",))
    res_d = dist_ba.solve_distributed(prob, cfg, m, axis="work")
    res_s = ba.solve(prob, cfg)
    # both converge to ground truth
    assert float(res_d.final_cost) < 1e-2, float(res_d.final_cost)
    for i in range(2, len(qs)):
        ang = float(se3.angle_between(jnp.asarray(np.asarray(res_d.cam_q)[i]), jnp.asarray(qs[i])))
        assert ang < 1e-3
        assert np.linalg.norm(np.asarray(res_d.cam_t)[i] - ts[i]) < 5e-3
    # and agree with each other
    np.testing.assert_allclose(res_d.cam_t, res_s.cam_t, atol=1e-3)
    err = np.abs(np.asarray(res_d.points) - pts).max()
    assert err < 1e-2, err


def test_distributed_with_lidar(rng):
    qs, ts, intr, pts, oc, op, ouv = make_synthetic(rng, n_cams=4, n_pts=128)
    pts_n = pts.copy()
    pts_n[:, 2] += 0.2
    planes = np.zeros((len(pts), 4), np.float32)
    planes[:, 2] = 1.0
    planes[:, 3] = -pts[:, 2]
    prob = ba.make_problem(
        qs, ts, intr, pts_n, oc, op, ouv,
        pose_fixed=np.ones(len(qs), np.float32),
        lidar_plane=planes, lidar_w=np.full(len(pts), 10.0, np.float32),
        track_len=8,
    )
    cfg = ba.BAConfig(model_id=1, max_iterations=25)
    m = cpu_mesh((4,), ("work",))
    res = dist_ba.solve_distributed(prob, cfg, m, axis="work")
    d = np.abs(np.asarray(res.points)[:, 2] - pts[:, 2]).max()
    assert d < 1e-2, d
