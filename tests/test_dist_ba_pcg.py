"""Distributed Schur BA with the iterative (PCG) camera-solver tier.

The PCG matvec runs INSIDE the shard_map body, so each CG iteration
psum-reduces the camera-side matvec over the mesh — per-iteration
communication is one [nb,6] all-reduce instead of the dense tier's one-shot
[D,D] psum. This test pins the combined path: point-sharded problem, PCG
camera solve, same solution as the local dense solver.
"""

import numpy as np

from colmap_pcd_tpu.ops import ba
from colmap_pcd_tpu.parallel import dist_ba

from conftest import cpu_mesh
from test_ba_pcg import _corridor_problem


def test_distributed_pcg_matches_local_dense(rng):
    n_cams = 48
    qs, ts, intr, pts, oc, op, ouv = _corridor_problem(rng, n_cams)
    ts_n = ts.copy()
    ts_n[2:] += rng.normal(0, 0.02, ts_n[2:].shape).astype(np.float32)
    pts_n = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    pose_fixed = np.zeros(n_cams, np.float32)
    pose_fixed[:2] = 1.0
    prob = ba.make_problem(
        qs, ts_n, intr, pts_n, oc, op, ouv, pose_fixed=pose_fixed, track_len=8
    )
    m = cpu_mesh((8,), ("work",))
    cfg_p = ba.BAConfig(model_id=1, max_iterations=15, camera_solver="pcg")
    cfg_d = ba.BAConfig(model_id=1, max_iterations=15, camera_solver="dense")
    res_p = dist_ba.solve_distributed(prob, cfg_p, m, axis="work")
    res_d = ba.solve(prob, cfg_d)
    assert float(res_p.final_cost) < float(res_p.initial_cost) * 1e-2
    assert float(res_d.final_cost) < float(res_d.initial_cost) * 1e-2
    t_p = np.asarray(res_p.cam_t)
    t_d = np.asarray(res_d.cam_t)
    assert np.abs(t_p - ts).max() < 2e-2, np.abs(t_p - ts).max()
    assert np.abs(t_p - t_d).max() < 1e-2, np.abs(t_p - t_d).max()
