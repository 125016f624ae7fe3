#!/usr/bin/env python
"""End-to-end registration benchmark on the real TPU chip.

Runs the full lidar-constrained incremental mapping pipeline (the SURVEY.md
§7.2 slice) on a synthetic corridor world with exact ground truth — the
published Smith Hall / NSH datasets are not fetchable in this zero-egress
environment, so the workload mirrors their structure (prior lidar map with
normals, pose-prior seeding, forward trajectory) at the quick-start scale.

Two passes in one process: pass 1 pays one-time XLA compilation (through the
axon tunnel each program costs minutes and the compile service has no cache —
measured: identical programs recompile in fresh processes), pass 2 on a fresh
world measures the steady-state production throughput, which is the headline
metric. Cold wall time is reported alongside.

Prints ONE JSON line:
  metric      frames registered per second, steady state (end-to-end:
              association, RANSAC, triangulation, local BA, spherical
              global BA)
  vs_baseline ratio against the reference's documented guidance of "a few
              minutes for tens of images" on CPU+CUDA (doc/tutorial.rst:354):
              25 images / 180 s ~= 0.14 frames/s.
  ate_m       trajectory RMSE vs ground truth (accuracy gate, cm-level)
"""

import json
import os
import sys
import time

sys.path.insert(0, "tests")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_FPS = 25.0 / 180.0  # "a few minutes for tens of images"


def run_once(seed, n_images, verbose=False):
    from synthetic import ate_rmse, make_world

    from colmap_pcd_tpu.models.controllers import (
        ControllerOptions,
        IncrementalMapperController,
    )
    from colmap_pcd_tpu.models.incremental_mapper import MapperOptions

    rng = np.random.default_rng(seed)
    rec, graph, lmap, gt = make_world(rng, n_images=n_images, n_points=1000, noise_px=0.3)
    opts = MapperOptions(
        if_add_lidar_constraint=True,
        init_image_id1=1,
        init_image_id2=2,
        abs_pose_min_num_inliers=15,
        init_min_num_inliers=50,
        num_ransac_hypotheses=2048,
    )
    ctl = IncrementalMapperController(
        rec, graph, opts, ControllerOptions(verbose=verbose),
        lidar_map=lmap, pose_priors={1: gt[0]},
    )
    t0 = time.time()
    ok = ctl.reconstruct()
    dt = time.time() - t0
    ate = ate_rmse(rec, gt) if ok else float("inf")
    return rec.num_reg_images, dt, ate


def _ensure_device():
    """The axon tunnel admits one process at a time and a prior process's
    claim lingers a few minutes after exit. If backend init failed, re-exec
    this script after a wait (registration happens at interpreter start, so
    in-process retry is impossible)."""
    import jax

    try:
        jax.devices()
        return
    except RuntimeError as e:
        attempt = int(os.environ.get("_BENCH_CLAIM_ATTEMPT", "0"))
        if attempt >= 6:
            print(json.dumps({"metric": "frames_registered_per_s", "value": 0.0,
                              "unit": "frames/s", "vs_baseline": 0.0,
                              "error": f"device unavailable: {e}"}))
            sys.exit(1)
        print(f"device busy (attempt {attempt}); retrying in 150s", file=sys.stderr)
        time.sleep(150)
        os.environ["_BENCH_CLAIM_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    _ensure_device()
    n_images = 12
    # pass 1: compile everything (different seed so no caching of answers)
    n1, cold_s, ate1 = run_once(3, n_images, verbose=True)
    from colmap_pcd_tpu.models.controllers import PHASES

    print("cold pass phase breakdown:\n" + PHASES.report(), file=sys.stderr, flush=True)
    PHASES.totals.clear()
    PHASES.counts.clear()
    # pass 2: steady state
    n2, warm_s, ate2 = run_once(7, n_images, verbose=True)
    print("steady pass phase breakdown:\n" + PHASES.report(), file=sys.stderr, flush=True)

    fps = n2 / warm_s if warm_s > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "frames_registered_per_s",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
                "ate_m": round(ate2, 4),
                "registered": n2,
                "total_images": n_images,
                "wall_s": round(warm_s, 2),
                "cold_wall_s": round(cold_s, 2),
                "cold_ate_m": round(ate1, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
