"""Whole-map BundleAdjustmentController incl. intrinsics refinement
(BASELINE config 4: final batch BA with intrinsics refinement)."""

import numpy as np

from colmap_pcd_tpu.models.controllers import (
    BundleAdjustmentController,
    ControllerOptions,
    IncrementalMapperController,
)
from colmap_pcd_tpu.models.incremental_mapper import MapperOptions

from synthetic import ate_rmse, make_world


def test_whole_map_ba_with_intrinsics_refinement(rng):
    rec, graph, lmap, gt = make_world(rng, n_images=6, n_points=500, noise_px=0.3)
    opts = MapperOptions(
        if_add_lidar_constraint=True, init_image_id1=1, init_image_id2=2,
        abs_pose_min_num_inliers=15, init_min_num_inliers=50,
        num_ransac_hypotheses=1024,
    )
    ctl = IncrementalMapperController(
        rec, graph, opts, ControllerOptions(verbose=False),
        lidar_map=lmap, pose_priors={1: gt[0]},
    )
    assert ctl.reconstruct()
    ate0 = ate_rmse(rec, gt)

    # corrupt the focal length by 1% then run whole-map BA with refinement
    cam = rec.cameras[1]
    true_f = cam.params[0]
    cam.params = cam.params.copy()
    cam.params[0] *= 1.01
    cam.params[1] *= 1.01
    # forward corridor motion makes joint pose+focal refinement dolly-zoom
    # degenerate; calibrate with trusted poses (refine_extrinsics=False —
    # the reference's BundleAdjustment.refine_extrinsics flag)
    bac = BundleAdjustmentController(
        rec, opts, lidar_map=lmap, refine_intrinsics=True, refine_extrinsics=False
    )
    assert bac.run()
    f_out = rec.cameras[1].params[0]
    assert abs(f_out - true_f) / true_f < 0.005, (f_out, true_f)
    # trajectory untouched (poses frozen)
    assert ate_rmse(rec, gt) < max(0.12, ate0 * 1.5)


def test_whole_map_ba_no_lidar_gauge(rng):
    rec, graph, lmap, gt = make_world(rng, n_images=5, n_points=400, noise_px=0.2)
    opts = MapperOptions(
        if_add_lidar_constraint=True, init_image_id1=1, init_image_id2=2,
        abs_pose_min_num_inliers=15, init_min_num_inliers=50,
        num_ransac_hypotheses=1024,
    )
    ctl = IncrementalMapperController(
        rec, graph, opts, ControllerOptions(verbose=False),
        lidar_map=lmap, pose_priors={1: gt[0]},
    )
    assert ctl.reconstruct()
    # run batch BA without lidar: classic gauge (first pose + tvec comp fixed)
    opts2 = MapperOptions(if_add_lidar_constraint=False, if_add_lidar_corresponding=False)
    bac = BundleAdjustmentController(rec, opts2, lidar_map=None)
    assert bac.run()
    assert rec.mean_reprojection_error() < 1.0
