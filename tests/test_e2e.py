"""End-to-end incremental mapping on the synthetic corridor world.

The acceptance test SURVEY.md §7.2 calls for: lidar-seeded init -> incremental
registration -> lidar-constrained local/global BA -> ATE vs ground truth.
The reference has no test like this at all (SURVEY.md §4)."""

import numpy as np
import pytest

from colmap_pcd_tpu.models.controllers import (
    ControllerOptions,
    IncrementalMapperController,
)
from colmap_pcd_tpu.models.incremental_mapper import MapperOptions

from synthetic import ate_rmse, make_world


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    return make_world(rng, n_images=8, n_points=600, noise_px=0.3)


def test_e2e_lidar_mapping(world):
    rec, graph, lmap, gt = world
    opts = MapperOptions(
        if_add_lidar_constraint=True,
        init_image_id1=1,
        init_image_id2=2,
        abs_pose_min_num_inliers=15,
        init_min_num_inliers=50,
        num_ransac_hypotheses=1024,
    )
    copts = ControllerOptions(verbose=False)
    # seed image 1 with its ground-truth pose (pose prior path)
    priors = {1: gt[0]}
    ctl = IncrementalMapperController(
        rec, graph, opts, copts, lidar_map=lmap, pose_priors=priors
    )
    ok = ctl.reconstruct()
    assert ok
    assert rec.num_reg_images >= 7, rec.num_reg_images
    ate = ate_rmse(rec, gt)
    # metric accuracy: lidar constraints should pin the trajectory to ~cm level
    assert ate < 0.10, f"ATE {ate:.3f} m"
    # scale check: distance between first and last camera ~ ground truth
    reg = rec.registered_ids
    c0 = rec.images[1].projection_center()
    c_last = rec.images[max(reg)].projection_center()
    d_est = np.linalg.norm(c_last - c0)
    import jax.numpy as jnp

    from colmap_pcd_tpu.ops import se3

    qg, tg = gt[max(reg) - 1]
    cg = np.asarray(
        se3.projection_center(jnp.asarray(qg, jnp.float32), jnp.asarray(tg, jnp.float32))
    )
    c0g = np.asarray(
        se3.projection_center(
            jnp.asarray(gt[0][0], jnp.float32), jnp.asarray(gt[0][1], jnp.float32)
        )
    )
    d_gt = np.linalg.norm(cg - c0g)
    assert abs(d_est - d_gt) / d_gt < 0.02, (d_est, d_gt)


def test_e2e_classic_no_lidar():
    """Without lidar: classic two-view init; reconstruction is up-to-scale, so
    check internal consistency (registered count + reprojection errors)."""
    rng = np.random.default_rng(11)
    rec, graph, lmap, gt = make_world(rng, n_images=6, n_points=500, noise_px=0.2)
    opts = MapperOptions(
        if_add_lidar_constraint=False,
        if_add_lidar_corresponding=False,
        init_image_id1=1,
        init_image_id2=3,
        abs_pose_min_num_inliers=15,
        init_min_num_inliers=30,
        init_min_tri_angle=2.0,
        num_ransac_hypotheses=1024,
    )
    ctl = IncrementalMapperController(
        rec, graph, opts, ControllerOptions(verbose=False), lidar_map=None
    )
    ok = ctl.reconstruct()
    assert ok
    assert rec.num_reg_images >= 5, rec.num_reg_images
    rec.update_point_errors()
    errs = [p.error for p in rec.points3D.values() if p.error >= 0]
    assert np.median(errs) < 1.0, np.median(errs)


def test_scoped_vs_full_global_refinement_equivalent_accuracy():
    """The every-5-registrations global cadence (incremental_mapper.h:182)
    scopes CompleteAndMergeTracks to recently-touched points; a run with
    scoping forced OFF (every round full) must land at the same ATE within
    noise, and scoping must not lose registrations."""
    results = {}
    for scoped in (True, False):
        rng = np.random.default_rng(11)
        rec, graph, lmap, gt = make_world(rng, n_images=10, n_points=700, noise_px=0.3)
        opts = MapperOptions(
            if_add_lidar_constraint=True,
            init_image_id1=1, init_image_id2=2,
            abs_pose_min_num_inliers=15,
            init_min_num_inliers=50,
            num_ransac_hypotheses=1024,
        )
        copts = ControllerOptions(verbose=False, ba_global_images_freq=3)
        ctl = IncrementalMapperController(
            rec, graph, opts, copts, lidar_map=lmap, pose_priors={1: gt[0]}
        )
        if not scoped:
            # force every round to sweep all tracks
            ctl._global_refinement_is_full = lambda: True
        assert ctl.reconstruct()
        results[scoped] = (rec.num_reg_images, ate_rmse(rec, gt))
    n_s, ate_s = results[True]
    n_f, ate_f = results[False]
    assert n_s == n_f, results
    assert ate_s < 0.10 and ate_f < 0.10, results
    assert abs(ate_s - ate_f) < 0.02, results
