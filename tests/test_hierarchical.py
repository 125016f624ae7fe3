"""Scene clustering + sub-reconstruction merge tests."""

import numpy as np

from colmap_pcd_tpu.models.controllers import ControllerOptions
from colmap_pcd_tpu.models.hierarchical import (
    SceneClusteringOptions,
    cluster_images,
    merge_reconstructions,
    run_hierarchical_mapper,
)
from colmap_pcd_tpu.models.incremental_mapper import MapperOptions

from synthetic import ate_rmse, make_world


def test_cluster_images_balanced(rng):
    rec, graph, lmap, gt = make_world(rng, n_images=12, n_points=400)
    clusters = cluster_images(
        graph, list(rec.images.keys()), SceneClusteringOptions(leaf_max_num_images=8)
    )
    assert len(clusters) >= 2
    covered = set().union(*[set(c) for c in clusters])
    assert covered == set(rec.images.keys())
    # overlap exists between clusters
    inter = set(clusters[0]) & set(clusters[1])
    assert len(inter) >= 1


def test_merge_reconstructions(rng):
    """Two half-reconstructions of the same world merge back into one."""
    rec_a, graph, lmap, gt = make_world(rng, n_images=8, n_points=500)
    import copy

    rec_b = copy.deepcopy(rec_a)
    # register images 1..5 in A at ground truth, 4..8 in B at a transformed frame
    for i in range(1, 7):
        rec_a.images[i].qvec, rec_a.images[i].tvec = gt[i - 1]
        rec_a.register_image(i)
    from colmap_pcd_tpu.ops import se3
    import jax.numpy as jnp

    # B lives in a scaled/shifted frame
    s, tshift = 2.0, np.asarray([5.0, -1.0, 2.0])
    for i in range(4, 9):
        q, t = gt[i - 1]
        rec_b.images[i].qvec = q
        rec_b.images[i].tvec = s * t - np.asarray(
            se3.quat_to_rotmat(jnp.asarray(q, jnp.float32)), np.float64
        ) @ (np.eye(3) @ tshift) / 1.0  # world' = s*world + tshift
        rec_b.register_image(i)
    # note: world'=s R_identity world + tshift => t' = s t - R tshift
    ok = merge_reconstructions(rec_a, rec_b)
    assert ok
    assert rec_a.num_reg_images == 8
    ate = ate_rmse(rec_a, gt)
    assert ate < 0.05, ate


def test_hierarchical_end_to_end(rng):
    rec, graph, lmap, gt = make_world(rng, n_images=10, n_points=600, noise_px=0.3)

    def factory():
        import copy

        r, _, _, _ = make_world(np.random.default_rng(7), n_images=0)
        return copy.deepcopy(rec_factory_base)

    # simplest: deep-copy template
    import copy

    rec_factory_base = rec

    opts = MapperOptions(
        if_add_lidar_constraint=True,
        init_image_id1=1, init_image_id2=2,
        abs_pose_min_num_inliers=15, init_min_num_inliers=50,
        num_ransac_hypotheses=1024,
    )
    out = run_hierarchical_mapper(
        lambda: copy.deepcopy(rec), graph, opts,
        SceneClusteringOptions(leaf_max_num_images=6, image_overlap=4),
        lidar_map=lmap, pose_priors={1: gt[0]},
        controller_options=ControllerOptions(verbose=False),
    )
    assert out.num_reg_images >= 7, out.num_reg_images
    ate = ate_rmse(out, gt)
    assert ate < 0.15, ate
