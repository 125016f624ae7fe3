"""Initialization retry, relaxation, multi-model management, and the
two-view degeneracy gates (WATERMARK, forward motion).

Reference behavior: controllers/incremental_mapper.cc:442-493 (relaxation),
:591-901 (trial loop + model discard), sfm/incremental_mapper.cc:1947-2003
(EstimateInitialTwoViewGeometry gates), estimators/two_view_geometry.h:48-66
(configs)."""

import numpy as np
import pytest

from colmap_pcd_tpu.models import two_view
from colmap_pcd_tpu.models.controllers import (
    ControllerOptions,
    IncrementalMapperController,
)
from colmap_pcd_tpu.models.incremental_mapper import IncrementalMapper, MapperOptions
from colmap_pcd_tpu.models.reconstruction import Image
from colmap_pcd_tpu.models.reconstruction_manager import (
    ReconstructionManager,
    clone_skeleton,
)

from synthetic import make_world


def _classic_opts(**kw):
    base = dict(
        if_add_lidar_constraint=False,
        if_add_lidar_corresponding=False,
        init_image_id1=-1,
        init_image_id2=-1,
        abs_pose_min_num_inliers=15,
        init_min_num_inliers=30,
        init_min_tri_angle=1.0,
        init_max_forward_motion=2.0,  # corridor world moves forward
        num_ransac_hypotheses=1024,
    )
    base.update(kw)
    return MapperOptions(**base)


def test_forward_motion_gate_rejects_corridor():
    """With the reference default init_max_forward_motion=0.95, every pair of
    the forward-moving corridor fails verification -> no init pair found."""
    rng = np.random.default_rng(3)
    rec, graph, lmap, gt = make_world(rng, n_images=5, n_points=400, noise_px=0.2)
    opts = _classic_opts(init_max_forward_motion=0.95)
    mapper = IncrementalMapper(rec, graph)
    id1, id2 = mapper.find_initial_image_pair(opts)
    assert (id1, id2) == (-1, -1)


def test_init_search_accepts_with_relaxed_gate():
    rng = np.random.default_rng(3)
    rec, graph, lmap, gt = make_world(rng, n_images=5, n_points=400, noise_px=0.2)
    mapper = IncrementalMapper(rec, graph)
    id1, id2 = mapper.find_initial_image_pair(_classic_opts())
    assert id1 > 0 and id2 > 0
    # the verified geometry is cached for register_initial_image_pair
    assert mapper._prev_init_geometry is not None


def test_relaxation_recovers_from_strict_inliers():
    """run() halves init_min_num_inliers when no model is produced
    (controllers/incremental_mapper.cc:466-489)."""
    rng = np.random.default_rng(5)
    rec, graph, lmap, gt = make_world(rng, n_images=6, n_points=500, noise_px=0.2)
    max_m = max(graph.num_matches(i, j) for i in range(1, 7) for j in range(i + 1, 7))
    opts = _classic_opts(init_min_num_inliers=int(1.6 * max_m))
    ctl = IncrementalMapperController(
        rec, graph, opts, ControllerOptions(verbose=False, min_model_size=3)
    )
    manager = ctl.run()
    assert manager.size() >= 1
    assert ctl.rec.num_reg_images >= 4


def _merge_worlds(w1, w2, shift=100):
    """Two disconnected components in one reconstruction + graph."""
    rec1, graph1, _, _ = w1
    rec2, graph2, _, _ = w2
    for iid, im in sorted(rec2.images.items()):
        rec1.add_image(Image(iid + shift, f"b_{im.name}", im.camera_id, xys=im.xys.copy()))
        graph1.add_image(iid + shift, im.xys.shape[0])
    for i in sorted(rec2.images.keys()):
        for j in sorted(rec2.images.keys()):
            if j <= i:
                continue
            m = graph2.matches_between(i, j)
            if len(m):
                graph1.add_matches(i + shift, j + shift, np.asarray(m, np.int32))
    return rec1, graph1


def test_multi_model_disconnected_components():
    """A database with two disconnected components yields two models
    (max_num_models / min_model_size, :887-901)."""
    rng = np.random.default_rng(9)
    w1 = make_world(rng, n_images=5, n_points=450, noise_px=0.2)
    w2 = make_world(np.random.default_rng(13), n_images=5, n_points=450, noise_px=0.2)
    rec, graph = _merge_worlds(w1, w2)
    opts = _classic_opts()
    ctl = IncrementalMapperController(
        rec, graph, opts, ControllerOptions(verbose=False, min_model_size=3)
    )
    manager = ctl.run()
    assert manager.size() == 2, manager.size()
    sizes = sorted(m.num_reg_images for m in manager)
    assert sizes[0] >= 3 and sizes[1] >= 3, sizes
    # the two models cover disjoint image id ranges
    ids_a = set(manager.get(0).registered_ids)
    ids_b = set(manager.get(1).registered_ids)
    assert not (ids_a & ids_b)
    assert (max(ids_a) < 100) != (max(ids_b) < 100)


def test_single_model_option_stops_after_first():
    rng = np.random.default_rng(9)
    w1 = make_world(rng, n_images=5, n_points=450, noise_px=0.2)
    w2 = make_world(np.random.default_rng(13), n_images=5, n_points=450, noise_px=0.2)
    rec, graph = _merge_worlds(w1, w2)
    ctl = IncrementalMapperController(
        rec,
        graph,
        _classic_opts(),
        ControllerOptions(verbose=False, min_model_size=3, multiple_models=False),
    )
    manager = ctl.run()
    assert manager.size() == 1


def test_clone_skeleton_is_fresh():
    rng = np.random.default_rng(2)
    rec, graph, _, _ = make_world(rng, n_images=4, n_points=300, noise_px=0.2)
    rec.images[1].registered = True
    out = clone_skeleton(rec)
    assert set(out.images) == set(rec.images)
    assert out.num_reg_images == 0
    assert not out.points3D
    out.images[2].xys[0, 0] = -1.0
    assert rec.images[2].xys[0, 0] != -1.0  # deep-copied keypoints
    rec.images[1].registered = False


def test_reconstruction_manager_basics(tmp_path):
    man = ReconstructionManager()
    rng = np.random.default_rng(2)
    rec, _, _, _ = make_world(rng, n_images=3, n_points=200, noise_px=0.2)
    idx = man.add(rec)
    assert man.size() == 1 and man.get(idx) is rec
    man.add()
    assert man.best_index() == 0
    man.write(str(tmp_path))
    assert (tmp_path / "0" / "cameras.bin").exists()
    man.delete(1)
    assert man.size() == 1


# ---------------------------------------------------------------- watermark
def test_detect_watermark_border_translation():
    rng = np.random.default_rng(0)
    n = 200
    w = h = 1000
    # border points (a watermark strip along the bottom edge)
    uv1 = np.column_stack([rng.uniform(0, w, n), rng.uniform(h - 40, h - 1, n)])
    uv2 = uv1 + np.array([1.5, -0.5])  # pure translation
    mask = np.ones(n, bool)
    assert two_view.detect_watermark(uv1, uv2, mask, (w, h), (w, h))


def test_detect_watermark_center_points_negative():
    rng = np.random.default_rng(0)
    n = 200
    w = h = 1000
    uv1 = np.column_stack([rng.uniform(300, 700, n), rng.uniform(300, 700, n)])
    uv2 = uv1 + np.array([1.5, -0.5])
    mask = np.ones(n, bool)
    assert not two_view.detect_watermark(uv1, uv2, mask, (w, h), (w, h))


def test_detect_watermark_nonrigid_border_negative():
    rng = np.random.default_rng(0)
    n = 200
    w = h = 1000
    uv1 = np.column_stack([rng.uniform(0, w, n), rng.uniform(0, 40, n)])
    uv2 = uv1 + rng.uniform(-30, 30, (n, 2))  # incoherent displacements
    mask = np.ones(n, bool)
    assert not two_view.detect_watermark(uv1, uv2, mask, (w, h), (w, h))
