"""Overlapped frontend (models/overlap.py): extraction + matching threads
streaming into a PairFeed, drained by the mapper controller mid-loop.

The reference runs the three stages strictly sequentially; there is no
reference analog for this — the correctness bar is parity with the
sequential pipeline's database output plus mapper-state consistency when
matches arrive late (visibility replay)."""

import numpy as np
import pytest

from colmap_pcd_tpu.models.database import Database
from colmap_pcd_tpu.models.overlap import PairFeed, run_overlapped_frontend
from colmap_pcd_tpu.utils.config import SiftMatchingConfig

from test_pipeline import image_dir, EXTRACT  # noqa: F401


def test_overlapped_frontend_matches_sequential(image_dir, tmp_path):  # noqa: F811
    """The overlapped frontend must produce the same verified pairs as the
    sequential extractor->matcher pipeline."""
    from colmap_pcd_tpu.models.feature_pipeline import (
        run_feature_extractor,
        run_sequential_matcher,
    )

    # sequential reference run
    db_seq = str(tmp_path / "seq.db")
    run_feature_extractor(db_seq, image_dir, EXTRACT)
    run_sequential_matcher(db_seq, SiftMatchingConfig(min_num_inliers=10),
                           overlap=3, quadratic_overlap=False)
    db = Database(db_seq)
    seq_pairs = {
        (i, j): len(db.read_two_view_geometry(i, j)["inlier_matches"])
        for i, j in db.all_two_view_pair_ids()
    }
    db.close()

    # overlapped run
    db_ovl = str(tmp_path / "ovl.db")
    feed, tE, tM = run_overlapped_frontend(
        db_ovl, image_dir, EXTRACT, SiftMatchingConfig(min_num_inliers=10),
        overlap=3, quadratic_overlap=False,
    )
    tE.join(timeout=300)
    tM.join(timeout=300)
    assert feed.done and feed.error is None
    imgs, cams, pairs = feed.drain()
    assert len(imgs) == 4
    assert len(cams) == 1
    got = {(i, j): len(m) for i, j, m in pairs}
    assert set(got) == set(seq_pairs)
    for k in got:
        # identical inputs -> identical matcher output
        assert got[k] == seq_pairs[k], k


def test_drain_feed_updates_graph_and_visibility(rng):
    """drain_feed ingests streamed images/pairs and replays late matches into
    the visibility ranking (a late image must become registrable)."""
    from synthetic import make_world

    from colmap_pcd_tpu.models.controllers import (
        ControllerOptions,
        IncrementalMapperController,
    )
    from colmap_pcd_tpu.models.correspondence_graph import CorrespondenceGraph
    from colmap_pcd_tpu.models.incremental_mapper import MapperOptions
    from colmap_pcd_tpu.models.reconstruction import Reconstruction

    rec_full, graph_full, lmap, gt = make_world(
        np.random.default_rng(3), n_images=6, n_points=400
    )
    # strip image 6 and all its matches from the starting state
    rec = Reconstruction()
    for cid, c in rec_full.cameras.items():
        rec.add_camera(c)
    graph = CorrespondenceGraph()
    for iid, img in rec_full.images.items():
        if iid == 6:
            continue
        rec.add_image(img)
        graph.add_image(iid, img.xys.shape[0])
    for i, j in graph_full.image_pairs():
        if 6 in (i, j):
            continue
        graph.add_matches(i, j, graph_full.matches_between(i, j))

    feed = PairFeed()
    opts = MapperOptions(
        if_add_lidar_constraint=True, init_image_id1=1, init_image_id2=2,
        abs_pose_min_num_inliers=15, init_min_num_inliers=50,
        num_ransac_hypotheses=1024,
    )
    ctl = IncrementalMapperController(
        rec, graph, opts, ControllerOptions(verbose=False),
        lidar_map=lmap, pose_priors={1: gt[0]}, pair_feed=feed,
    )
    # stream image 6 + its pairs in as if matching just finished them
    img6 = rec_full.images[6]
    feed.push_image(6, img6.name, img6.camera_id, img6.xys)
    for i, j in graph_full.image_pairs():
        if 6 in (i, j):
            feed.push_pair(i, j, graph_full.matches_between(i, j))
    feed.mark_done()

    assert ctl.reconstruct()
    assert rec.num_reg_images == 6
    assert rec.images[6].registered  # the streamed image registered
