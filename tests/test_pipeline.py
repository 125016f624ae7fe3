"""Feature pipeline integration: images -> SIFT -> database -> matchers ->
verified two-view geometries; plus retrieval index sanity."""

import os

import numpy as np
import pytest

from colmap_pcd_tpu.models import feature_pipeline as fp
from colmap_pcd_tpu.models.database import Database
from colmap_pcd_tpu.utils.config import SiftExtractionConfig, SiftMatchingConfig

from test_sift import make_texture


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image as PILImage

    rng = np.random.default_rng(3)
    big = make_texture(rng, H=420, W=640, n_blobs=400)
    d = tmp_path_factory.mktemp("imgs")
    for i in range(4):
        crop = big[i * 40 : i * 40 + 256, i * 60 : i * 60 + 256]
        PILImage.fromarray((crop * 255).astype(np.uint8)).save(d / f"im{i:02d}.png")
    return str(d)


EXTRACT = SiftExtractionConfig(
    max_num_features=512, first_octave=0, num_octaves=3, max_image_size=512
)
MATCH = SiftMatchingConfig(min_num_inliers=10)


def test_extract_and_match(image_dir, tmp_path):
    dbp = str(tmp_path / "test.db")
    n = fp.run_feature_extractor(dbp, image_dir, EXTRACT)
    assert n == 4
    db = Database(dbp)
    imgs = db.images()
    assert len(imgs) == 4
    for iid in imgs:
        kp = db.read_keypoints(iid)
        desc = db.read_descriptors(iid)
        assert kp.shape[0] == desc.shape[0]
        assert kp.shape[0] > 50, kp.shape
    db.close()

    n_pairs = fp.run_sequential_matcher(dbp, MATCH, overlap=2, quadratic_overlap=False)
    assert n_pairs >= 3, n_pairs
    db = Database(dbp)
    m = db.read_matches(1, 2)
    assert m.shape[0] > 30, m.shape
    g = db.read_two_view_geometry(1, 2)
    assert g is not None and len(g["inlier_matches"]) > 20
    db.close()


def test_exhaustive_matcher(image_dir, tmp_path):
    dbp = str(tmp_path / "ex.db")
    fp.run_feature_extractor(dbp, image_dir, EXTRACT)
    n = fp.run_exhaustive_matcher(dbp, MATCH)
    assert n >= 3
    db = Database(dbp)
    # far-apart crops share little area; consecutive must match
    assert db.read_matches(2, 3).shape[0] > 20
    db.close()


def test_retrieval_ranks_overlapping_first(image_dir, tmp_path):
    from colmap_pcd_tpu.ops import retrieval

    dbp = str(tmp_path / "ret.db")
    fp.run_feature_extractor(dbp, image_dir, EXTRACT)
    db = Database(dbp)
    descs = {i: db.read_descriptors(i).astype(np.float32) for i in db.images()}
    db.close()
    index = retrieval.build_index(descs, k=16)
    top = retrieval.query(index, 1, 2)
    assert 2 in top, top  # most-overlapping image should rank near the top


def test_image_pairs_matcher(image_dir, tmp_path):
    dbp = str(tmp_path / "pairs.db")
    fp.run_feature_extractor(dbp, image_dir, EXTRACT)
    n = fp.run_image_pairs_matcher(dbp, [("im00.png", "im01.png")], MATCH)
    assert n == 1
