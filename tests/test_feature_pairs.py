"""Raw feature-pairs importer (FeaturePairsFeatureMatcher parity)."""

import numpy as np

from colmap_pcd_tpu.models import feature_pipeline as fp
from colmap_pcd_tpu.models.database import Database
from colmap_pcd_tpu.utils.config import SiftMatchingConfig

from test_pipeline import image_dir, EXTRACT  # noqa: F401


def test_feature_pairs_import(image_dir, tmp_path):  # noqa: F811
    dbp = str(tmp_path / "fp.db")
    fp.run_feature_extractor(dbp, image_dir, EXTRACT)
    # craft a raw pairs file with identity-ish matches between im00 and im01
    db = Database(dbp)
    n1 = db.read_keypoints(1).shape[0]
    db.close()
    k = min(40, n1)
    path = str(tmp_path / "pairs.txt")
    with open(path, "w") as f:
        f.write("im00.png im01.png\n")
        for i in range(k):
            f.write(f"{i} {i}\n")
    n = fp.run_feature_pairs_importer(dbp, path, SiftMatchingConfig(min_num_inliers=5), verify=False)
    assert n == 1
    db = Database(dbp)
    m = db.read_matches(1, 2)
    assert m.shape[0] == k
    g = db.read_two_view_geometry(1, 2)
    assert g is not None and len(g["inlier_matches"]) == k
    db.close()
