"""CLI integration: the full `colmap`-style workflow through the command
interface — extractor -> matcher -> mapper -> analyzer/converter."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from colmap_pcd_tpu import cli
from colmap_pcd_tpu.models.database import Database

from test_pipeline import image_dir, EXTRACT  # fixture reuse  # noqa: F401


def test_cli_help(capsys):
    assert cli.main([]) == 0
    out = capsys.readouterr().out
    assert "feature_extractor" in out and "mapper" in out


def test_cli_unknown(capsys):
    assert cli.main(["frobnicate"]) == 1


def test_cli_workflow(image_dir, tmp_path, capsys):  # noqa: F811
    dbp = str(tmp_path / "w.db")
    rc = cli.main([
        "feature_extractor",
        "--database_path", dbp,
        "--image_path", image_dir,
        "--SiftExtraction.max_num_features", "512",
        "--SiftExtraction.first_octave", "0",
        "--SiftExtraction.num_octaves", "3",
        "--SiftExtraction.max_image_size", "512",
    ])
    assert rc == 0
    rc = cli.main([
        "exhaustive_matcher", "--database_path", dbp,
        "--SiftMatching.min_num_inliers", "10",
    ])
    assert rc == 0
    db = Database(dbp)
    assert len(db.all_two_view_pair_ids()) >= 3
    db.close()


def test_cli_model_roundtrip(tmp_path, capsys):
    # build a tiny model, write, convert, analyze
    from colmap_pcd_tpu.models.reconstruction import Camera, Image, Reconstruction

    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 640, 480, np.asarray([500.0, 500, 320, 240])))
    im = Image(1, "a.png", 1, xys=np.asarray([[10.0, 10.0], [20.0, 20.0]]))
    rec.add_image(im)
    im2 = Image(2, "b.png", 1, xys=np.asarray([[11.0, 10.0], [21.0, 20.0]]))
    rec.add_image(im2)
    rec.register_image(1)
    rec.register_image(2)
    rec.add_point3D([0, 0, 5.0], [(1, 0), (2, 0)])
    model_dir = str(tmp_path / "model")
    rec.write(model_dir)

    rec2 = Reconstruction.read(model_dir)
    assert len(rec2.points3D) == 1
    assert rec2.images[1].name == "a.png"
    np.testing.assert_allclose(rec2.images[1].xys, im.xys)

    txt_dir = str(tmp_path / "txt")
    assert cli.main(["model_converter", "--input_path", model_dir, "--output_path", txt_dir, "--output_type", "TXT"]) == 0
    rec3 = Reconstruction.read(txt_dir)
    assert len(rec3.points3D) == 1

    ply = str(tmp_path / "m.ply")
    assert cli.main(["model_converter", "--input_path", model_dir, "--output_path", ply, "--output_type", "PLY"]) == 0
    assert os.path.exists(ply)

    assert cli.main(["model_analyzer", "--path", model_dir]) == 0
    out = capsys.readouterr().out
    assert "registered_images: 2" in out


def test_cli_model_aligner_transformer(tmp_path, rng, capsys):
    from colmap_pcd_tpu.models.reconstruction import Camera, Image, Reconstruction

    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 640, 480, np.asarray([500.0, 500, 320, 240])))
    centers = rng.normal(size=(5, 3)) * 3
    for i, c in enumerate(centers, 1):
        im = Image(i, f"i{i}.png", 1, tvec=-c)  # identity rotation: t = -C
        rec.add_image(im)
        rec.register_image(i)
    d = str(tmp_path / "in")
    rec.write(d)
    # reference positions = centers shifted by (1,2,3), scaled by 2
    ref = str(tmp_path / "refs.txt")
    with open(ref, "w") as f:
        for i, c in enumerate(centers, 1):
            x, y, z = 2 * c + [1, 2, 3]
            f.write(f"i{i}.png {x} {y} {z}\n")
    out = str(tmp_path / "out")
    # robust path requires a positive max_error (reference exe/model.cc:307)
    assert cli.main(["model_aligner", "--input_path", d, "--output_path", out, "--ref_images_path", ref]) == 1
    assert cli.main([
        "model_aligner", "--input_path", d, "--output_path", out,
        "--ref_images_path", ref, "--robust_alignment_max_error", "0.5",
    ]) == 0
    rec2 = Reconstruction.read(out)
    for i, c in enumerate(centers, 1):
        np.testing.assert_allclose(rec2.images[i].projection_center(), 2 * c + [1, 2, 3], atol=1e-2)
    # non-robust fallback (reference Align): plain Umeyama
    assert cli.main([
        "model_aligner", "--input_path", d, "--output_path", out,
        "--ref_images_path", ref, "--robust_alignment", "0",
    ]) == 0


def test_cli_model_aligner_robust_outlier(tmp_path, rng):
    """A single corrupt reference row must not corrupt the similarity fit
    (reference AlignRobust: RANSAC<SimilarityTransformEstimator>)."""
    from colmap_pcd_tpu.models.reconstruction import Camera, Image, Reconstruction

    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 640, 480, np.asarray([500.0, 500, 320, 240])))
    centers = rng.normal(size=(8, 3)) * 3
    for i, c in enumerate(centers, 1):
        rec.add_image(Image(i, f"i{i}.png", 1, tvec=-c))
        rec.register_image(i)
    d = str(tmp_path / "in")
    rec.write(d)
    ref = str(tmp_path / "refs.txt")
    with open(ref, "w") as f:
        for i, c in enumerate(centers, 1):
            x, y, z = 2 * c + [1, 2, 3]
            if i == 3:  # gross outlier row
                x, y, z = 500.0, -900.0, 1234.0
            f.write(f"i{i}.png {x} {y} {z}\n")
    out = str(tmp_path / "out")
    assert cli.main([
        "model_aligner", "--input_path", d, "--output_path", out,
        "--ref_images_path", ref, "--robust_alignment_max_error", "0.5",
    ]) == 0
    rec2 = Reconstruction.read(out)
    for i, c in enumerate(centers, 1):
        if i == 3:
            continue
        np.testing.assert_allclose(rec2.images[i].projection_center(), 2 * c + [1, 2, 3], atol=5e-2)


def test_cli_model_viewer(tmp_path, rng, capsys):
    """model_viewer exports a self-contained HTML WebGL viewer (the headless
    replacement for the Qt ModelViewerWidget, model_viewer_widget.h:125-184)
    with all four layers: points, frusta, lidar map, association lines."""
    import base64
    import json
    import re

    from colmap_pcd_tpu.io import ply as ply_io
    from colmap_pcd_tpu.models.reconstruction import Camera, Image, LidarAssoc, Reconstruction

    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 640, 480, np.asarray([500.0, 500, 320, 240])))
    for i in range(1, 4):
        im = Image(i, f"i{i}.png", 1, tvec=np.asarray([0.0, 0, -i]),
                   xys=rng.uniform(0, 400, (20, 2)))
        rec.add_image(im)
        rec.register_image(i)
    pts = rng.normal(size=(20, 3)) + [0, 0, 5]
    for k, x in enumerate(pts):
        pid = rec.add_point3D(x, [(1, k), (2, k)])
        if k < 5:
            n = np.asarray([0.0, 1.0, 0.0])
            rec.lidar_points[pid] = LidarAssoc(
                type=k % 3, point=x + 0.05, plane=np.asarray([*n, -np.dot(n, x + 0.05)])
            )
    d = str(tmp_path / "model")
    rec.write(d)
    lidar = str(tmp_path / "map.ply")
    ply_io.write_ply(lidar, rng.normal(size=(100, 3)).astype(np.float32), None, None)
    out = str(tmp_path / "viewer.html")
    assert cli.main([
        "model_viewer", "--input_path", d, "--output_path", out,
        "--lidar_path", lidar,
    ]) == 0
    html = open(out).read()
    assert "webgl" in html
    payload = json.loads(re.search(r"const D=(\{.*?\});\n", html).group(1))
    assert payload["n_sfm"] == 20
    assert payload["n_cam"] == 3 * 8 * 2  # 8 segments x 2 verts per camera
    assert payload["n_lidar"] == 100
    # associations are runtime state (not persisted in the model format), so
    # the CLI path has none; the library path paints them:
    assert payload["n_assoc"] == 0
    xyz = np.frombuffer(base64.b64decode(payload["sfm_xyz"]), np.float32).reshape(-1, 3)
    np.testing.assert_allclose(xyz, pts.astype(np.float32), atol=1e-5)

    from colmap_pcd_tpu.io.viewer import export_viewer_html

    out2 = str(tmp_path / "viewer_assoc.html")
    export_viewer_html(rec, out2)
    payload2 = json.loads(re.search(r"const D=(\{.*?\});\n", open(out2).read()).group(1))
    assert payload2["n_assoc"] == 10
    seg = np.frombuffer(base64.b64decode(payload2["assoc_xyz"]), np.float32).reshape(-1, 2, 3)
    np.testing.assert_allclose(seg[:, 1] - seg[:, 0], 0.05, atol=1e-5)
