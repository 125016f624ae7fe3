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


# ---------------------------------------------------------------------------
# round-3 CLI utilities (exe/colmap.cc:104-137 command-parity tail)


def _toy_model(tmp_path, rng, n_images=6, n_points=40):
    """Registered model with synthetic observations; returns (rec, model_dir)."""
    from colmap_pcd_tpu.models.reconstruction import Camera, Image, Reconstruction

    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 64, 48, np.asarray([50.0, 50.0, 32.0, 24.0])))
    pts = rng.normal(size=(n_points, 3)) * 0.5 + [0, 0, 5.0]
    for i in range(1, n_images + 1):
        t = np.asarray([0.1 * i, 0.0, 0.0])
        uv = (pts[:, :2] - t[None, :2]) / (pts[:, 2:] ) * 50.0 + [32.0, 24.0]
        im = Image(i, f"im{i:02d}.png", 1, tvec=-t, xys=uv)
        rec.add_image(im)
        rec.register_image(i)
    for k in range(n_points):
        rec.add_point3D(pts[k], [(i, k) for i in range(1, n_images + 1)])
    d = str(tmp_path / "toy_model")
    rec.write(d)
    return rec, d


def test_cli_image_deleter(tmp_path, rng):
    from colmap_pcd_tpu.models.reconstruction import Reconstruction

    _, d = _toy_model(tmp_path, rng)
    ids = str(tmp_path / "ids.txt")
    open(ids, "w").write("2\n99\n")
    names = str(tmp_path / "names.txt")
    open(names, "w").write("im03.png\nnope.png\n")
    out = str(tmp_path / "out")
    assert cli.main([
        "image_deleter", "--input_path", d, "--output_path", out,
        "--image_ids_path", ids, "--image_names_path", names,
    ]) == 0
    rec2 = Reconstruction.read(out)
    assert rec2.num_reg_images == 4
    reg = {rec2.images[i].name for i in rec2.registered_ids}
    assert "im02.png" not in reg and "im03.png" not in reg


def test_cli_image_filterer(tmp_path, rng):
    from colmap_pcd_tpu.models.reconstruction import Reconstruction

    rec, d = _toy_model(tmp_path, rng)
    out = str(tmp_path / "out")
    # min_num_observations high enough to drop everything
    assert cli.main([
        "image_filterer", "--input_path", d, "--output_path", out,
        "--min_num_observations", "1000",
    ]) == 0
    assert Reconstruction.read(out).num_reg_images == 0
    # permissive: keeps all

    assert cli.main([
        "image_filterer", "--input_path", d, "--output_path", out,
        "--min_num_observations", "1",
    ]) == 0
    assert Reconstruction.read(out).num_reg_images == 6


def test_cli_point_filtering(tmp_path, rng):
    from colmap_pcd_tpu.models.reconstruction import Reconstruction

    rec, d = _toy_model(tmp_path, rng)
    out = str(tmp_path / "out")
    assert cli.main([
        "point_filtering", "--input_path", d, "--output_path", out,
        "--max_reproj_error", "0.5", "--min_tri_angle", "0.0",
    ]) == 0
    rec2 = Reconstruction.read(out)
    assert len(rec2.points3D) <= len(rec.points3D)
    # absurd track-length bound deletes everything
    assert cli.main([
        "point_filtering", "--input_path", d, "--output_path", out,
        "--min_track_len", "100",
    ]) == 0
    assert len(Reconstruction.read(out).points3D) == 0


def test_cli_project_generator(tmp_path):
    from colmap_pcd_tpu.utils.config import OptionManager

    out = str(tmp_path / "project.ini")
    assert cli.main(["project_generator", "--output_path", out, "--quality", "low"]) == 0
    om = OptionManager()
    om.read_ini(out)
    assert om.sift_extraction.max_image_size == 1000
    assert cli.main(["project_generator", "--output_path", out, "--quality", "bogus"]) == 1
    assert cli.main(["project_generator", "--output_path", out, "--quality", "extreme"]) == 0
    om2 = OptionManager()
    om2.read_ini(out)
    assert om2.sift_extraction.domain_size_pooling is True


def test_cli_color_extractor(tmp_path, rng):
    from PIL import Image as PILImage

    from colmap_pcd_tpu.models.reconstruction import Reconstruction

    rec, d = _toy_model(tmp_path, rng)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    # constant-color images => every point gets that color
    for i in range(1, 7):
        arr = np.full((48, 64, 3), [10 * i, 20, 200], np.uint8)
        PILImage.fromarray(arr).save(img_dir / f"im{i:02d}.png")
    out = str(tmp_path / "out")
    assert cli.main([
        "color_extractor", "--image_path", str(img_dir),
        "--input_path", d, "--output_path", out,
    ]) == 0
    rec2 = Reconstruction.read(out)
    colored = [p for p in rec2.points3D.values() if p.color.any()]
    assert len(colored) > 0
    # mean of 10*i for i=1..6 = 35 (only in-bounds images contribute)
    for p in colored:
        assert p.color[2] == 200


def test_cli_feature_importer(tmp_path, image_dir):  # noqa: F811
    dbp = str(tmp_path / "imp.db")
    import_dir = tmp_path / "feats"
    import_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in sorted(os.listdir(image_dir)):
        n, dim = 20, 128
        rows = np.concatenate(
            [rng.uniform(5, 250, size=(n, 2)),          # x y
             rng.uniform(1, 4, size=(n, 1)),            # scale
             rng.uniform(0, 6.28, size=(n, 1)),         # orientation
             rng.integers(0, 256, size=(n, dim))], axis=1)
        with open(import_dir / (name + ".txt"), "w") as f:
            f.write(f"{n} {dim}\n")
            np.savetxt(f, rows, fmt="%.3f")
    assert cli.main([
        "feature_importer", "--database_path", dbp, "--image_path", image_dir,
        "--import_path", str(import_dir),
    ]) == 0
    db = Database(dbp)
    imgs = db.images()
    assert len(imgs) == 4
    for iid in imgs:
        assert db.read_keypoints(iid).shape[0] == 20
        assert db.read_descriptors(iid).shape == (20, 128)
    db.close()


def test_cli_image_undistorter_standalone(tmp_path, rng):
    from PIL import Image as PILImage

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    arr = (np.linspace(0, 255, 64 * 48 * 3).reshape(48, 64, 3)).astype(np.uint8)
    PILImage.fromarray(arr).save(img_dir / "a.png")
    lst = str(tmp_path / "cams.txt")
    open(lst, "w").write("a.png OPENCV 50 50 32 24 0.1 -0.05 0.001 0.001\n")
    out = str(tmp_path / "und")
    assert cli.main([
        "image_undistorter_standalone", "--image_path", str(img_dir),
        "--input_file", lst, "--output_path", out,
    ]) == 0
    assert os.path.exists(os.path.join(out, "a.png"))


def test_cli_image_rectifier(tmp_path, rng):
    from PIL import Image as PILImage

    rec, d = _toy_model(tmp_path, rng, n_images=2)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in (1, 2):
        arr = (rng.uniform(0, 255, size=(48, 64, 3))).astype(np.uint8)
        PILImage.fromarray(arr).save(img_dir / f"im{i:02d}.png")
    pairs = str(tmp_path / "pairs.txt")
    open(pairs, "w").write("im01.png im02.png\n")
    out = str(tmp_path / "rect")
    assert cli.main([
        "image_rectifier", "--image_path", str(img_dir), "--input_path", d,
        "--output_path", out, "--stereo_pairs_list", pairs,
    ]) == 0
    assert os.path.exists(os.path.join(out, "im01-im02_1.png"))
    assert os.path.exists(os.path.join(out, "im01-im02_2.png"))


def test_rectification_row_alignment(rng):
    """After rectification the same 3D point must land on the same image row
    in both views (the defining property of stereo rectification)."""
    from colmap_pcd_tpu.models.reconstruction import Camera
    from colmap_pcd_tpu.models.undistortion import rectify_stereo_cameras
    from colmap_pcd_tpu.ops import np_geom

    cam = Camera(1, 1, 640, 480, np.asarray([500.0, 500.0, 320.0, 240.0]))
    # relative pose: mostly-x baseline with a small rotation
    w = np.asarray([0.02, -0.03, 0.01])
    th = np.linalg.norm(w)
    q = np.concatenate([[np.cos(th / 2)], w / th * np.sin(th / 2)])
    t = np.asarray([1.0, 0.05, -0.02])
    H1, H2, Q = rectify_stereo_cameras(cam, cam, q, t)
    R = np_geom.quat_to_rotmat(q)
    X = rng.normal(size=(50, 3)) * 2 + [0, 0, 10.0]   # points in camera-1 frame
    X2 = X @ R.T + t
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    p1 = (K @ X.T).T
    p1 = p1[:, :2] / p1[:, 2:]
    p2 = (K @ X2.T).T
    p2 = p2[:, :2] / p2[:, 2:]
    h1 = (H1 @ np.concatenate([p1, np.ones((50, 1))], 1).T).T
    h2 = (H2 @ np.concatenate([p2, np.ones((50, 1))], 1).T).T
    y1 = h1[:, 1] / h1[:, 2]
    y2 = h2[:, 1] / h2[:, 2]
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_cli_image_registrator(tmp_path, rng):
    """image_registrator: PnP-register database images into an existing model
    without running the mapper (RunImageRegistrator, exe/image.cc:239)."""
    from synthetic import make_world

    from colmap_pcd_tpu.models.controllers import (
        ControllerOptions,
        IncrementalMapperController,
    )
    from colmap_pcd_tpu.models.incremental_mapper import MapperOptions
    from colmap_pcd_tpu.models.reconstruction import Reconstruction

    rec, graph, lmap, gt = make_world(np.random.default_rng(5), n_images=7, n_points=500)
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
    assert rec.num_reg_images == 7
    # drop the last two images from the model, keep them in the database
    for iid in (6, 7):
        rec.deregister_image(iid)
    model_dir = str(tmp_path / "model")
    rec.write(model_dir)

    # dump the world into a database file for _load_mapper_inputs
    dbp = str(tmp_path / "reg.db")
    db = Database(dbp)
    db.add_camera(1, 640, 480, [500.0, 500.0, 320.0, 240.0], camera_id=1)
    for iid in sorted(rec.images):
        img = rec.images[iid]
        db.add_image(img.name, 1, image_id=iid)
        kp = np.zeros((img.xys.shape[0], 4), np.float32)
        kp[:, :2] = img.xys
        db.write_keypoints(iid, kp)
    # replay the graph's pair matches as verified two-view geometries
    for i in sorted(rec.images):
        for j in sorted(rec.images):
            if i >= j:
                continue
            m = graph.matches_between(i, j)
            if m is not None and len(m):
                db.write_two_view_geometry(i, j, m, config=2)
    db.commit()
    db.close()

    out_dir = str(tmp_path / "registered")
    rc = cli.main([
        "image_registrator", "--database_path", dbp, "--input_path", model_dir,
        "--output_path", out_dir, "--Mapper.abs_pose_min_num_inliers", "15",
        "--Mapper.if_add_lidar_constraint", "0",
    ])
    assert rc == 0
    rec2 = Reconstruction.read(out_dir)
    assert rec2.num_reg_images == 7
    for iid in (6, 7):
        assert rec2.images[iid].registered
        # pose close to ground truth
        from colmap_pcd_tpu.ops import np_geom

        c_est = rec2.images[iid].projection_center()
        q, t = gt[iid - 1]
        c_gt = -np_geom.quat_to_rotmat(q).T @ t
        np.testing.assert_allclose(c_est, c_gt, atol=0.05)
