"""Model management tool tests (merge/crop/split/orient/compare)."""

import numpy as np

from colmap_pcd_tpu.models import model_tools
from colmap_pcd_tpu.models.reconstruction import Camera, Image, Reconstruction
from colmap_pcd_tpu.ops import np_geom


def make_model(rng, n=8, seed_centers=None):
    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 640, 480, np.asarray([500.0, 500, 320, 240])))
    centers = seed_centers if seed_centers is not None else rng.normal(size=(n, 3)) * 3
    for i, c in enumerate(centers, 1):
        im = Image(i, f"i{i}.png", 1, tvec=-np.asarray(c), xys=np.zeros((16, 2)))
        rec.add_image(im)
        rec.register_image(i)
    for k in range(10):
        xyz = rng.normal(size=3) * 2 + [0, 0, 5]
        rec.add_point3D(xyz, [(1 + k % n, k), (1 + (k + 1) % n, k)])
    return rec, centers


def test_crop_and_split(rng):
    rec, _ = make_model(rng)
    lo, hi = rec.compute_bounding_box()
    cropped = model_tools.crop_model(rec, lo, (np.asarray(lo) + np.asarray(hi)) / 2)
    assert len(cropped.points3D) < len(rec.points3D)
    parts = model_tools.split_model(rec, 2, axis=2, overlap=0.5)
    assert len(parts) == 2
    total = sum(len(p.points3D) for p in parts)
    assert total >= len(rec.points3D)  # overlap duplicates some


def test_compare_models_identity(rng):
    rec, centers = make_model(rng)
    import copy

    rec2 = copy.deepcopy(rec)
    # transformed copy: compare must align and report ~0 error
    rec2.transform(np_geom.so3_exp_quat([0.1, -0.2, 0.05]), np.asarray([1.0, 2, 3]), 1.7)
    stats = model_tools.compare_models(rec, rec2)
    assert stats["num_common_images"] == 8
    assert stats["median_translation_error"] < 1e-3, stats
    assert stats["median_rotation_error_deg"] < 0.1
    assert abs(stats["scale"] - 1 / 1.7) < 1e-3


def test_orientation_aligner(rng):
    # cameras along a tilted line; after alignment the trajectory should run
    # mostly along z with camera up ~ -y
    R_tilt = np_geom.quat_to_rotmat(np_geom.so3_exp_quat([0.3, 0.2, -0.1]))
    centers = (np.stack([np.zeros(8), np.zeros(8), np.arange(8.0)], -1)) @ R_tilt.T
    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 640, 480, np.asarray([500.0, 500, 320, 240])))
    q = np_geom.rotmat_to_quat(R_tilt.T)  # world->cam undoing the tilt
    for i, c in enumerate(centers, 1):
        t = -np_geom.quat_to_rotmat(q) @ c
        im = Image(i, f"i{i}.png", 1, qvec=q, tvec=t, xys=np.zeros((4, 2)))
        rec.add_image(im)
        rec.register_image(i)
    out = model_tools.align_to_principal_axes(rec)
    cs = np.stack([out.images[i].projection_center() for i in out.registered_ids])
    span = cs[-1] - cs[0]
    span /= np.linalg.norm(span)
    assert abs(span[2]) > 0.95, span  # trajectory along z after alignment


def test_normalize(rng):
    rec, _ = make_model(rng)
    out = model_tools.normalize_model(rec, extent=10.0)
    cs = np.stack([out.images[i].projection_center() for i in out.registered_ids])
    assert np.abs(cs).max() < 15.0
