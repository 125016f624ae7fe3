"""Least-absolute-deviations solver + coordinate-frame estimation."""

import numpy as np

from colmap_pcd_tpu.models import coordinate_frame as cf
from colmap_pcd_tpu.ops import np_geom
from colmap_pcd_tpu.ops.lad import LADOptions, solve_least_absolute_deviations


def test_lad_robust_to_outliers(rng):
    # line fit y = 2x + 1 with 30% gross outliers: L1 recovers the params
    n = 200
    x = rng.uniform(-5, 5, n)
    y = 2.0 * x + 1.0
    out = rng.random(n) < 0.3
    y = np.where(out, y + rng.uniform(20, 50, n), y)
    A = np.stack([x, np.ones(n)], 1)
    sol = np.asarray(solve_least_absolute_deviations(A, y, opts=LADOptions(max_num_iterations=500)))
    assert abs(sol[0] - 2.0) < 0.05, sol
    assert abs(sol[1] - 1.0) < 0.15, sol
    # least squares for contrast is badly biased on this data
    ls = np.linalg.lstsq(A, y, rcond=None)[0]
    assert abs(ls[1] - 1.0) > 1.0


def test_consensus_axis(rng):
    true_axis = np.asarray([0.0, 1.0, 0.0])
    axes = [true_axis + rng.normal(0, 0.01, 3) for _ in range(20)]
    axes += [rng.normal(0, 1, 3) for _ in range(5)]  # outliers
    est = cf.find_best_consensus_axis(np.asarray(axes), 0.05)
    assert abs(abs(est @ true_axis) - 1.0) < 1e-3


def test_gravity_from_image_orientation(rng):
    from colmap_pcd_tpu.models.reconstruction import Camera, Image, Reconstruction

    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 640, 480, np.asarray([500.0, 500, 320, 240])))
    # cameras looking forward with small roll wiggle: downward axis ~ +y
    for i in range(1, 11):
        yaw = 0.2 * np.sin(i)
        q = np.asarray([np.cos(yaw / 2), 0, np.sin(yaw / 2), 0.0])
        img = Image(i, f"i{i}.png", 1, xys=np.zeros((0, 2)))
        img.qvec = q
        img.tvec = np.asarray([0.0, 0, i])
        rec.add_image(img)
        rec.register_image(i)
    g = cf.estimate_gravity_vector_from_image_orientation(rec)
    assert abs(abs(g[1]) - 1.0) < 1e-6


def test_detect_line_segments_synthetic():
    img = np.zeros((120, 160), np.float32)
    img[40, 20:140] = 1.0   # horizontal line
    img[10:110, 80] = 1.0   # vertical line
    segs, n = cf.detect_line_segments(img, min_length=20)
    assert n >= 2
    orient = cf.classify_line_orientations(segs)
    assert (orient == 1).any() and (orient == -1).any()
    # the horizontal segment spans the drawn extent
    h = segs[orient == 1][0]
    assert abs(h[1] - 40) < 3 and abs(h[3] - 40) < 3
    assert abs(min(h[0], h[2]) - 20) < 6 and abs(max(h[0], h[2]) - 140) < 6


def test_vanishing_point_from_converging_lines(rng):
    # lines through a common point (300, 200)
    vp = np.asarray([300.0, 200.0])
    segs = []
    for k in range(12):
        d = np.asarray([np.cos(0.1 + k * 0.15), np.sin(0.1 + k * 0.15)])
        a = vp + 50 * d
        b = vp + 150 * d
        segs.append([a[0], a[1], b[0], b[1]])
    est, n_inl = cf.estimate_vanishing_point(np.asarray(segs), max_error=0.5)
    assert est is not None and n_inl >= 10
    est_xy = est[:2] / est[2]
    assert np.linalg.norm(est_xy - vp) < 2.0, est_xy


def test_rotation_from_unit_vectors():
    a = np.asarray([0.0, 0.7071, 0.7071])
    b = np.asarray([0.0, 1.0, 0.0])
    R = cf.rotation_from_unit_vectors(a, b)
    assert np.allclose(R @ (a / np.linalg.norm(a)), b, atol=1e-6)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_align_to_principal_plane(rng):
    from colmap_pcd_tpu.models.reconstruction import Camera, Image, Point3D, Reconstruction

    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 640, 480, np.asarray([500.0, 500, 320, 240])))
    img = Image(1, "a.png", 1, xys=np.zeros((0, 2)))
    rec.add_image(img)
    rec.register_image(1)
    # points spread mostly along a tilted plane
    R = np_geom.quat_to_rotmat(np_geom.quat_normalize(np.asarray([0.9, 0.2, 0.3, 0.1])))
    for k in range(50):
        p = R.T @ np.asarray([rng.uniform(-10, 10), rng.uniform(-5, 5), rng.normal(0, 0.01)])
        rec.points3D[k + 1] = Point3D(xyz=p)
    cf.align_to_principal_plane(rec)
    pts = np.stack([p.xyz for p in rec.points3D.values()])
    assert np.abs(pts.mean(0)).max() < 1e-6  # centered
    assert pts[:, 2].std() < 0.1  # flat in z after alignment
