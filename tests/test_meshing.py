"""Poisson meshing re-design: spectral indicator + marching tetrahedra.

Reference: mvs::PoissonMeshing (src/mvs/meshing.h:106-125, lib/PoissonRecon);
here re-designed as an FFT screened-Poisson solve (ops/meshing.py)."""

import numpy as np
import pytest

from colmap_pcd_tpu.io import ply as ply_io
from colmap_pcd_tpu.ops.meshing import (
    PoissonOptions,
    marching_tetrahedra,
    poisson_mesh,
)


def _sphere_cloud(rng, n=4000, r=1.0):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (r * v).astype(np.float32), v.astype(np.float32)


def test_marching_tetrahedra_sphere_sdf():
    """Analytic SDF of a sphere -> extracted surface lies on the sphere."""
    n = 48
    ax = np.arange(n) - n / 2 + 0.5
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r0 = 15.0
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - r0
    verts, faces = marching_tetrahedra(sdf.astype(np.float32), 0.0)
    assert len(faces) > 500
    c = n / 2 - 0.5
    rad = np.linalg.norm(verts - c, axis=1)
    assert abs(rad.mean() - r0) < 0.2, rad.mean()
    assert rad.std() < 0.2
    # watertight interior: every edge shared by exactly two faces
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99, (counts == 2).mean()


def test_marching_tetrahedra_empty():
    grid = np.ones((8, 8, 8), np.float32)
    verts, faces = marching_tetrahedra(grid, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_poisson_mesh_sphere():
    rng = np.random.default_rng(0)
    pts, nrm = _sphere_cloud(rng)
    verts, faces = poisson_mesh(pts, nrm, PoissonOptions(depth=6, trim=0.0))
    assert len(faces) > 1000
    rad = np.linalg.norm(verts - verts.mean(axis=0), axis=1)
    # surface should hug the unit sphere
    assert abs(np.median(rad) - 1.0) < 0.1, np.median(rad)
    assert np.percentile(np.abs(rad - 1.0), 90) < 0.15


def test_poisson_mesh_trim_removes_unsupported():
    """Trimming drops faces far from any input sample (SurfaceTrimmer)."""
    rng = np.random.default_rng(1)
    pts, nrm = _sphere_cloud(rng)
    # remove one polar cap from the samples
    keep = pts[:, 2] < 0.6
    v_all, f_all = poisson_mesh(pts[keep], nrm[keep], PoissonOptions(depth=6, trim=0.0))
    v_tr, f_tr = poisson_mesh(pts[keep], nrm[keep], PoissonOptions(depth=6, trim=9.0))
    assert len(f_tr) < len(f_all)
    # trimmed mesh should not reach far into the missing cap
    if len(v_tr):
        frac_cap = (v_tr[:, 2] > 0.8).mean()
        assert frac_cap < 0.02, frac_cap


def test_ply_mesh_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3]], np.int32)
    p = str(tmp_path / "mesh.ply")
    ply_io.write_ply_mesh(p, verts, faces)
    v2, f2 = ply_io.read_ply_mesh(p)
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)


def test_delaunay_sparse_mesh(rng):
    """Sparse Delaunay meshing on a synthetic box scene: cameras outside
    looking at points on a sphere surface -> a closed-ish surface between
    inside and outside tetrahedra."""
    from colmap_pcd_tpu.models.reconstruction import (
        Camera, Image, Point3D, Reconstruction,
    )
    from colmap_pcd_tpu.ops.delaunay import (
        DelaunayMeshingOptions, sparse_delaunay_mesh,
    )

    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 640, 480, np.asarray([500.0, 500, 320, 240])))
    # 8 cameras on a ring of radius 5
    centers = []
    for i in range(1, 9):
        a = 2 * np.pi * i / 8
        img = Image(i, f"v{i}.png", 1, xys=np.zeros((0, 2)))
        img.qvec = np.asarray([1.0, 0, 0, 0])
        img.tvec = -np.asarray([5 * np.cos(a), 0.2, 5 * np.sin(a)])
        rec.add_image(img)
        rec.register_image(i)
        centers.append((i, np.asarray([5 * np.cos(a), 0.2, 5 * np.sin(a)])))
    # points on a unit sphere, each seen by the 3 nearest cameras
    npts = 220
    u = rng.normal(size=(npts, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    for k in range(npts):
        p = Point3D(xyz=u[k])
        dists = [(np.linalg.norm(c - u[k]), i) for i, c in centers]
        for _, i in sorted(dists)[:3]:
            p.track.append((i, 0))
        rec.points3D[k + 1] = p
    verts, faces = sparse_delaunay_mesh(rec, DelaunayMeshingOptions())
    assert len(faces) > 100, len(faces)
    # surface triangles sit near the unit sphere
    tri_pts = verts[faces.ravel()]
    r = np.linalg.norm(tri_pts, axis=1)
    assert np.median(np.abs(r - 1.0)) < 0.15, np.median(r)


def test_delaunay_cli(tmp_path, rng):
    from colmap_pcd_tpu import cli
    from colmap_pcd_tpu.models.reconstruction import (
        Camera, Image, Point3D, Reconstruction,
    )

    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, 64, 48, np.asarray([50.0, 50, 32, 24])))
    for i in range(1, 7):
        a = 2 * np.pi * i / 6
        img = Image(i, f"v{i}.png", 1, xys=np.zeros((0, 2)))
        img.qvec = np.asarray([1.0, 0, 0, 0])
        img.tvec = -np.asarray([4 * np.cos(a), 0.0, 4 * np.sin(a)])
        rec.add_image(img)
        rec.register_image(i)
    u = rng.normal(size=(120, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    for k in range(120):
        p = Point3D(xyz=u[k])
        p.track = [(1 + k % 6, 0), (1 + (k + 1) % 6, 0)]
        rec.points3D[k + 1] = p
    sp = tmp_path / "sparse"
    rec.write(str(sp))
    out = tmp_path / "mesh.ply"
    rc = cli.main(["delaunay_mesher", "--input_path", str(sp),
                   "--output_path", str(out), "--input_type", "sparse"])
    assert rc == 0 and out.exists()
