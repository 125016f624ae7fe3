"""Surface meshing from oriented point clouds — TPU-first Poisson re-design.

The reference reconstructs meshes with the vendored octree PoissonRecon
(src/mvs/meshing.h:106-125 PoissonMeshing, lib/PoissonRecon/*) and a
CGAL/graph-cut Delaunay mesher (src/mvs/meshing.cc DelaunayMeshing). Octrees
and irregular graph cuts map poorly onto XLA; this module re-designs the
indicator-function approach for the TPU:

  1. splat oriented normals into a regular vector grid (one scatter-add),
  2. solve the screened Poisson equation  (div V = Laplacian chi)  spectrally
     with 3D FFTs — O(N^3 log N) dense device work instead of an octree
     multigrid; the Gaussian smoothing of PoissonRecon's B-spline basis is a
     spectral multiply in the same pass,
  3. pick the isovalue as the mean indicator value at the input samples
     (PoissonRecon's GetIsoValue), and
  4. extract the isosurface with vectorized marching tetrahedra (6-tet cube
     decomposition — table-free, branch-free, numpy-vectorized) plus a
     density trim mirroring PoissonRecon's SurfaceTrimmer.

Steps 1-2 run under jit on the TPU (FFTs and elementwise spectral ops are
MXU/VPU-friendly and bandwidth-bound, exactly what the chip does well);
extraction is a vectorized host pass over the (small) indicator grid.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PoissonOptions:
    """Mirrors PoissonMeshingOptions (src/mvs/meshing.h:40-60): depth/trim
    have the same meaning; point_weight maps to the screening strength."""

    depth: int = 7  # grid resolution 2^depth per axis
    point_weight: float = 1.0  # screening (interpolation) weight
    trim: float = 7.0  # density-based trimming threshold (0 = keep all)
    smooth_sigma_vox: float = 1.5  # Gaussian smoothing of the splat field
    padding: float = 0.125  # bbox padding fraction (guards FFT periodic wrap)


# ----------------------------------------------------------------- device part
@partial(jax.jit, static_argnames=("n",))
def _indicator_grid(pts01, normals, weights, n: int, sigma_vox, screen):
    """Splat -> smooth -> screened spectral Poisson solve.

    pts01: [P,3] points scaled to [0,1)^3; normals: [P,3] unit inward/outward
    normals; returns (chi [n,n,n] indicator field, density [n,n,n] splat mass).
    """
    x = pts01 * n - 0.5
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0

    vec = jnp.zeros((n, n, n, 3), jnp.float32)
    den = jnp.zeros((n, n, n), jnp.float32)
    # trilinear splat over the 8 corners (scatter-add; XLA fuses the loop)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                ) * weights
                idx = jnp.clip(i0 + jnp.array([dx, dy, dz]), 0, n - 1)
                vec = vec.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(w[:, None] * normals)
                den = den.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(w)

    # spectral pipeline: F(div V) with smoothing, divided by Laplacian symbol
    k = jnp.fft.fftfreq(n).astype(jnp.float32)  # cycles per voxel
    kx, ky, kz = jnp.meshgrid(k, k, k, indexing="ij")
    # Gaussian smoothing in voxel units
    g = jnp.exp(-2.0 * (jnp.pi * sigma_vox) ** 2 * (kx**2 + ky**2 + kz**2))
    # spectral central-difference derivative symbol: i*sin(2 pi k)/h, h=1 voxel
    dsym = lambda kk: 1j * jnp.sin(2 * jnp.pi * kk)
    # discrete 7-point Laplacian symbol: -4 sum sin^2(pi k)
    lap = -4.0 * (
        jnp.sin(jnp.pi * kx) ** 2 + jnp.sin(jnp.pi * ky) ** 2 + jnp.sin(jnp.pi * kz) ** 2
    )
    Vx = jnp.fft.fftn(vec[..., 0])
    Vy = jnp.fft.fftn(vec[..., 1])
    Vz = jnp.fft.fftn(vec[..., 2])
    divF = dsym(kx) * Vx + dsym(ky) * Vy + dsym(kz) * Vz
    denom = lap - screen
    chiF = jnp.where(denom == 0, 0.0, g * divF / denom)
    chi = jnp.real(jnp.fft.ifftn(chiF)).astype(jnp.float32)
    return chi, den


@partial(jax.jit, static_argnames=("n",))
def _sample_trilinear(grid, pts01, n: int):
    x = pts01 * n - 0.5
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
    f = x - i0
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                out = out + w * grid[i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz]
    return out


# ------------------------------------------------------- marching tetrahedra
# 6-tetrahedra decomposition of the unit cube (corners indexed by (x,y,z) bits
# -> corner id x*4+y*2+z). Every tet contains the main diagonal 0-7, so faces
# between adjacent cubes match up and the extracted surface is watertight on
# interior cells.
_TETS = np.array(
    [
        [0, 5, 1, 7],
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
    ],
    np.int32,
)
_CORNER = np.array(
    [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.int32
)
# tet edges (pairs of local tet-vertex ids 0..3)
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)
_EDGE_ID = {(int(a), int(b)): i for i, (a, b) in enumerate(_TET_EDGES)}
_EDGE_ID.update({(b, a): i for (a, b), i in list(_EDGE_ID.items())})


def _build_tet_table() -> np.ndarray:
    """case -> up to 2 triangles of tet-edge ids (-1 padded). Case bit i set
    <=> tet vertex i is inside (value < iso). Generated, not hand-written:
    |S|=1/3 -> one triangle on the 3 crossing edges, |S|=2 -> the crossing
    quad split along a diagonal. Winding is normalized by the gradient check
    in marching_tetrahedra."""
    table = -np.ones((16, 6), np.int32)
    for case in range(1, 15):
        inside = [v for v in range(4) if case >> v & 1]
        outside = [v for v in range(4) if not case >> v & 1]
        if len(inside) == 1:
            (v,) = inside
            table[case, :3] = [_EDGE_ID[(v, o)] for o in outside]
        elif len(inside) == 3:
            (v,) = outside
            table[case, :3] = [_EDGE_ID[(v, o)] for o in inside]
        else:
            a, b = inside
            c, d = outside
            # quad in cyclic order: (a,c) (b,c) (b,d) (a,d)
            q = [_EDGE_ID[(a, c)], _EDGE_ID[(b, c)], _EDGE_ID[(b, d)], _EDGE_ID[(a, d)]]
            table[case] = [q[0], q[1], q[2], q[0], q[2], q[3]]
    return table


_TET_TRIS = _build_tet_table()


def marching_tetrahedra(grid: np.ndarray, iso: float = 0.0):
    """Extract the iso-surface of a [n,n,n] scalar grid as a triangle soup,
    vectorized over all cells x 6 tets. Returns (verts [V,3] in voxel coords,
    faces [F,3] int32) with deduplicated vertices."""
    n = grid.shape[0]
    # candidate cells: sign change within the cell's 8 corners
    c = grid < iso
    occ = np.zeros((n - 1, n - 1, n - 1), bool)
    anyin = np.zeros_like(occ)
    allin = np.ones_like(occ)
    for dx, dy, dz in _CORNER:
        v = c[dx : n - 1 + dx, dy : n - 1 + dy, dz : n - 1 + dz]
        anyin |= v
        allin &= v
    occ = anyin & ~allin
    cidx = np.argwhere(occ)  # [C,3]
    if cidx.size == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    corner_pos = cidx[:, None, :] + _CORNER[None, :, :]  # [C,8,3]
    corner_val = grid[corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]]

    vals = corner_val[:, _TETS]  # [C,6,4]
    pos = corner_pos[:, _TETS, :]  # [C,6,4,3]

    inside = vals < iso
    case = (
        inside[..., 0] * 1 + inside[..., 1] * 2 + inside[..., 2] * 4 + inside[..., 3] * 8
    )  # [C,6]

    # edge interpolation points for all 6 tet edges: [C,6,6,3]
    a = _TET_EDGES[:, 0]
    b = _TET_EDGES[:, 1]
    va = vals[..., a]
    vb = vals[..., b]
    denom = va - vb
    t = np.where(np.abs(denom) < 1e-12, 0.5, (va - iso) / np.where(denom == 0, 1, denom))
    t = np.clip(t, 0.0, 1.0)
    pa = pos[:, :, a, :]
    pb = pos[:, :, b, :]
    epts = pa + t[..., None] * (pb - pa)  # [C,6,6edges,3]

    tris = _TET_TRIS[case]  # [C,6,6]
    valid = tris >= 0
    # first triangle
    out = []
    for k in (0, 1):
        sl = tris[:, :, 3 * k : 3 * k + 3]  # [C,6,3]
        ok = (sl >= 0).all(axis=-1)
        if not ok.any():
            continue
        ci, ti = np.nonzero(ok)
        e = sl[ci, ti]  # [M,3]
        tri = epts[ci[:, None], ti[:, None], e]  # [M,3,3]
        out.append(tri)
    if not out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    soup = np.concatenate(out, axis=0).astype(np.float32)  # [F,3,3]

    # orient consistently: flip triangles whose normal points against the
    # field gradient (outward = increasing chi)
    g = np.stack(np.gradient(grid), axis=-1)
    ctr = soup.mean(axis=1)
    ci = np.clip(ctr.astype(np.int32), 0, n - 1)
    gc = g[ci[:, 0], ci[:, 1], ci[:, 2]]
    nrm = np.cross(soup[:, 1] - soup[:, 0], soup[:, 2] - soup[:, 0])
    flip = (nrm * gc).sum(-1) < 0
    soup[flip] = soup[flip][:, ::-1]

    # dedup vertices (quantize to 1e-4 voxel)
    flat = soup.reshape(-1, 3)
    key = np.round(flat * 1e4).astype(np.int64)
    _, uniq_idx, inv = np.unique(
        key.view([("x", np.int64), ("y", np.int64), ("z", np.int64)]).reshape(-1),
        return_index=True,
        return_inverse=True,
    )
    verts = flat[uniq_idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    )
    return verts, faces[good]


# ---------------------------------------------------------------- entry point
def poisson_mesh(
    points: np.ndarray,
    normals: np.ndarray,
    opts: PoissonOptions = PoissonOptions(),
):
    """Oriented point cloud -> triangle mesh (verts [V,3] world, faces [F,3]).

    Parity: mvs::PoissonMeshing (src/mvs/meshing.cc) — same inputs (fused
    cloud with normals), same knobs (depth/trim), TPU spectral solve instead
    of the vendored octree multigrid.
    """
    points = np.asarray(points, np.float32)
    normals = np.asarray(normals, np.float32)
    assert points.shape == normals.shape and points.shape[1] == 3
    nlen = np.linalg.norm(normals, axis=1)
    keep = nlen > 1e-6
    points, normals, nlen = points[keep], normals[keep], nlen[keep]
    normals = normals / nlen[:, None]
    if points.shape[0] < 16:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    n = 1 << opts.depth
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    span = float((hi - lo).max()) or 1.0
    pad = span * opts.padding
    origin = lo - pad
    scale = span + 2 * pad
    pts01 = (points - origin) / scale

    w = np.ones(points.shape[0], np.float32)
    chi, den = _indicator_grid(
        jnp.asarray(pts01),
        jnp.asarray(normals),
        jnp.asarray(w),
        n,
        jnp.float32(opts.smooth_sigma_vox),
        jnp.float32(opts.point_weight * 1e-3),
    )
    iso = float(jnp.mean(_sample_trilinear(chi, jnp.asarray(pts01), n)))
    chi_np = np.asarray(chi)
    verts_vox, faces = marching_tetrahedra(chi_np, iso)
    if len(verts_vox) == 0:
        return verts_vox, faces

    if opts.trim > 0:
        # SurfaceTrimmer analog: drop faces in low-sample-density space.
        den_np = np.asarray(den)
        # smooth density a little so trim is stable across splat quantization
        thresh = opts.trim * float(den_np[den_np > 0].mean()) * 0.01
        ci = np.clip(verts_vox.astype(np.int32), 0, n - 1)
        vd = den_np[ci[:, 0], ci[:, 1], ci[:, 2]]
        # a face survives if any vertex sits in supported space
        fd = vd[faces].max(axis=1)
        faces = faces[fd >= thresh]
        used = np.unique(faces)
        remap = -np.ones(len(verts_vox), np.int64)
        remap[used] = np.arange(used.size)
        verts_vox = verts_vox[used]
        faces = remap[faces].astype(np.int32)

    verts = verts_vox / n * scale + origin
    return verts.astype(np.float32), faces
