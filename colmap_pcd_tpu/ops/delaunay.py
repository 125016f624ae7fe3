"""Delaunay surface meshing via visibility graph cut.

Re-designs mvs/meshing.{h,cc} SparseDelaunayMeshing / DenseDelaunayMeshing
(the Labatut/Pons/Keriven 2009 approach the reference implements with CGAL +
its vendored graph-cut): tetrahedralize the points, vote cells inside/outside
from the visibility rays (camera center -> point crosses free space; just
behind the point is matter), regularize across adjacent cells, and solve the
binary labeling as one s-t min-cut. The surface is the set of triangles
between outside and inside tetrahedra.

The combinatorial parts (Delaunay, max-flow) are host-side by nature — the
reference runs them on CPU too (CGAL is not CUDA) — but all the geometric
voting (ray sampling, cell lookup, weights) is vectorized numpy over every
(point, view) ray at once instead of the reference's per-ray loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class DelaunayMeshingOptions:
    """mvs/meshing.h:70-100 (the fields that survive the re-design)."""

    max_proj_dist: float = 20.0
    visibility_sigma: float = 3.0
    distance_sigma_factor: float = 1.0
    quality_regularization: float = 1.0
    max_side_length_factor: float = 25.0
    max_side_length_percentile: float = 95.0
    ray_samples: int = 24  # samples per visibility ray for cell crossing


def _min_cut_labels(n_cells: int, s_cap, t_cap, edges, edge_cap) -> np.ndarray:
    """Binary labels (True = source/outside side) for the s-t min cut.

    Graph: source=0, sink=1, cells at 2+i. Capacities are float votes scaled
    to integers (scipy maximum_flow requirement)."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import breadth_first_order, maximum_flow

    S, T = 0, 1
    scale = 1000.0
    rows, cols, caps = [], [], []

    def add(u, v, c):
        c = int(round(c * scale))
        if c > 0:
            rows.append(u)
            cols.append(v)
            caps.append(c)

    for i in range(n_cells):
        if s_cap[i] > 0:
            add(S, 2 + i, s_cap[i])
        if t_cap[i] > 0:
            add(2 + i, T, t_cap[i])
    for (u, v), c in zip(edges, edge_cap):
        add(2 + u, 2 + v, c)
        add(2 + v, 2 + u, c)
    n = n_cells + 2
    g = csr_matrix((caps, (rows, cols)), shape=(n, n), dtype=np.int32)
    # duplicate (row,col) entries are summed by csr_matrix — that's correct
    res = maximum_flow(g, S, T)
    residual = g - res.flow  # positive residual capacity
    residual.data = np.maximum(residual.data, 0)
    residual.eliminate_zeros()
    order = breadth_first_order(residual, S, directed=True, return_predecessors=False)
    labels = np.zeros(n_cells, bool)
    reach = order[order >= 2] - 2
    labels[reach] = True  # reachable from source = outside
    return labels


def delaunay_mesh(
    points: np.ndarray,  # [N,3]
    ray_pt: np.ndarray,  # [R] point index per visibility ray
    ray_cam: np.ndarray,  # [R,3] camera center per ray
    opts: DelaunayMeshingOptions = DelaunayMeshingOptions(),
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (vertices [N,3], faces [F,3]) of the extracted surface."""
    from scipy.spatial import Delaunay

    points = np.asarray(points, np.float64)
    N = points.shape[0]
    if N < 5:
        return points, np.zeros((0, 3), np.int64)
    tet = Delaunay(points)
    simp = tet.simplices  # [M,4]
    M = simp.shape[0]

    # --- visibility votes, all rays at once -------------------------------
    P = points[ray_pt]  # [R,3]
    C = np.asarray(ray_cam, np.float64)  # [R,3]
    d = P - C
    seg_len = np.linalg.norm(d, axis=1, keepdims=True)
    dn = d / np.maximum(seg_len, 1e-12)
    K = opts.ray_samples
    ts = np.linspace(0.02, 0.98, K)  # fractions along camera->point
    samples = C[:, None, :] + d[:, None, :] * ts[None, :, None]  # [R,K,3]
    crossed = tet.find_simplex(samples.reshape(-1, 3)).reshape(-1, K)  # [R,K]
    behind = tet.find_simplex(P + dn * np.maximum(0.02 * seg_len, 1e-3))  # [R]

    # per-ray weight: points seen by many images matter more
    # (visibility_sigma semantics, meshing.h:81-83)
    n_views = np.bincount(ray_pt, minlength=N).astype(np.float64)
    w_ray = 1.0 - np.exp(-n_views[ray_pt] ** 2 / (2 * opts.visibility_sigma**2))
    w_ray = 0.2 + 0.8 * w_ray

    # source (outside) votes: every cell crossed by free space. Each ray
    # distributes its full weight over its inside-hull samples (cameras sit
    # far outside the points' convex hull, so most of the segment has no
    # cell at all — normalizing by K would starve the free-space term)
    s_cap = np.zeros(M)
    inside = crossed >= 0
    n_inside = np.maximum(inside.sum(1), 1)
    wrep = np.repeat(w_ray / n_inside, K)
    flat = crossed.ravel()
    ok = flat >= 0
    np.add.at(s_cap, flat[ok], wrep[ok])
    # sink (inside) votes: the cell just behind each point
    t_cap = np.zeros(M)
    okb = behind >= 0
    np.add.at(t_cap, behind[okb], w_ray[okb])

    # cells on the convex hull boundary lean outside (the infinite cell is
    # the source in Labatut's formulation)
    hull_cells = np.nonzero((tet.neighbors == -1).any(axis=1))[0]
    s_cap[hull_cells] += 0.5

    # --- smoothness over adjacent cells ------------------------------------
    nb = tet.neighbors  # [M,4]
    ii, jj = np.nonzero(nb >= 0)
    u, v = ii, nb[ii, jj]
    keep = u < v  # one edge per adjacent pair
    pairs = np.stack([u[keep], v[keep]], 1)
    # smoothness scaled to the vote magnitude so quality_regularization=1.0
    # behaves like the reference default across scene sizes
    lam = opts.quality_regularization * 0.2 * float(w_ray.mean())
    edge_cap = np.full(pairs.shape[0], lam)

    labels_outside = _min_cut_labels(M, s_cap, t_cap, pairs, edge_cap)

    # --- surface = facets between outside and inside cells -----------------
    faces = []
    verts_of_facet = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]
    for u, v in pairs:
        if labels_outside[u] == labels_outside[v]:
            continue
        # shared facet = the 3 vertices common to both tetrahedra
        shared = np.intersect1d(simp[u], simp[v], assume_unique=False)
        if shared.size == 3:
            faces.append(shared)
    # hull facets between an outside cell and the infinite cell are NOT part
    # of the object surface (the infinite cell is outside too)
    if not faces:
        return points, np.zeros((0, 3), np.int64)
    faces = np.stack(faces).astype(np.int64)

    # --- outlier face filtering (meshing.h:92-97) ---------------------------
    e = np.stack(
        [
            np.linalg.norm(points[faces[:, 0]] - points[faces[:, 1]], axis=1),
            np.linalg.norm(points[faces[:, 1]] - points[faces[:, 2]], axis=1),
            np.linalg.norm(points[faces[:, 2]] - points[faces[:, 0]], axis=1),
        ],
        1,
    )
    longest = e.max(1)
    thr = opts.max_side_length_factor * np.percentile(
        e, opts.max_side_length_percentile
    )
    faces = faces[longest <= thr]
    return points, faces


def sparse_delaunay_mesh(rec, opts: DelaunayMeshingOptions = DelaunayMeshingOptions()):
    """SparseDelaunayMeshing (meshing.h:122): rays from every observation."""
    pids = sorted(rec.points3D.keys())
    pid_slot = {p: i for i, p in enumerate(pids)}
    points = np.stack([rec.points3D[p].xyz for p in pids])
    centers = {i: rec.images[i].projection_center() for i in rec.registered_ids}
    ray_pt, ray_cam = [], []
    for p in pids:
        for iid, _ in rec.points3D[p].track:
            c = centers.get(iid)
            if c is not None:
                ray_pt.append(pid_slot[p])
                ray_cam.append(c)
    return delaunay_mesh(
        points, np.asarray(ray_pt, np.int64), np.stack(ray_cam), opts
    )


def dense_delaunay_mesh(
    points: np.ndarray,
    rec,
    opts: DelaunayMeshingOptions = DelaunayMeshingOptions(),
    max_points: int = 200000,
    views_per_point: int = 2,
):
    """DenseDelaunayMeshing (meshing.h:125): fused cloud + visibility from
    the nearest registered cameras that see each point from the front."""
    points = np.asarray(points, np.float64)
    if points.shape[0] > max_points:
        sel = np.linspace(0, points.shape[0] - 1, max_points).astype(np.int64)
        points = points[sel]
    C = np.stack([rec.images[i].projection_center() for i in rec.registered_ids])
    d2 = ((points[:, None, :] - C[None, :, :]) ** 2).sum(-1)  # [N, V]
    order = np.argsort(d2, axis=1)[:, :views_per_point]
    N = points.shape[0]
    ray_pt = np.repeat(np.arange(N), views_per_point)
    ray_cam = C[order.ravel()]
    return delaunay_mesh(points, ray_pt, ray_cam, opts)
