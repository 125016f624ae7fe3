"""LiDAR subsystem tests: PLY IO, frustum culling, depth projection,
NN association, ray-plane bootstrap. The reference has zero tests for its
lidar layer (SURVEY.md §4) — these are the ground-truth checks it never had.
"""

import jax.numpy as jnp
import numpy as np

from colmap_pcd_tpu.io import ply as ply_io
from colmap_pcd_tpu.models import lidar_map as lm
from colmap_pcd_tpu.ops import camera_models as cm
from colmap_pcd_tpu.ops import pointcloud as pc_ops
from colmap_pcd_tpu.ops import se3

PINHOLE = cm.MODEL_IDS["PINHOLE"]


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    col = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "t.ply")
    ply_io.write_ply(p, xyz, nrm, col)
    d = ply_io.read_ply(p)
    np.testing.assert_allclose(d.xyz, xyz, rtol=1e-6)
    np.testing.assert_allclose(d.normals, nrm, rtol=1e-6)
    np.testing.assert_array_equal(d.colors, col)
    # ascii
    p2 = str(tmp_path / "t2.ply")
    ply_io.write_ply(p2, xyz, nrm, binary=False)
    d2 = ply_io.read_ply(p2)
    np.testing.assert_allclose(d2.xyz, xyz, atol=1e-5)


def test_frame_conversion_roundtrip(rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    back = lm.camera_to_lidar_frame(lm.lidar_to_camera_frame(xyz))
    np.testing.assert_allclose(back, xyz, rtol=1e-6)


def _simple_cam():
    """Camera at origin looking down +z, pinhole f=500, 640x480."""
    q = np.array([1.0, 0, 0, 0], np.float32)
    t = np.zeros(3, np.float32)
    params = np.asarray(cm.pad_params([500.0, 500.0, 320.0, 240.0], PINHOLE))
    return q, t, params


def test_frustum_culling():
    q, t, params = _simple_cam()
    planes = pc_ops.frustum_planes(jnp.asarray(q), jnp.asarray(t), 500.0, 500.0, 320.0, 240.0, 640, 480, 40.0)
    pts = jnp.asarray(
        [
            [0.0, 0.0, 10.0],   # straight ahead: in
            [0.0, 0.0, -5.0],   # behind: out
            [0.0, 0.0, 45.0],   # beyond far plane: out
            [50.0, 0.0, 10.0],  # far off to the side: out
            [5.0, 3.0, 10.0],   # inside the pyramid: in
            [7.0, 0.0, 10.0],   # outside horizontal fov (tan = 0.64 max): out
        ],
        jnp.float32,
    )
    mask = np.asarray(pc_ops.points_in_frustum(planes, pts))
    np.testing.assert_array_equal(mask, [True, False, False, False, True, False])


def _wall_map(cell=1.0):
    """A dense wall at z=10 with normals -z, on a 2cm grid, plus ground plane y=2."""
    xs = np.arange(-4, 4, 0.02)
    ys = np.arange(-3, 3, 0.02)
    X, Y = np.meshgrid(xs, ys)
    wall = np.stack([X.ravel(), Y.ravel(), np.full(X.size, 10.0)], -1)
    wall_n = np.tile([0.0, 0.0, -1.0], (wall.shape[0], 1))
    gx = np.arange(-4, 4, 0.05)
    gz = np.arange(1, 15, 0.05)
    GX, GZ = np.meshgrid(gx, gz)
    ground = np.stack([GX.ravel(), np.full(GX.size, 2.0), GZ.ravel()], -1)
    ground_n = np.tile([0.0, -1.0, 0.0], (ground.shape[0], 1))
    pts = np.concatenate([wall, ground]).astype(np.float32)
    nrm = np.concatenate([wall_n, ground_n]).astype(np.float32)
    opts = pc_ops.ProjOptions(submap_cell=cell)
    return lm.LidarMap.from_arrays(pts, nrm, opts)


def test_depth_projection_wall():
    m = _wall_map()
    q, t, params = _simple_cam()
    feat = np.array([[320.0, 240.0], [200.0, 150.0], [600.0, 400.0]], np.float32)
    out = m.project_to_image(feat, q, t, params, PINHOLE, 640, 480)
    assert out["found"].all(), out["found"]
    # center pixel ray hits the wall at (0,0,10)
    np.testing.assert_allclose(out["lidar_pt"][0], [0, 0, 10], atol=0.2)
    np.testing.assert_allclose(out["lidar_nrm"][0], [0, 0, -1], atol=1e-5)
    # ray through (200,150): direction ((200-320)/500, (150-240)/500, 1) -> at wall z=10
    np.testing.assert_allclose(out["lidar_pt"][1], [-2.4, -1.8, 10.0], atol=0.3)


def test_depth_projection_zbuffer_prefers_near():
    """Two walls; features must associate with the nearer one."""
    far = _wall_map()
    near_pts = far.points.copy()
    sel = near_pts[:, 2] == 10.0
    near_wall = near_pts[sel].copy()
    near_wall[:, 2] = 5.0
    # shrink near wall so only the center is double-covered
    keep = (np.abs(near_wall[:, 0]) < 1.0) & (np.abs(near_wall[:, 1]) < 1.0)
    near_wall = near_wall[keep]
    pts = np.concatenate([far.points, near_wall])
    nrm = np.concatenate([far.normals, np.tile([0, 0, -1.0], (near_wall.shape[0], 1))]).astype(np.float32)
    m = lm.LidarMap.from_arrays(pts, nrm, far.opts)
    q, t, params = _simple_cam()
    feat = np.array([[320.0, 240.0], [450.0, 240.0]], np.float32)
    out = m.project_to_image(feat, q, t, params, PINHOLE, 640, 480)
    assert out["found"].all()
    assert abs(out["lidar_pt"][0][2] - 5.0) < 0.2, out["lidar_pt"][0]  # near wall wins
    assert abs(out["lidar_pt"][1][2] - 10.0) < 0.2, out["lidar_pt"][1]  # only far covers


def test_nn_query_exact(rng):
    m = _wall_map()
    queries = np.asarray([[0.1, 0.2, 9.5], [1.0, 2.1, 5.0]], np.float32)
    for backend in ("host", "tpu"):
        pts, nrm, dist = m.nn_query(queries, backend=backend)
        # brute-force oracle
        for i, qp in enumerate(queries):
            d = np.linalg.norm(m.points - qp, axis=1)
            j = np.argmin(d)
            np.testing.assert_allclose(pts[i], m.points[j], atol=1e-6, err_msg=backend)
            np.testing.assert_allclose(dist[i], d[j], atol=1e-4, err_msg=backend)


def test_ray_plane_bootstrap_nonidentity_pose(rng):
    """Ray-plane intersection must be correct for a non-identity seed pose
    (the reference's camera-frame solve is wrong here; ours is world-frame)."""
    m = _wall_map()
    # camera offset and slightly rotated, looking at the wall
    w = np.array([0.05, -0.1, 0.02], np.float32)
    q = np.asarray(se3.so3_exp_quat(jnp.asarray(w)))
    t = np.array([0.5, -0.3, 1.0], np.float32)
    params = np.asarray(cm.pad_params([500.0, 500.0, 320.0, 240.0], PINHOLE))
    feat = np.asarray(rng.uniform([200, 150], [440, 330], (32, 2)), np.float32)
    out = m.project_to_image(feat, q, t, params, PINHOLE, 640, 480)
    planes = np.asarray(
        pc_ops.plane_through(jnp.asarray(out["lidar_pt"]), jnp.asarray(out["lidar_nrm"]))
    )
    X, ok = pc_ops.ray_plane_points(
        jnp.asarray(feat), jnp.asarray(planes), jnp.asarray(out["found"]),
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(params), PINHOLE,
    )
    X, ok = np.asarray(X), np.asarray(ok)
    assert ok.sum() >= 25, ok.sum()
    # every intersected point lies on its associated plane (wall or ground)
    plane_res = np.abs(np.sum(X * planes[:, :3], axis=1) + planes[:, 3])
    np.testing.assert_allclose(plane_res[ok], 0.0, atol=1e-4)
    # wall-associated points must come out at z=10 exactly
    wall = ok & (out["lidar_nrm"][:, 2] < -0.9)
    assert wall.sum() > 5
    np.testing.assert_allclose(X[wall][:, 2], 10.0, atol=0.05)
    xy, z = cm.project(PINHOLE, jnp.asarray(params), jnp.asarray(q), jnp.asarray(t), jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(xy)[ok], feat[ok], atol=0.5)


def test_classify_ground():
    nrm = jnp.asarray([[0, 1, 0], [0.0, -0.99, 0.01], [1, 0, 0], [0.5, 0.5, 0.5]], jnp.float32)
    g = np.asarray(pc_ops.classify_ground(nrm))
    np.testing.assert_array_equal(g, [True, True, False, False])


def test_voxel_downsample():
    m = _wall_map()
    pts, nrm = m.voxel_downsample(0.5)
    assert pts.shape[0] < m.num_points // 10
    assert np.isfinite(pts).all()
