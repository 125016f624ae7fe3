"""Dense stereo tests: plane-sweep depth recovery on analytically rendered
scenes with exact ground truth, plus the full dense pipeline + fusion."""

import jax.numpy as jnp
import numpy as np

from colmap_pcd_tpu.models.mvs import DenseOptions, run_patch_match_stereo, run_stereo_fusion
from colmap_pcd_tpu.models.reconstruction import Camera, Image, Reconstruction
from colmap_pcd_tpu.ops import se3, stereo

H, W = 120, 160
F = 140.0
K = np.asarray([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)


def texture(x, y):
    """Smooth but feature-rich analytic texture."""
    return (
        0.5
        + 0.25 * np.sin(2.1 * x) * np.cos(1.7 * y)
        + 0.15 * np.sin(5.3 * x + 1.0) * np.sin(4.7 * y + 0.5)
        + 0.1 * np.cos(9.1 * x * y / 5.0)
    ).astype(np.float32)


def render_plane(center, z0=10.0):
    """Camera at `center`, identity rotation, fronto-parallel plane z=z0."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    dx = (xx - W / 2) / F
    dy = (yy - H / 2) / F
    depth = z0 - center[2]
    wx = center[0] + dx * depth
    wy = center[1] + dy * depth
    return texture(wx, wy)


def test_plane_sweep_recovers_depth():
    z0 = 10.0
    centers = [np.zeros(3), np.asarray([0.3, 0.0, 0.0]), np.asarray([0.0, 0.25, 0.0])]
    imgs = [render_plane(c, z0) for c in centers]
    R_rel = np.stack([np.eye(3, dtype=np.float32)] * 2)
    # x_src = x_ref - c_src (identity rotations, t = -c)
    t_rel = np.stack([-centers[1], -centers[2]]).astype(np.float32)
    depths = 1.0 / np.linspace(1 / 14.0, 1 / 7.0, 48)
    depth, cost, normal = stereo.plane_sweep(
        jnp.asarray(imgs[0]),
        jnp.asarray(np.stack(imgs[1:])),
        jnp.asarray(K), jnp.asarray(np.stack([K, K])),
        jnp.asarray(R_rel), jnp.asarray(t_rel),
        jnp.asarray(depths.astype(np.float32)),
        stereo.StereoOptions(window_radius=3),
    )
    depth = np.asarray(depth)
    cost = np.asarray(cost)
    # interior pixels with good photometric support must be near z0
    inner = np.zeros((H, W), bool)
    inner[10:-10, 10:-10] = True
    good = inner & (cost < 0.3)
    assert good.mean() > 0.5, good.mean()
    med = np.median(depth[good])
    assert abs(med - z0) < 0.25, med
    frac = (np.abs(depth[good] - z0) < 0.4).mean()
    assert frac > 0.9, frac
    # normals: fronto-parallel plane -> n ~ (0,0,-1)
    n = np.asarray(normal)[good]
    assert np.median(n[:, 2]) < -0.95


def test_plane_sweep_two_depths():
    """Left half at z=8, right half at z=12 — sweep must separate them."""
    z_l, z_r = 8.0, 12.0
    centers = [np.zeros(3), np.asarray([0.4, 0.0, 0.0]), np.asarray([0.2, 0.3, 0.0])]

    def render(c):
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        dx = (xx - W / 2) / F
        dy = (yy - H / 2) / F
        out = np.zeros((H, W), np.float32)
        for z0, mask_fn in ((z_l, lambda wx: wx < 0), (z_r, lambda wx: wx >= 0)):
            depth = z0 - c[2]
            wx = c[0] + dx * depth
            wy = c[1] + dy * depth
            m = mask_fn(wx)
            out[m] = texture(wx, wy)[m]
        return out

    imgs = [render(c) for c in centers]
    R_rel = np.stack([np.eye(3, dtype=np.float32)] * 2)
    t_rel = np.stack([-centers[1], -centers[2]]).astype(np.float32)
    depths = 1.0 / np.linspace(1 / 15.0, 1 / 6.0, 64)
    depth, cost, _ = stereo.plane_sweep(
        jnp.asarray(imgs[0]), jnp.asarray(np.stack(imgs[1:])),
        jnp.asarray(K), jnp.asarray(np.stack([K, K])),
        jnp.asarray(R_rel), jnp.asarray(t_rel),
        jnp.asarray(depths.astype(np.float32)),
    )
    depth = np.asarray(depth)
    cost = np.asarray(cost)
    good = cost < 0.3
    left = depth[20:-20, 15 : W // 2 - 15]
    right = depth[20:-20, W // 2 + 15 : -15]
    gl = good[20:-20, 15 : W // 2 - 15]
    gr = good[20:-20, W // 2 + 15 : -15]
    assert abs(np.median(left[gl]) - z_l) < 0.4, np.median(left[gl])
    assert abs(np.median(right[gr]) - z_r) < 0.4, np.median(right[gr])


def test_dense_pipeline_and_fusion(tmp_path):
    """Full dense workspace: stereo for all views + consistency fusion; fused
    points must lie on the plane z=10."""
    z0 = 10.0
    centers = [
        np.asarray([0.0, 0.0, 0.0]),
        np.asarray([0.35, 0.0, 0.0]),
        np.asarray([0.0, 0.3, 0.0]),
        np.asarray([0.3, 0.3, 0.0]),
    ]
    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, W, H, np.asarray([F, F, W / 2, H / 2])))
    images = {}
    for i, c in enumerate(centers, 1):
        img = Image(i, f"v{i}.png", 1, qvec=np.asarray([1.0, 0, 0, 0]), tvec=-c)
        img.xys = np.zeros((8, 2))
        rec.add_image(img)
        rec.register_image(i)
        images[i] = render_plane(c, z0)
    # sparse points for source selection + depth range: a few on the plane
    for k in range(6):
        x = np.asarray([(k % 3 - 1) * 2.0, (k // 3 - 0.5) * 1.5, z0])
        rec.add_point3D(x, [(1, k), (2, k), (3, k), (4, k)])
    ws = str(tmp_path / "dense")
    import os

    os.makedirs(ws, exist_ok=True)
    n = run_patch_match_stereo(
        ws, DenseOptions(max_image_size=max(H, W), num_depths=48, num_src_images=3),
        rec=rec, images=images,
    )
    assert n == 4
    pts, nrm, col = run_stereo_fusion(
        ws, options=DenseOptions(min_consistent=2), rec=rec, images=images
    )
    assert len(pts) > 3000, len(pts)
    z_err = np.abs(pts[:, 2] - z0)
    assert np.median(z_err) < 0.2, np.median(z_err)
    assert (z_err < 0.5).mean() > 0.8
    import os

    assert os.path.exists(os.path.join(ws, "fused.ply"))


def test_geom_consistency_pass():
    """The geometric-consistency rerun (patch_match.h:101-111) keeps the
    correct depth where photometric + geometric agree, and its cost map stays
    photometric-comparable (within [0,2]) for downstream min_ncc gating."""
    z0 = 10.0
    centers = [np.zeros(3), np.asarray([0.3, 0.0, 0.0]), np.asarray([0.0, 0.25, 0.0])]
    imgs = [render_plane(c, z0) for c in centers]
    R_rel = np.stack([np.eye(3, dtype=np.float32)] * 2)
    t_rel = np.stack([-centers[1], -centers[2]]).astype(np.float32)
    depths = (1.0 / np.linspace(1 / 14.0, 1 / 7.0, 48)).astype(np.float32)
    opts = stereo.StereoOptions(window_radius=3)
    args = (
        jnp.asarray(np.stack(imgs[1:])),
        jnp.asarray(K), jnp.asarray(np.stack([K, K])),
        jnp.asarray(R_rel), jnp.asarray(t_rel),
        jnp.asarray(depths),
    )
    d1, c1, _ = stereo.plane_sweep(jnp.asarray(imgs[0]), *args, opts)
    # sources see the same fronto-parallel plane: their own depth is z0 - cz
    src_d = jnp.stack([
        jnp.full((H, W), z0 - centers[1][2], jnp.float32),
        jnp.full((H, W), z0 - centers[2][2], jnp.float32),
    ])
    d2, c2, _ = stereo.plane_sweep(
        jnp.asarray(imgs[0]), *args, opts, src_depths=src_d, use_geom=True
    )
    d2, c2 = np.asarray(d2), np.asarray(c2)
    inner = np.zeros((H, W), bool)
    inner[10:-10, 10:-10] = True
    good = inner & (c2 < 0.3)
    assert good.mean() > 0.5
    assert abs(np.median(d2[good]) - z0) < 0.2
    assert c2.min() >= 0.0 and c2.max() <= 2.0 + 1e-5


def test_bilateral_vs_box_ncc():
    """Bilateral weighting must not break depth recovery; with sigma_color<=0
    the box path is used and both agree on a smooth plane."""
    z0 = 10.0
    centers = [np.zeros(3), np.asarray([0.3, 0.0, 0.0])]
    imgs = [render_plane(c, z0) for c in centers]
    R_rel = np.stack([np.eye(3, dtype=np.float32)])
    t_rel = np.stack([-centers[1]]).astype(np.float32)
    depths = (1.0 / np.linspace(1 / 14.0, 1 / 7.0, 48)).astype(np.float32)
    args = (
        jnp.asarray(imgs[0]),
        jnp.asarray(np.stack(imgs[1:])),
        jnp.asarray(K), jnp.asarray(np.stack([K])),
        jnp.asarray(R_rel), jnp.asarray(t_rel),
        jnp.asarray(depths),
    )
    d_bil, c_bil, _ = stereo.plane_sweep(*args, stereo.StereoOptions(sigma_color=0.2))
    d_box, c_box, _ = stereo.plane_sweep(*args, stereo.StereoOptions(sigma_color=0.0))
    inner = np.zeros((H, W), bool)
    inner[10:-10, 10:-10] = True
    for d, c in ((np.asarray(d_bil), np.asarray(c_bil)), (np.asarray(d_box), np.asarray(c_box))):
        good = inner & (c < 0.3)
        assert good.mean() > 0.5
        assert abs(np.median(d[good]) - z0) < 0.2


def test_dense_sharded_matches_sequential(tmp_path):
    """Multi-chip MVS fan-out (parallel/dist_mvs): the mesh-sharded stereo
    pass must produce the same depth maps as the sequential driver."""
    from conftest import cpu_mesh

    z0 = 10.0
    centers = [
        np.asarray([0.0, 0.0, 0.0]),
        np.asarray([0.35, 0.0, 0.0]),
        np.asarray([0.0, 0.3, 0.0]),
        np.asarray([0.3, 0.3, 0.0]),
    ]
    rec = Reconstruction()
    rec.add_camera(Camera(1, 1, W, H, np.asarray([F, F, W / 2, H / 2])))
    images = {}
    for i, c in enumerate(centers, 1):
        img = Image(i, f"v{i}.png", 1, qvec=np.asarray([1.0, 0, 0, 0]), tvec=-c)
        img.xys = np.zeros((8, 2))
        rec.add_image(img)
        rec.register_image(i)
        images[i] = render_plane(c, z0)
    for k in range(6):
        x = np.asarray([(k % 3 - 1) * 2.0, (k // 3 - 0.5) * 1.5, z0])
        rec.add_point3D(x, [(1, k), (2, k), (3, k), (4, k)])
    import os

    opts = DenseOptions(max_image_size=max(H, W), num_depths=32, num_src_images=3)
    ws_seq = str(tmp_path / "seq")
    ws_sh = str(tmp_path / "sh")
    os.makedirs(ws_seq, exist_ok=True)
    os.makedirs(ws_sh, exist_ok=True)
    n1 = run_patch_match_stereo(ws_seq, opts, rec=rec, images=images)
    n2 = run_patch_match_stereo(
        ws_sh, opts, rec=rec, images=images, mesh=cpu_mesh((4,), ("work",))
    )
    assert n1 == n2 == 4
    for i in range(1, 5):
        d_seq = np.load(os.path.join(ws_seq, "stereo", "depth_maps", f"v{i}.png.npy"))
        d_sh = np.load(os.path.join(ws_sh, "stereo", "depth_maps", f"v{i}.png.npy"))
        agree = np.abs(d_seq - d_sh) < 1e-3
        assert agree.mean() > 0.99, agree.mean()
