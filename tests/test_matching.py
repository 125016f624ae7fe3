import jax
import jax.numpy as jnp
import numpy as np

from colmap_pcd_tpu.models import two_view
from colmap_pcd_tpu.ops import camera_models as cm
from colmap_pcd_tpu.ops import matching, se3


def make_descriptors(rng, n, d=128):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_match_descriptors_identity(rng):
    d1 = make_descriptors(rng, 100)
    # d2 = permuted d1 with small noise
    perm = rng.permutation(100)
    d2 = d1[perm] + rng.normal(0, 0.05, (100, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    idx, ok, _ = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(100), jnp.ones(100)
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.sum() > 90
    # matched indices must invert the permutation
    assert (perm[idx[ok]] == np.nonzero(ok)[0]).mean() > 0.99


def test_match_ratio_rejects_ambiguous(rng):
    # two near-identical candidates both at noise distance -> ratio ~1, reject
    d1 = make_descriptors(rng, 4)
    noise = rng.normal(0, 0.05, (2, 128)).astype(np.float32)
    d2 = np.concatenate([d1[0:1] + noise[0:1], d1[0:1] + noise[1:2], make_descriptors(rng, 2)])
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    idx, ok, _ = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(4), jnp.ones(4)
    )
    assert not bool(np.asarray(ok)[0])


def test_match_validity_mask(rng):
    d1 = make_descriptors(rng, 10)
    d2 = d1.copy()
    v2 = np.ones(10, np.float32)
    v2[3] = 0.0  # knock out the true match of row 3
    idx, ok, _ = matching.match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.ones(10), jnp.asarray(v2)
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert not ok[3] or idx[3] != 3


def _stereo_scene(rng, n=128, noise=0.0):
    q2 = se3.so3_exp_quat(jnp.asarray(rng.normal(size=3) * 0.05, jnp.float32))
    t2 = jnp.asarray([1.0, 0.1, 0.0], jnp.float32)
    X = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32) + np.array([0, 0, 10]))
    params = cm.pad_params([800.0, 800.0, 320.0, 240.0], 1)
    q1 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t1 = jnp.zeros(3, jnp.float32)
    uv1, _ = cm.project(1, params, q1, t1, X)
    uv2, _ = cm.project(1, params, q2, t2, X)
    uv1 = np.asarray(uv1) + rng.normal(0, noise, (n, 2))
    uv2 = np.asarray(uv2) + rng.normal(0, noise, (n, 2))
    return q2, t2, np.asarray(params), uv1.astype(np.float32), uv2.astype(np.float32)


def test_two_view_calibrated(rng):
    q2, t2, params, uv1, uv2 = _stereo_scene(rng, noise=0.3)
    g = two_view.estimate_two_view_geometry(uv1, uv2, params, params, 1, 1)
    assert g.config == two_view.CALIBRATED
    assert len(g.inlier_matches) > 100
    assert float(se3.angle_between(jnp.asarray(g.qvec), q2)) < 0.02
    tdir = np.asarray(t2) / np.linalg.norm(t2)
    assert abs(float(np.dot(g.tvec, tdir))) > 0.99
    assert g.tri_angle > np.deg2rad(3)


def test_two_view_planar(rng):
    # all points on one plane -> H explains everything
    q2 = se3.so3_exp_quat(jnp.asarray(rng.normal(size=3) * 0.03, jnp.float32))
    t2 = jnp.asarray([0.5, 0.0, 0.0], jnp.float32)
    Xp = rng.uniform(-3, 3, (128, 2)).astype(np.float32)
    X = jnp.asarray(np.concatenate([Xp, np.full((128, 1), 10.0, np.float32)], -1))
    params = cm.pad_params([800.0, 800.0, 320.0, 240.0], 1)
    uv1, _ = cm.project(1, params, jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3), X)
    uv2, _ = cm.project(1, params, q2, t2, X)
    g = two_view.estimate_two_view_geometry(
        np.asarray(uv1), np.asarray(uv2), np.asarray(params), np.asarray(params), 1, 1
    )
    assert g.config == two_view.PLANAR_OR_PANORAMIC


def test_two_view_degenerate(rng):
    uv1 = rng.uniform(0, 600, (30, 2)).astype(np.float32)
    uv2 = rng.uniform(0, 600, (30, 2)).astype(np.float32)  # random garbage
    params = np.asarray(cm.pad_params([800.0, 800.0, 320.0, 240.0], 1))
    g = two_view.estimate_two_view_geometry(uv1, uv2, params, params, 1, 1)
    assert g.config in (two_view.DEGENERATE, two_view.PLANAR_OR_PANORAMIC)


def test_guided_matching(rng):
    q2, t2, params, uv1, uv2 = _stereo_scene(rng, n=64)
    # descriptors: weakly discriminative so plain matching struggles
    base = make_descriptors(rng, 64)
    d1 = base + rng.normal(0, 0.02, base.shape).astype(np.float32)
    d2 = base + rng.normal(0, 0.02, base.shape).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    # true F from E
    R = se3.quat_to_rotmat(q2)
    tx = np.cross(np.eye(3), np.asarray(t2))
    E = tx @ np.asarray(R)
    K = np.array([[800.0, 0, 320], [0, 800, 240], [0, 0, 1]])
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    idx, ok = matching.match_guided(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(64), jnp.ones(64), jnp.asarray(F, jnp.float32),
        matching.MatchingOptions(guided_max_error=3.0),
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    correct = (idx[ok] == np.nonzero(ok)[0]).mean() if ok.sum() else 0.0
    assert ok.sum() >= 40 and correct > 0.95, (ok.sum(), correct)


def test_prosac_ordered_sampling():
    """Quality-ordered sampling (progressive_sampler.cc semantics): early
    hypotheses draw only from the top-quality rows; late hypotheses can use
    everything; invalid rows are never drawn."""
    import jax

    from colmap_pcd_tpu.ops.ransac import _draw_samples

    N = 64
    valid = np.ones(N, np.float32)
    valid[50:] = 0.0
    quality = np.arange(N, dtype=np.float32)  # row 49 = best valid
    idx = np.asarray(
        _draw_samples(jax.random.PRNGKey(0), jnp.asarray(valid), 256, 8,
                      jnp.asarray(quality))
    )
    assert (idx < 50).all()  # invalid rows never sampled
    # the first hypotheses stay inside the top-16 pool (ranks 34..49)
    assert (idx[0] >= 34).all()
    # late hypotheses reach the full valid range
    assert idx[-32:].min() < 20


def test_two_view_batch_matches_scalar(rng):
    """estimate_two_view_geometry_batch must agree with the scalar path:
    same configs, same poses, same inlier sets (identical seeds/programs)."""
    items = []
    scalars = []
    for k in range(4):
        q2, t2, params, uv1, uv2 = _stereo_scene(rng, noise=0.3)
        g = two_view.estimate_two_view_geometry(
            uv1, uv2, params, params, 1, 1, seed=k,
            size1=(640, 480), size2=(640, 480),
        )
        scalars.append(g)
        items.append(dict(
            uv1=uv1, uv2=uv2, params1=params, params2=params,
            model_id1=1, model_id2=1, seed=k,
            size1=(640, 480), size2=(640, 480),
        ))
    batch = two_view.estimate_two_view_geometry_batch(items)
    for g_s, g_b in zip(scalars, batch):
        assert g_b.config == g_s.config
        np.testing.assert_array_equal(g_b.inlier_matches, g_s.inlier_matches)
        if g_s.qvec is not None:
            # vmapped kernels reduce in a different order than scalar ones, so
            # RANSAC tie-breaks/LO refits can drift within the noise floor;
            # the exact inlier-set equality above is the strong guarantee
            assert float(se3.angle_between(jnp.asarray(g_b.qvec), jnp.asarray(g_s.qvec))) < 0.03
            assert float(np.dot(g_b.tvec, g_s.tvec)) > 0.98
