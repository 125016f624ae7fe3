"""Retrieval quality: quantify VLAD recall against ground-truth covisibility.

VERDICT r1 flagged the VLAD-over-kmeans redesign (ops/retrieval.py, replacing
src/retrieval/'s vocab tree + inverted files + Hamming embedding) as unproven.
These tests measure recall of true covisible neighbors:

  * a controlled synthetic-descriptor benchmark where covisibility is exact
    (images share world-point descriptors in proportion to their overlap), and
  * a rendered-pixels benchmark with real SIFT descriptors where the oracle
    ranking is exhaustive descriptor matching (the thing retrieval replaces).
"""

import numpy as np
import pytest

from colmap_pcd_tpu.ops import retrieval


def _make_synthetic_descs(n_images=16, pts_per_image=120, overlap=80, seed=0):
    """Image i sees world points [i*(pts-overlap), ...+pts): adjacent images
    share `overlap` points; distance-2 neighbors share 2*overlap - pts."""
    rng = np.random.default_rng(seed)
    stride = pts_per_image - overlap
    n_world = n_images * stride + overlap
    world = rng.normal(size=(n_world, 128)).astype(np.float32)
    world /= np.linalg.norm(world, axis=1, keepdims=True)
    descs = {}
    for i in range(n_images):
        lo = i * stride
        d = world[lo : lo + pts_per_image] + rng.normal(0, 0.05, (pts_per_image, 128)).astype(np.float32)
        descs[i + 1] = (d / np.linalg.norm(d, axis=1, keepdims=True) * 512).astype(np.float32)
    return descs


def test_vlad_recall_synthetic():
    descs = _make_synthetic_descs()
    index = retrieval.build_index(descs, k=16)
    n_images = len(descs)
    hits = total = 0
    for i in sorted(descs):
        # ground-truth covisible set: images within distance 2
        gt = {j for j in descs if j != i and abs(j - i) <= 2}
        got = set(retrieval.query(index, i, len(gt)))
        hits += len(gt & got)
        total += len(gt)
    recall = hits / total
    assert recall >= 0.7, f"VLAD recall@|gt| = {recall:.2f}"


@pytest.mark.slow
def test_vlad_recall_vs_exhaustive_sift(tmp_path):
    """Real SIFT descriptors on rendered corridor views: VLAD's top-k must
    recover most of the top-k of exhaustive match-count ranking (the oracle
    it replaces at O(N) instead of O(N^2) cost)."""
    import sys

    sys.path.insert(0, "tests")
    import jax.numpy as jnp
    from render import render_corridor
    from test_full_stack import make_gt

    from colmap_pcd_tpu.ops import matching as matching_ops
    from colmap_pcd_tpu.ops import sift as sift_ops

    n_images = 8
    gt = make_gt(n_images, step=0.9)
    opts = sift_ops.SiftOptions(max_num_features=1024, first_octave=0, num_octaves=3)
    descs = {}
    for i, (q, t) in enumerate(gt):
        img = render_corridor(q, t, 320, 240, 260.0)
        kp, desc, score, valid = sift_ops.extract(jnp.asarray(img), opts)
        descs[i + 1] = np.asarray(desc)[np.asarray(valid)].astype(np.float32)

    index = retrieval.build_index(descs, k=16)

    # oracle: rank by putative match count from full descriptor matching
    def nmatches(a, b):
        da = descs[a] / np.maximum(np.linalg.norm(descs[a], axis=1, keepdims=True), 1e-8)
        db = descs[b] / np.maximum(np.linalg.norm(descs[b], axis=1, keepdims=True), 1e-8)
        cap = 1024
        pa = np.zeros((cap, 128), np.float32)
        pa[: da.shape[0]] = da
        pb = np.zeros((cap, 128), np.float32)
        pb[: db.shape[0]] = db
        va = np.zeros(cap, np.float32)
        va[: da.shape[0]] = 1
        vb = np.zeros(cap, np.float32)
        vb[: db.shape[0]] = 1
        _, ok, _ = matching_ops.match_descriptors(
            jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(va), jnp.asarray(vb)
        )
        return int(np.asarray(ok).sum())

    K = 3
    hits = total = 0
    ids = sorted(descs)
    for i in ids:
        oracle = sorted((j for j in ids if j != i), key=lambda j: -nmatches(i, j))[:K]
        got = set(retrieval.query(index, i, K))
        hits += len(set(oracle) & got)
        total += K
    recall = hits / total
    assert recall >= 0.6, f"VLAD top-{K} recall vs exhaustive = {recall:.2f}"


# ---------------------------------------------------------------------------
# vote-and-verify spatial re-ranking (ops/vote_verify.py, reference
# retrieval/vote_and_verify.cc) — repetitive structure is where raw VLAD
# similarity fails and spatial verification must recover the ranking.


def _repetitive_scene(seed=0, n_protos=12, n_feat=96):
    """Images whose descriptors all come from a small prototype set (heavy
    repetition -> near-identical VLADs), differing only in feature GEOMETRY:
      query:    features on a grid
      true:     the same features under a similarity transform (+ tiny noise)
      impostor: same word histogram, positions shuffled (inconsistent)
    """
    rng = np.random.default_rng(seed)
    protos = rng.normal(size=(n_protos, 128)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    words = rng.integers(0, n_protos, n_feat)

    def descs(jitter_seed):
        r = np.random.default_rng(jitter_seed)
        d = protos[words] + r.normal(0, 0.02, (n_feat, 128)).astype(np.float32)
        return (d / np.linalg.norm(d, axis=1, keepdims=True) * 512).astype(np.float32)

    gx, gy = np.meshgrid(np.arange(12), np.arange(8))
    xy = np.stack([gx.ravel() * 40.0 + 50, gy.ravel() * 40.0 + 50], -1)[:n_feat]
    scale = np.full((n_feat, 1), 2.0, np.float32)
    ori = np.zeros((n_feat, 1), np.float32)
    geom_q = np.concatenate([xy, scale, ori], -1).astype(np.float32)

    # true: rotate 0.2 rad, scale 1.3, translate
    a, s = 0.2, 1.3
    R = np.asarray([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    xy_t = (s * xy @ R.T) + np.asarray([30.0, -20.0]) + rng.normal(0, 1.0, xy.shape)
    geom_t = np.concatenate(
        [xy_t, scale * s, ori + a], -1
    ).astype(np.float32)

    # impostor: same words, positions shuffled
    perm = rng.permutation(n_feat)
    geom_i = np.concatenate([xy[perm], scale, ori], -1).astype(np.float32)

    # the impostor's descriptors are a near-copy of the QUERY's (tiny extra
    # jitter) while the true match re-jitters the prototypes independently:
    # plain VLAD therefore prefers the impostor — only geometry can fix it
    d_q = descs(1)
    d_i = d_q + rng.normal(0, 1.0, d_q.shape).astype(np.float32)
    descs_by = {1: d_q, 2: descs(2), 3: d_i}
    geoms_by = {1: geom_q, 2: geom_t, 3: geom_i}
    return descs_by, geoms_by


def test_vote_and_verify_scores_consistent_above_shuffled():
    from colmap_pcd_tpu.ops import vote_verify as vv
    import jax.numpy as jnp

    descs_by, geoms_by = _repetitive_scene()
    index = retrieval.build_index(descs_by, k=12, geoms_by_image=geoms_by)
    qi = index.ids.index(1)
    ti = index.ids.index(2)
    ii = index.ids.index(3)
    # thresholds scaled to the 480x330 px synthetic scene (the defaults
    # mirror the reference's 4096-px-image tuning, vote_and_verify.h:54-63)
    opts = vv.VoteVerifyOptions(max_image_size=512.0, max_transfer_error=15.0**2)
    scores = np.asarray(
        vv.vote_and_verify_batch(
            jnp.asarray(index.geoms[qi]), jnp.asarray(index.words[qi]),
            jnp.asarray(index.valids[qi]),
            jnp.asarray(index.geoms[[ti, ii]]), jnp.asarray(index.words[[ti, ii]]),
            jnp.asarray(index.valids[[ti, ii]]),
            opts,
        )
    )
    assert scores[0] >= 20, scores  # the consistent pair verifies strongly
    assert scores[0] >= 4 * max(scores[1], 1), scores  # the shuffled one dies


def test_rerank_fixes_repetitive_confusion():
    """Plain VLAD cannot separate the geometrically-true candidate from the
    shuffled impostor (same word histogram); rerank=True must rank the true
    candidate first. This quantifies the recall@1 delta the verdict asked
    for: 'plain' is ~chance, reranked is exact."""
    n_true_first_plain = 0
    n_true_first_rerank = 0
    trials = 6
    for seed in range(trials):
        descs_by, geoms_by = _repetitive_scene(seed=seed)
        index = retrieval.build_index(descs_by, k=12, geoms_by_image=geoms_by)
        plain = retrieval.query(index, 1, 2)
        rer = retrieval.query(
            index, 1, 2, rerank=True, num_verify=2,
            vv_opts=__import__("colmap_pcd_tpu.ops.vote_verify", fromlist=["v"]).VoteVerifyOptions(
                max_image_size=512.0, max_transfer_error=15.0**2
            ),
        )
        n_true_first_plain += plain[0] == 2
        n_true_first_rerank += rer[0] == 2
    assert n_true_first_rerank == trials, (n_true_first_rerank, trials)
    # the plain ranking must not already be perfect (else the scene is too
    # easy to demonstrate anything) — allow at most 2/3 by luck
    assert n_true_first_plain <= 1, n_true_first_plain
