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
