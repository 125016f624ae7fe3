"""Image retrieval: VLAD global descriptors over a k-means vocabulary.

Replaces src/retrieval/ (VisualIndex + FLANN vocab tree + inverted files with
Hamming embedding, 2.8k LoC): on a matrix machine the natural formulation is a
small k-means vocabulary (Lloyd iterations = one assignment matmul + segment
sums) and VLAD aggregation; querying the index is a single [Q, k*128] x
[k*128, N] matmul instead of an inverted-file walk. Used by vocab-tree-style
matching and sequential loop detection (feature_pipeline.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(desc: Array, key: Array, k: int = 64, iters: int = 10) -> Array:
    """Lloyd k-means on [N,D] -> centroids [k,D]. Assignment is a matmul."""
    N, D = desc.shape
    idx = jax.random.choice(key, N, (k,), replace=False)
    cent = desc[idx]

    def step(cent, _):
        # nearest centroid by dot products (descriptors ~unit norm)
        d2 = (
            jnp.sum(desc**2, 1)[:, None]
            - 2 * jnp.matmul(desc, cent.T, precision=jax.lax.Precision.DEFAULT)
            + jnp.sum(cent**2, 1)[None, :]
        )
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=desc.dtype)  # [N,k]
        sums = jnp.matmul(onehot.T, desc, precision=jax.lax.Precision.DEFAULT)  # [k,D]
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@jax.jit
def vlad(desc: Array, valid: Array, centroids: Array) -> Array:
    """VLAD aggregation: [N,D] + [k,D] -> [k*D], power + L2 normalized."""
    k, D = centroids.shape
    d2 = (
        jnp.sum(desc**2, 1)[:, None]
        - 2 * jnp.matmul(desc, centroids.T, precision=jax.lax.Precision.DEFAULT)
        + jnp.sum(centroids**2, 1)[None, :]
    )
    assign = jnp.argmin(d2, axis=1)
    onehot = jax.nn.one_hot(assign, k, dtype=desc.dtype) * valid[:, None]  # [N,k]
    resid = desc[:, None, :] - centroids[None, :, :]  # [N,k,D]
    v = jnp.einsum("nk,nkd->kd", onehot, resid).reshape(-1)
    # power normalization then L2
    v = jnp.sign(v) * jnp.sqrt(jnp.abs(v))
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


@dataclass
class RetrievalIndex:
    ids: list
    vlads: np.ndarray  # [n_images, k*D]
    centroids: np.ndarray


def build_index(
    descs_by_image: dict[int, np.ndarray],
    k: int = 64,
    max_train: int = 50000,
    seed: int = 0,
) -> RetrievalIndex:
    ids = sorted(descs_by_image.keys())
    all_desc = [d for i in ids for d in [descs_by_image[i]] if d.size]
    if not all_desc:
        return RetrievalIndex(ids, np.zeros((len(ids), k * 128), np.float32), np.zeros((k, 128), np.float32))
    train = np.concatenate(all_desc)[:max_train].astype(np.float32)
    train = train / np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-8)
    kk = min(k, train.shape[0])
    cent = np.asarray(kmeans(jnp.asarray(train), jax.random.PRNGKey(seed), k=kk))
    D = train.shape[1]
    vlads = np.zeros((len(ids), kk * D), np.float32)
    cap = 1 << int(np.ceil(np.log2(max(max(d.shape[0] for d in all_desc), 1))))
    for n, i in enumerate(ids):
        d = descs_by_image[i].astype(np.float32)
        if d.size == 0:
            continue
        d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-8)
        dp = np.zeros((cap, D), np.float32)
        dp[: d.shape[0]] = d
        v = np.zeros(cap, np.float32)
        v[: d.shape[0]] = 1.0
        vlads[n] = np.asarray(vlad(jnp.asarray(dp), jnp.asarray(v), jnp.asarray(cent)))
    return RetrievalIndex(ids, vlads, cent)


def query(index: RetrievalIndex, image_id, num: int) -> list:
    """Ranked most-similar image ids (excluding the query itself)."""
    try:
        qi = index.ids.index(image_id)
    except ValueError:
        return []
    sims = jnp.matmul(index.vlads, index.vlads[qi], precision=jax.lax.Precision.DEFAULT)
    order = np.argsort(-sims)
    out = [index.ids[int(o)] for o in order if index.ids[int(o)] != image_id]
    return out[:num]
