"""Multi-chip pairwise matching: image-pair batches sharded over the mesh.

The reference data-parallels matching with CPU worker threads over pair
blocks (feature/matching.h:222-345). The TPU analog shards a batch of pairs
over the device mesh: descriptors for B pairs are stacked [B, N, D] and each
device matches its shard with the same fused kernel — embarrassingly
parallel, zero collectives, linear scaling in devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import matching as matching_ops


def match_pairs_batch(
    d1: jnp.ndarray,  # [B, N1, D] L2-normalized (padded rows zero)
    d2: jnp.ndarray,  # [B, N2, D]
    v1: jnp.ndarray,  # [B, N1]
    v2: jnp.ndarray,  # [B, N2]
    mesh: jax.sharding.Mesh | None = None,
    axis: str = "work",
    opts: matching_ops.MatchingOptions = matching_ops.MatchingOptions(),
):
    """Match B descriptor pairs at once; with a mesh, B shards across devices.

    Returns (idx [B,N1], ok [B,N1]). B must be a multiple of the mesh size.
    """

    if mesh is not None:
        B = d1.shape[0]
        n = mesh.devices.size
        assert B % n == 0, f"batch {B} not divisible by mesh size {n}"
        run_sharded, sh3, sh2 = _sharded_runner(mesh, axis, opts)
        d1 = jax.device_put(d1, sh3)
        d2 = jax.device_put(d2, sh3)
        v1 = jax.device_put(v1, sh2)
        v2 = jax.device_put(v2, sh2)
        return run_sharded(d1, d2, v1, v2)
    return _local_runner(opts)(d1, d2, v1, v2)


@functools.lru_cache(maxsize=16)
def _local_runner(opts: matching_ops.MatchingOptions):
    """Memoized jitted batch matcher (fresh closures per call would defeat
    jax.jit's per-wrapper compile cache and recompile every invocation)."""
    return jax.jit(
        lambda a, b, va, vb: jax.vmap(
            lambda x, y, vx, vy: matching_ops.match_descriptors(x, y, vx, vy, opts)[:2]
        )(a, b, va, vb)
    )


@functools.lru_cache(maxsize=16)
def _sharded_runner(mesh, axis: str, opts: matching_ops.MatchingOptions):
    """Memoized sharded matcher + its shardings, keyed on (mesh, axis, opts)."""
    sh3 = NamedSharding(mesh, P(axis, None, None))
    sh2 = NamedSharding(mesh, P(axis, None))
    fn = jax.jit(
        lambda a, b, va, vb: jax.vmap(
            lambda x, y, vx, vy: matching_ops.match_descriptors(x, y, vx, vy, opts)[:2]
        )(a, b, va, vb),
        in_shardings=(sh3, sh3, sh2, sh2),
        out_shardings=(sh2, sh2),
    )
    return fn, sh3, sh2


def match_pair_list(
    descs: dict[int, np.ndarray],
    pairs: list[tuple[int, int]],
    mesh: jax.sharding.Mesh | None = None,
    cap: int = 2048,
    opts: matching_ops.MatchingOptions = matching_ops.MatchingOptions(),
) -> dict[tuple[int, int], np.ndarray]:
    """Host convenience: normalize/pad per-image descriptors, batch the pair
    list (padding the batch to the mesh size), return per-pair [M,2] matches."""
    norm: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for iid, d in descs.items():
        d = np.asarray(d, np.float32)
        n = min(len(d), cap)
        dp = np.zeros((cap, d.shape[1] if d.size else 128), np.float32)
        if n:
            dn = d[:n] / np.maximum(np.linalg.norm(d[:n], axis=1, keepdims=True), 1e-8)
            dp[:n] = dn
        v = np.zeros(cap, np.float32)
        v[:n] = 1.0
        norm[iid] = (dp, v)

    B = len(pairs)
    nd = mesh.devices.size if mesh is not None else 1
    Bp = -(-B // nd) * nd
    d1 = np.zeros((Bp, cap, 128), np.float32)
    d2 = np.zeros((Bp, cap, 128), np.float32)
    v1 = np.zeros((Bp, cap), np.float32)
    v2 = np.zeros((Bp, cap), np.float32)
    for k, (i, j) in enumerate(pairs):
        d1[k], v1[k] = norm[i]
        d2[k], v2[k] = norm[j]
    idx, ok = match_pairs_batch(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v1), jnp.asarray(v2), mesh=mesh, opts=opts
    )
    idx = np.asarray(idx)
    ok = np.asarray(ok)
    out = {}
    for k, (i, j) in enumerate(pairs):
        rows = np.nonzero(ok[k])[0]
        out[(i, j)] = np.stack([rows, idx[k][rows]], -1).astype(np.int32)
    return out
