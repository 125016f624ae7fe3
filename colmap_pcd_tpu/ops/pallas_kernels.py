"""Pallas TPU kernels for the hot bandwidth-bound ops.

Two kernels where fusing the reduction into the matmul saves the HBM
round-trip that the XLA formulation pays:

  * match_top2   — descriptor matching: the [N1,128]x[128,N2] similarity
                   matrix never leaves VMEM; each (row-tile, col-tile) step
                   updates a running (best, second-best, argbest) per row.
                   At 8192x8192 descriptors the XLA version writes+reads a
                   256 MB similarity matrix; this kernel streams it.
  * nn_argmin    — exact 1-NN against the map: running (min dist, argmin)
                   per query over streamed map tiles (the kd-tree
                   replacement at map scale).

Both fall back to interpret mode on CPU (tests) and are drop-in equivalent
to the jnp formulations in ops/matching.py / ops/pointcloud.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# fused top-2 matching


def _match_kernel(d1_ref, d2_ref, best1_ref, best2_ref, idx1_ref):
    # outputs are whole [N1//TQ, TQ] arrays resident in VMEM (2D keeps the
    # Mosaic layout aligned with XLA's tiling; 1D f32 outputs fail layout
    # checks, and (1, TQ) blocks violate the sublane-divisibility rule);
    # each (i, j) grid step updates row i
    i = pl.program_id(0)
    j = pl.program_id(1)
    TN = d2_ref.shape[0]

    @pl.when(j == 0)
    def _():
        best1_ref[i, :] = jnp.full((best1_ref.shape[1],), -2.0, best1_ref.dtype)
        best2_ref[i, :] = jnp.full((best2_ref.shape[1],), -2.0, best2_ref.dtype)
        idx1_ref[i, :] = jnp.zeros((idx1_ref.shape[1],), idx1_ref.dtype)

    sim = jnp.dot(d1_ref[:], d2_ref[:].T, preferred_element_type=jnp.float32)  # [TQ,TN]
    m1 = jnp.max(sim, axis=1)
    a1 = jnp.argmax(sim, axis=1).astype(jnp.int32)
    # second max: mask out the argmax column per row
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim2 = jnp.where(cols == a1[:, None], -2.0, sim)
    m2 = jnp.max(sim2, axis=1)

    b1 = best1_ref[i, :]
    b2 = best2_ref[i, :]
    i1 = idx1_ref[i, :]
    new1 = jnp.maximum(b1, m1)
    new2 = jnp.maximum(jnp.minimum(b1, m1), jnp.maximum(b2, m2))
    newi = jnp.where(m1 > b1, j * TN + a1, i1)
    best1_ref[i, :] = new1
    best2_ref[i, :] = new2
    idx1_ref[i, :] = newi


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_n", "interpret"))
def match_top2(
    d1: Array,  # [N1,D] L2-normalized
    d2: Array,  # [N2,D]
    tile_q: int = 256,
    tile_n: int = 1024,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Running (best, second, argbest) similarity per row of d1 @ d2.T.

    N1/N2 must be multiples of the tiles (callers pad; padded d2 rows must be
    zero so their similarity is 0 — mask afterwards like ops/matching does).
    """
    N1, D = d1.shape
    N2 = d2.shape[0]
    assert N1 % tile_q == 0 and N2 % tile_n == 0, (N1, N2)
    grid = (N1 // tile_q, N2 // tile_n)
    nq = N1 // tile_q
    b1, b2, i1 = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, tile_q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile_q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile_q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((nq, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((nq, tile_q), jnp.int32),
        ),
        interpret=interpret,
    )(d1.astype(jnp.float32), d2.astype(jnp.float32))
    return b1.reshape(N1), b2.reshape(N1), i1.reshape(N1)


def match_descriptors_pallas(d1, d2, valid1, valid2, opts=None, interpret=None):
    """Drop-in for ops/matching.match_descriptors using the fused kernel
    (ratio + cross-check still applied; cross-check runs the kernel on the
    transpose)."""
    from . import matching

    if opts is None:
        opts = matching.MatchingOptions()
    if interpret is None:
        interpret = not _on_tpu()
    N1, N2 = d1.shape[0], d2.shape[0]
    d2m = jnp.where(valid2[:, None] > 0, d2, 0.0)
    d1m = jnp.where(valid1[:, None] > 0, d1, 0.0)
    tq = min(256, N1)
    tn = min(1024, N2)
    s1, s2, idx = match_top2(d1m, d2m, tile_q=tq, tile_n=tn, interpret=interpret)
    dist1 = jnp.arccos(jnp.clip(s1, -1.0, 1.0))
    dist2 = jnp.arccos(jnp.clip(s2, -1.0, 1.0))
    ok = (valid1 > 0) & (s1 > -1.5) & (dist1 < opts.max_distance)
    ok &= dist1 < opts.max_ratio * dist2
    # invalid columns have similarity <= 0; require a real positive match
    ok &= jnp.take(valid2, idx) > 0
    if opts.cross_check:
        _, _, back = match_top2(
            d2m, d1m, tile_q=min(256, N2), tile_n=min(1024, N1), interpret=interpret
        )
        ok &= jnp.take(back, idx) == jnp.arange(N1)
    return idx, ok


# ---------------------------------------------------------------------------
# fused 1-NN


def _nn_kernel(q_ref, p_ref, bestd_ref, besti_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    TN = p_ref.shape[0]

    @pl.when(j == 0)
    def _():
        bestd_ref[i, :] = jnp.full((bestd_ref.shape[1],), 1e30, bestd_ref.dtype)
        besti_ref[i, :] = jnp.zeros((besti_ref.shape[1],), besti_ref.dtype)

    q = q_ref[:]  # [TQ, 8]
    p = p_ref[:]  # [TN, 8]
    qn = jnp.sum(q * q, axis=1)
    pn = jnp.sum(p * p, axis=1)
    cross = jnp.dot(q, p.T, preferred_element_type=jnp.float32)
    d2 = qn[:, None] + pn[None, :] - 2.0 * cross
    m = jnp.min(d2, axis=1)
    a = jnp.argmin(d2, axis=1).astype(jnp.int32)
    bd = bestd_ref[i, :]
    upd = m < bd
    bestd_ref[i, :] = jnp.where(upd, m, bd)
    besti_ref[i, :] = jnp.where(upd, j * TN + a, besti_ref[i, :])


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_n", "interpret"))
def nn_argmin(
    queries: Array,  # [Q,3]
    points: Array,  # [N,3] — padded rows must be at +inf-ish coords
    tile_q: int = 256,
    tile_n: int = 2048,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """(nn_idx [Q], nn_dist [Q]) exact, streaming the map through VMEM."""
    Q = queries.shape[0]
    N = points.shape[0]
    assert Q % tile_q == 0 and N % tile_n == 0, (Q, N)
    # pad feature dim 3 -> 8 for sublane alignment
    qp = jnp.pad(queries.astype(jnp.float32), ((0, 0), (0, 5)))
    pp = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, 5)))
    grid = (Q // tile_q, N // tile_n)
    nq = Q // tile_q
    bestd, besti = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, tile_q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile_q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((nq, tile_q), jnp.int32),
        ),
        interpret=interpret,
    )(qp, pp)
    return besti.reshape(Q), jnp.sqrt(jnp.maximum(bestd.reshape(Q), 0.0))
