"""Fused cosine-score + top-k candidate selection, Pallas TPU kernel.

The latency-critical index query (BASELINE.md: <10 ms p50 @ 1M vectors).
Split into a build-time *prepare* step and a query-time kernel so the
per-query work is exactly one streaming read of the corpus:

**prepare_corpus** (on add/update, cached by the VectorStore): cast the
fp32 corpus to the scoring dtype, fold row validity (padding/tombstones)
into an extra penalty feature column (query=1, row=0 if valid else -4,
so invalid rows score <= -3 < any valid cosine — Mosaic's (8, 128) block
tiling makes a separate (1, TILE_N) mask operand unlowerable), and pad
features to a 128-lane multiple so every DMA is tile-aligned.

**Query phase 1** (Pallas kernel): one pass over the prepared (N, Dp)
corpus in HBM. Each grid step scores a (TILE_N, Dp) tile against the
queries on the MXU and reduces it to a per-tile max on the VPU — no
(Q, N) score matrix in HBM and *no sorts* in the streaming loop (the
lax.scan XLA path pays a top-k sort per chunk). Per-tile maxima land in
(Qp, 128) output blocks revisited by 128 consecutive grid steps via a
lane-mask select (dynamic single-lane stores don't lower).

**Query phase 2** (XLA): top-k over the (Q, n_tiles) tile maxima picks
candidate tiles; those tiles' rows are rescored in fp32 and top-k'd.
Correctness: if a true top-k row were outside the selected tiles, each
selected tile's max would exceed its score, giving k distinct rows that
all outrank it — so the selected tiles contain the full top-k (ties
broken by lower index, matching index/search.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # python float: jnp scalars can't be captured by kernels
INVALID_PENALTY = -4.0  # added to invalid rows' scores via the extra column
GROUP = 128  # tile maxima per output block (the VMEM lane width)


class PreparedCorpus(NamedTuple):
    """Device-resident, query-ready corpus state."""

    scoring: jax.Array  # (n_tiles*tile_n, d_pad) score_dtype, aligned
    exact: jax.Array  # (n_tiles*tile_n, d) fp32 for the rescore
    vmask: jax.Array  # (n_tiles, tile_n) bool
    n: int  # live row count (static)
    tile_n: int


@functools.partial(jax.jit, static_argnames=("tile_n", "score_dtype"))
def _prepare(corpus, valid, *, tile_n, score_dtype):
    n, d = corpus.shape
    n_tiles = max(1, -(-n // tile_n))
    pad = n_tiles * tile_n - n
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    d_pad = -(-(d + 1) // 128) * 128
    feat = jnp.zeros((n_tiles * tile_n, d_pad - d), corpus.dtype)
    feat = feat.at[:, 0].set(jnp.where(valid, 0.0, INVALID_PENALTY))
    scoring = jnp.concatenate([corpus, feat], axis=1).astype(score_dtype)
    return scoring, corpus, valid.reshape(n_tiles, tile_n)


def prepare_corpus(
    corpus: jax.Array,
    valid: jax.Array,
    *,
    tile_n: int = 2048,
    score_dtype=jnp.bfloat16,
) -> PreparedCorpus:
    """Build the device-resident scoring state (one pass over the corpus)."""
    scoring, exact, vmask = _prepare(
        corpus, valid, tile_n=tile_n, score_dtype=score_dtype
    )
    return PreparedCorpus(scoring, exact, vmask, corpus.shape[0], tile_n)


def _tile_max_kernel(q_ref, c_ref, max_ref):
    i = pl.program_id(0)
    col = jax.lax.rem(i, GROUP)

    @pl.when(col == 0)
    def _():
        max_ref[:] = jnp.full_like(max_ref, NEG_INF)

    s = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Qp, tile_n)
    m = jnp.max(s, axis=1, keepdims=True)  # (Qp, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, max_ref.shape, 1)
    max_ref[:] = jnp.where(lanes == col, m, max_ref[:])


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def _query_prepared(
    queries,
    scoring,
    exact,
    vmask,
    *,
    k: int,
    tile_n: int,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array]:
    q32 = queries.astype(jnp.float32)
    nq, d = q32.shape
    n_tiles = vmask.shape[0]
    d_pad = scoring.shape[1]

    # Pad queries to the fp32 sublane (8); penalty column gets 1.
    qp = -(-nq // 8) * 8
    qf = jnp.zeros((qp, d_pad), jnp.float32)
    qf = qf.at[:nq, :d].set(q32).at[:, d].set(1.0)
    qs = qf.astype(scoring.dtype)

    nt_pad = -(-n_tiles // GROUP) * GROUP
    tile_max = pl.pallas_call(
        _tile_max_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (qp, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (qp, GROUP), lambda i: (0, i // GROUP), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp, nt_pad), jnp.float32),
        interpret=interpret,
    )(qs, scoring)
    tile_max = tile_max[:nq, :n_tiles]

    # Phase 2: pick k(+margin) candidate tiles per query, rescore in fp32.
    # The +margin absorbs bf16-vs-fp32 rounding at the tile-selection
    # boundary (phase 1 maxima are score-dtype; the final ordering is fp32).
    kt = min(k + 4, n_tiles)
    _, top_tiles = jax.lax.top_k(tile_max, kt)  # (Q, kt)
    corpus_tiles = exact.reshape(n_tiles, tile_n, d)

    def rescore_one(q, tiles):
        rows = corpus_tiles[tiles].reshape(kt * tile_n, d)  # (kt*T, D)
        ok = vmask[tiles].reshape(kt * tile_n)
        s = jnp.einsum(
            "nd,d->n",
            rows,
            q,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(ok, s, NEG_INF)
        base = (tiles[:, None] * tile_n) + jax.lax.broadcasted_iota(
            jnp.int32, (kt, tile_n), 1
        )
        gidx = base.reshape(kt * tile_n)
        # Stable ordering on ties: sort candidates by global index first.
        order = jnp.argsort(gidx)
        s, gidx = s[order], gidx[order]
        kk = min(k, kt * tile_n)
        ts, pos = jax.lax.top_k(s, kk)
        ti = jnp.where(ts <= NEG_INF / 2, -1, gidx[pos])
        if kk < k:
            ts = jnp.pad(ts, (0, k - kk), constant_values=NEG_INF)
            ti = jnp.pad(ti, (0, k - kk), constant_values=-1)
        return ts, ti

    return jax.vmap(rescore_one)(q32, top_tiles)


def pallas_topk_prepared(
    queries: jax.Array,
    prep: PreparedCorpus,
    *,
    k: int,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k against a prepared corpus (the store's hot query path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _query_prepared(
        queries,
        prep.scoring,
        prep.exact,
        prep.vmask,
        k=k,
        tile_n=prep.tile_n,
        interpret=interpret,
    )


def pallas_cosine_topk(
    queries: jax.Array,
    corpus: jax.Array,
    valid: jax.Array,
    *,
    k: int,
    tile_n: int = 2048,
    score_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """One-shot convenience wrapper: prepare + query.

    Same contract as index.search.cosine_topk: queries/corpus fp32
    L2-normalized, valid (N,) bool; returns (scores (Q, k) fp32
    descending, indices (Q, k) int32), -1/-inf beyond the valid rows.
    """
    prep = prepare_corpus(
        corpus, valid, tile_n=tile_n, score_dtype=score_dtype
    )
    return pallas_topk_prepared(queries, prep, k=k, interpret=interpret)
