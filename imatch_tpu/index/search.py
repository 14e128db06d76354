"""Exact cosine top-k scoring over an in-HBM corpus.

Replaces ChromaDB's hnswlib ANN query
(/root/reference/backend/app/main.py:761). Exact (not approximate) search
both matches "ChromaDB-equivalent result ordering" checkably (BASELINE.md)
and is the right call on TPU: a (Q, D) x (D, N) matmul is MXU work at HBM
bandwidth, so a 1M x 768 corpus streams in ~2 ms in bf16 — no index
structure needed.

Precision strategy for ordering parity at bf16 speed: score every row in
bf16 (fp32 accumulation), select top-(k + margin) candidates, then rescore
just those candidates in fp32 HIGHEST and re-sort. Near-tie candidates
within bf16 error of the cutoff land inside the margin, so the final
ordering equals full-fp32 ordering (verified against numpy in
tests/test_index.py). Caveat, shared by every fixed-margin two-phase
scheme: a corpus where MORE than k+margin rows/tiles tie within
score-dtype rounding can push the true winner outside the candidate
set — raise IMATCH_TILEMAX_MARGIN for such corpora, or set
IMATCH_SCORE_DTYPE=fp32 to make phase 1 exact outright.

The corpus streams through ``lax.scan`` in chunks with a running top-k
merge, so the (Q, N) score matrix never materializes in HBM for large
batch queries. A Pallas fused matmul+top-k kernel (ops/pallas/topk.py)
slots in through the same interface for the latency-critical path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-3.0e38)


class DeviceCorpus(NamedTuple):
    """Query-ready device state, rebuilt on add/update/delete and cached.

    Splitting prepare from query keeps the per-query work to exactly one
    streaming read of the bf16 corpus — the cast/pad (a 3x-corpus-size
    HBM pass) happens once per mutation, not per search.
    """

    scoring: jax.Array  # (N_pad, D) score dtype (bf16 on TPU; int8 option)
    exact: jax.Array  # (N_pad, D) fp32 for the candidate rescore
    valid: jax.Array  # (N_pad,) bool
    tile_n: int
    scale: jax.Array | None = None  # (N_pad,) per-row int8 dequant scale


@functools.partial(jax.jit, static_argnames=("tile_n", "score_dtype"))
def _prepare_device_corpus(corpus, valid, *, tile_n, score_dtype):
    n = corpus.shape[0]
    n_tiles = max(1, -(-n // tile_n))
    pad = n_tiles * tile_n - n
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    if score_dtype == jnp.int8:
        # symmetric per-row quantization; the scale rides along so phase 1
        # dequantizes the int32 accumulators with one multiply.
        amax = jnp.max(jnp.abs(corpus), axis=1)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
        q = jnp.clip(
            jnp.round(corpus / scale[:, None]), -127, 127
        ).astype(jnp.int8)
        return q, corpus, valid, scale
    return corpus.astype(score_dtype), corpus, valid, None


def prepare_device_corpus(
    corpus,
    valid,
    *,
    tile_n: int = 512,
    score_dtype=jnp.bfloat16,
) -> DeviceCorpus:
    """Build the cached scoring state.

    tile_n=512 measured optimal on v5e at 1M x 512 (2.5 ms/query vs
    9.3 ms at 2048): above ~512 lanes-per-tile XLA stops fusing the
    score matrix into the tile-max reduce, and the phase-2 candidate
    gather grows linearly with the tile size.

    score_dtype: jnp.bfloat16 (default — exact ordering after the fp32
    rescore), jnp.float32 (fidelity), or jnp.int8 (half the scoring HBM
    traffic of bf16 for very large corpora; tile selection is quantized,
    final scores still exact fp32 — near-ties at the tile boundary can
    differ beyond the +margin, so it is opt-in).
    """
    scoring, exact, valid, scale = _prepare_device_corpus(
        corpus, valid, tile_n=tile_n, score_dtype=score_dtype
    )
    return DeviceCorpus(scoring, exact, valid, tile_n, scale)


def _int8_scores(q32, scoring, scale):
    """int8 phase-1 scores (ONE definition: the device int8 engine and
    the tilemax-host tier must select identical tiles — the host tier's
    pinned-identical-results guarantee depends on sharing this code)."""
    qmax = jnp.max(jnp.abs(q32), axis=1)
    qscale = jnp.where(qmax > 0, qmax / 127.0, 1.0)
    qi = jnp.clip(
        jnp.round(q32 / qscale[:, None]), -127, 127
    ).astype(jnp.int8)
    s_int = jnp.einsum(
        "qd,nd->qn", qi, scoring, preferred_element_type=jnp.int32
    )
    return s_int.astype(jnp.float32) * qscale[:, None] * scale[None, :]


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def _tilemax_topk(
    queries, scoring, exact, valid, scale, *, k: int, tile_n: int
):
    """Two-phase exact top-k; measured at HBM roofline on TPU v5e.

    Phase 1: fused einsum + per-tile max over the bf16 corpus — XLA
    fuses the (Q, N) score matrix into the reduction, so the streaming
    loop does no sorts (the lax.scan path pays a top-k sort per chunk;
    measured 10x slower at 1M rows).
    Phase 2: top-k over (Q, n_tiles) tile maxima -> k+margin candidate
    tiles -> fp32 rescore of just those rows -> final top-k. If a true
    top-k row were outside the selected tiles, each selected tile's max
    would outrank it via k distinct rows — so the selected tiles contain
    the full top-k; the +margin absorbs bf16-vs-fp32 rounding at the
    selection boundary. Ties break to the lower index (chroma parity).
    """
    q32 = queries.astype(jnp.float32)
    nq = q32.shape[0]
    n_pad, d = exact.shape
    n_tiles = n_pad // tile_n

    if scoring.dtype == jnp.int8:
        s = _int8_scores(q32, scoring, scale)
    else:
        qs = q32.astype(scoring.dtype)
        s = jnp.einsum(
            "qd,nd->qn", qs, scoring, preferred_element_type=jnp.float32
        )
    s = jnp.where(valid[None, :], s, NEG_INF)
    tile_max = jnp.max(s.reshape(nq, n_tiles, tile_n), axis=2)

    # Tile-selection margin: the +margin absorbs score-dtype rounding at
    # the tile cutoff. Like ANY fixed margin it is defeated when MORE
    # than k+margin tiles tie within score-dtype error (a corpus that is
    # thousands of near-identical vectors) — deployments with such
    # corpora should raise IMATCH_TILEMAX_MARGIN or set
    # IMATCH_SCORE_DTYPE=fp32, which makes phase 1 itself exact.
    import os as _os

    margin = int(
        _os.environ.get(
            "IMATCH_TILEMAX_MARGIN",
            "16" if scoring.dtype == jnp.int8 else "4",
        )
    )
    kt = min(k + margin, n_tiles)
    _, top_tiles = jax.lax.top_k(tile_max, kt)  # (Q, kt)
    corpus_tiles = exact.reshape(n_tiles, tile_n, d)
    vtiles = valid.reshape(n_tiles, tile_n)

    def rescore_one(q, tiles):
        rows = corpus_tiles[tiles].reshape(kt * tile_n, d)
        ok = vtiles[tiles].reshape(kt * tile_n)
        es = jnp.einsum(
            "nd,d->n",
            rows,
            q,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        es = jnp.where(ok, es, NEG_INF)
        base = (tiles[:, None] * tile_n) + jax.lax.broadcasted_iota(
            jnp.int32, (kt, tile_n), 1
        )
        gidx = base.reshape(kt * tile_n)
        # Stable ordering on ties: sort candidates by global index first.
        order = jnp.argsort(gidx)
        es, gidx = es[order], gidx[order]
        kk = min(k, kt * tile_n)
        ts, pos = jax.lax.top_k(es, kk)
        ti = jnp.where(ts <= NEG_INF / 2, -1, gidx[pos])
        if kk < k:
            ts = jnp.pad(ts, (0, k - kk), constant_values=NEG_INF)
            ti = jnp.pad(ti, (0, k - kk), constant_values=-1)
        return ts, ti

    return jax.vmap(rescore_one)(q32, top_tiles)


def tilemax_topk(
    queries: jax.Array, dc: DeviceCorpus, *, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Top-k against a prepared corpus — the store's hot query path."""
    return _tilemax_topk(
        queries,
        dc.scoring,
        dc.exact,
        dc.valid,
        dc.scale,
        k=k,
        tile_n=dc.tile_n,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "rescore_margin", "score_dtype")
)
def cosine_topk(
    queries: jax.Array,
    corpus: jax.Array,
    valid: jax.Array,
    *,
    k: int,
    chunk: int = 65536,
    rescore_margin: int = 32,
    score_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k cosine similarity of L2-normalized queries against corpus rows.

    Args:
      queries: (Q, D) fp32, L2-normalized.
      corpus: (N, D) fp32, L2-normalized; padded rows allowed.
      valid: (N,) bool mask — False rows (padding/tombstones) never match.
      k: number of results.
      chunk: corpus rows per scan step (streaming top-k merge).
      rescore_margin: extra candidates kept for the exact fp32 rescore.
      score_dtype: dtype for the bulk scoring matmul.

    Returns:
      (scores (Q, k) fp32 descending, indices (Q, k) int32). Slots beyond
      the number of valid rows have score -inf and index -1.
    """
    q32 = queries.astype(jnp.float32)
    n, d = corpus.shape
    nq = q32.shape[0]
    kk = min(k + rescore_margin, n)

    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))

    qs = q32.astype(score_dtype)
    corpus_c = corpus.reshape(n_chunks, chunk, d).astype(score_dtype)
    valid_c = valid.reshape(n_chunks, chunk)

    def step(carry, xs):
        best_s, best_i = carry
        rows, ok, offset = xs
        s = jnp.einsum(
            "qd,nd->qn", qs, rows, preferred_element_type=jnp.float32
        )
        s = jnp.where(ok[None, :], s, NEG_INF)
        cand_s = jnp.concatenate([best_s, s], axis=1)
        idx = offset + jax.lax.broadcasted_iota(jnp.int32, (nq, chunk), 1)
        cand_i = jnp.concatenate([best_i, idx], axis=1)
        top_s, top_pos = jax.lax.top_k(cand_s, kk)
        top_i = jnp.take_along_axis(cand_i, top_pos, axis=1)
        return (top_s, top_i), None

    init = (
        jnp.full((nq, kk), NEG_INF, jnp.float32),
        jnp.full((nq, kk), -1, jnp.int32),
    )
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (cand_s, cand_i), _ = jax.lax.scan(
        step, init, (corpus_c, valid_c, offsets)
    )

    # Exact fp32 rescore of the candidate set -> full-fp32 ordering.
    safe_i = jnp.maximum(cand_i, 0)
    cand_rows = corpus[safe_i]  # (Q, kk, D) fp32
    exact = jnp.einsum(
        "qd,qkd->qk",
        q32,
        cand_rows,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    exact = jnp.where(cand_i >= 0, exact, NEG_INF)
    # ties break to the lower row index (chroma parity), matching
    # _tilemax_topk / host_rescore_topk: order candidates by index so
    # top_k's earlier-position preference resolves exact-score ties
    # deterministically instead of by bf16 phase-1 rank
    big = jnp.iinfo(jnp.int32).max
    order = jnp.argsort(jnp.where(cand_i < 0, big, cand_i), axis=1)
    exact = jnp.take_along_axis(exact, order, axis=1)
    cand_i = jnp.take_along_axis(cand_i, order, axis=1)
    top_s, pos = jax.lax.top_k(exact, min(k, kk))
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    top_i = jnp.where(top_s <= NEG_INF / 2, -1, top_i)
    if kk < k:  # corpus smaller than k: pad out
        top_s = jnp.pad(top_s, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)), constant_values=-1)
    return top_s, top_i


# ---------------------------------------------------------------------------
# Capacity tier: int8 scoring in HBM + host fp32 rescore
# ---------------------------------------------------------------------------


class HostRescoreCorpus(NamedTuple):
    """Device state for corpora whose fp32 copy does NOT fit HBM.

    The standard DeviceCorpus keeps both the scoring copy and an fp32
    rescore copy on device — at 10M x 512 that is 20 GB of fp32 alone,
    over a v5e's 16 GB. This tier keeps ONLY the int8 scoring matrix in
    HBM (5 GB at 10M x 512) and rescores the selected candidate tiles
    on the host: a few thousand rows x D per query is microseconds of
    numpy, and the host copy has to exist anyway (it is the store's
    source of truth). Selected via IMATCH_INDEX_ENGINE=tilemax-host.
    """

    scoring: jax.Array  # (N_pad, D) int8, device
    valid: jax.Array  # (N_pad,) bool, device
    scale: jax.Array  # (N_pad,) fp32 dequant scale, device
    host_exact: object  # (N_cap, D) fp32 numpy COPY (mutation-safe)
    host_valid: object  # (N_cap,) bool numpy copy
    tile_n: int
    n: int  # rows represented (pre-padding)


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def _phase1_tiles(queries, scoring, valid, scale, *, k: int, tile_n: int):
    """Phase 1 of the int8 tilemax: top-(k+margin) candidate tile ids
    (scores via _int8_scores — shared with the device engine)."""
    q32 = queries.astype(jnp.float32)
    nq = q32.shape[0]
    n_tiles = scoring.shape[0] // tile_n
    s = _int8_scores(q32, scoring, scale)
    s = jnp.where(valid[None, :], s, NEG_INF)
    tile_max = jnp.max(s.reshape(nq, n_tiles, tile_n), axis=2)
    kt = min(k + 16, n_tiles)
    _, top_tiles = jax.lax.top_k(tile_max, kt)
    return top_tiles


def prepare_host_rescore_corpus(
    emb: "np.ndarray", alive: "np.ndarray", *, tile_n: int = 512
) -> HostRescoreCorpus:
    """Host-side quantization (the 4x-smaller int8 matrix is all that
    crosses to the device), fp32 copy retained on host for rescoring."""
    import numpy as np

    n = emb.shape[0]
    scale = np.empty((n,), np.float32)
    q = np.empty(emb.shape, np.int8)
    # chunked: full-matrix float temporaries would double the 20 GB
    # corpus in host RAM during quantization
    step = 1 << 20
    for s0 in range(0, n, step):
        blk = emb[s0 : s0 + step]
        amax = np.abs(blk).max(axis=1)
        sc = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        scale[s0 : s0 + step] = sc
        q[s0 : s0 + step] = np.clip(
            np.round(blk / sc[:, None]), -127, 127
        ).astype(np.int8)
    pad = (-n) % tile_n
    if pad:
        q = np.pad(q, ((0, pad), (0, 0)))
        alive_p = np.pad(alive, (0, pad))
        scale_p = np.pad(scale, (0, pad), constant_values=1.0)
    else:
        alive_p, scale_p = alive, scale
    return HostRescoreCorpus(
        scoring=jnp.asarray(q),
        valid=jnp.asarray(alive_p),
        scale=jnp.asarray(scale_p),
        host_exact=emb,
        host_valid=alive,
        tile_n=tile_n,
        n=n,
    )


def host_rescore_topk(queries, hc: HostRescoreCorpus, *, k: int):
    """(Q, k) fp32 scores + int32 indices, -1/-inf padded — same contract
    as tilemax_topk but returning numpy (the caller's device_get is a
    pass-through)."""
    import numpy as np

    tiles = np.asarray(
        _phase1_tiles(
            queries if isinstance(queries, jax.Array) else jnp.asarray(queries),
            hc.scoring,
            hc.valid,
            hc.scale,
            k=k,
            tile_n=hc.tile_n,
        )
    )
    qh = np.asarray(queries, np.float32)
    nq = qh.shape[0]
    out_s = np.full((nq, k), float(NEG_INF), np.float32)
    out_i = np.full((nq, k), -1, np.int32)
    col = np.arange(hc.tile_n)
    for qi in range(nq):
        rows_idx = (tiles[qi][:, None] * hc.tile_n + col[None, :]).ravel()
        rows_idx = rows_idx[rows_idx < hc.n]
        ok = hc.host_valid[rows_idx]
        rows_idx = rows_idx[ok]
        if rows_idx.size == 0:
            continue
        # fp32 accumulate to MIRROR the device engines' fp32 HIGHEST
        # rescore: tile selection is shared code (_int8_scores) and the
        # rescore dtype now matches, so near-tie orderings agree across
        # tiers up to summation order. Chunked: at k=1024 ('All' on a
        # big corpus) the candidate set is ~500k rows, and a one-shot
        # fancy-index cast would allocate GBs of temporaries per query.
        es = np.empty((rows_idx.size,), np.float32)
        q32 = qh[qi]
        step = 65536
        for c0 in range(0, rows_idx.size, step):
            sel = rows_idx[c0 : c0 + step]
            es[c0 : c0 + step] = hc.host_exact[sel] @ q32
        kk = min(k, rows_idx.size)
        # ties break to the lower index (chroma parity): lexsort is
        # stable with the index as the secondary key
        order = np.lexsort((rows_idx, -es))[:kk]
        out_s[qi, :kk] = es[order].astype(np.float32)
        out_i[qi, :kk] = rows_idx[order]
    return out_s, out_i
