"""Corpus-sharded exact top-k search over a device mesh.

The reference's search is one hnswlib query in one process
(/root/reference/backend/app/main.py:761). The TPU scale-out (SURVEY.md
§2.3): shard the (N, D) corpus row-wise over the ``data`` axis, score
each shard locally with the two-phase tile-max engine (index/search.py),
then all-gather only the per-shard top-k candidates — k*P rows instead
of N — and take the global top-k. The all-gather rides ICI; per-query
traffic is k*P*(4+4) bytes, independent of corpus size.

``shard_map`` (not bare jit) because the candidate merge is an explicit
algorithm, not something we want SPMD to infer.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from imatch_tpu.index.search import _tilemax_topk
from imatch_tpu.parallel.mesh import AXIS_DATA


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "chunk", "score_dtype")
)
def sharded_cosine_topk(
    queries: jax.Array,
    corpus: jax.Array,
    valid: jax.Array,
    *,
    mesh: Mesh,
    k: int,
    chunk: int = 512,
    score_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Global exact top-k with the corpus sharded over mesh axis ``data``.

    ``corpus`` rows must be padded to a multiple of the data-axis size
    (use ``pad_corpus_for_mesh``); ``valid`` masks the padding. Returned
    indices are global row ids into the unsharded corpus, -1 for empty
    slots, with ties broken by lower global index (matching the
    single-chip path).
    """
    if score_dtype == jnp.int8:
        # no per-row dequant scale on the sharded path (see
        # prepare_sharded_corpus): coerce like the store does instead of
        # truncating unit vectors to {-1,0,1} and crashing on scale=None
        score_dtype = jnp.bfloat16
    n = corpus.shape[0]
    dp = mesh.shape[AXIS_DATA]
    if n == 0:
        # 0 % dp == 0 would slip past the divisibility check and divide
        # by a zero tile size below; fail with intent instead
        raise ValueError("empty corpus: nothing to search")
    if n % dp:
        raise ValueError(f"corpus rows {n} not a multiple of mesh data={dp}")
    shard_rows = n // dp

    def local(q, c, v):
        # per-shard scoring uses the same two-phase tile-max engine as the
        # single-chip store (index/search.py)
        tile_n = min(chunk, 512, shard_rows)
        pad = (-shard_rows) % tile_n
        cp = jnp.pad(c, ((0, pad), (0, 0))) if pad else c
        vp = jnp.pad(v, (0, pad)) if pad else v
        s, i = _tilemax_topk(
            q, cp.astype(score_dtype), cp, vp, None, k=k, tile_n=tile_n
        )
        shard = jax.lax.axis_index(AXIS_DATA)
        i = jnp.where(i >= 0, i + shard * shard_rows, -1)
        # Gather all shards' candidates along the k axis: (Q, dp*k).
        ss = jax.lax.all_gather(s, AXIS_DATA, axis=1, tiled=True)
        ii = jax.lax.all_gather(i, AXIS_DATA, axis=1, tiled=True)
        # Stable global merge: top_k prefers earlier positions on ties,
        # so order candidates by global index first.
        order = jnp.argsort(jnp.where(ii < 0, jnp.iinfo(jnp.int32).max, ii))
        ss = jnp.take_along_axis(ss, order, axis=1)
        ii = jnp.take_along_axis(ii, order, axis=1)
        top_s, pos = jax.lax.top_k(ss, k)
        top_i = jnp.take_along_axis(ii, pos, axis=1)
        return top_s, top_i

    shard_mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS_DATA, None), P(AXIS_DATA)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return shard_mapped(queries, corpus, valid)


class ShardedCorpus(NamedTuple):
    """Query-ready mesh-sharded corpus state — the VectorStore-facing
    prepared form (IMATCH_INDEX_ENGINE=sharded).

    Like index/search.DeviceCorpus, but each array is row-sharded over
    the mesh ``data`` axis, so per-chip HBM holds N/P rows: scoring
    (bf16) + exact (fp32) cost 6 bytes/element, i.e. a 1M x 512 corpus
    is ~3 GB total, ~384 MB/chip on a v5e-8. The cast/pad happens once
    per mutation here, not per query."""

    scoring: jax.Array  # (N_pad, D) score dtype, sharded P(data, None)
    exact: jax.Array  # (N_pad, D) fp32, sharded P(data, None)
    valid: jax.Array  # (N_pad,) bool, sharded P(data)
    mesh: Mesh
    tile_n: int


def prepare_sharded_corpus(
    corpus,
    valid,
    *,
    mesh: Mesh,
    score_dtype=jnp.bfloat16,
    tile_n: int = 512,
) -> ShardedCorpus:
    """Pad rows to a multiple of dp*tile_n and place both the scoring
    and fp32-rescore copies row-sharded over the ``data`` axis."""
    import numpy as np

    corpus = np.asarray(corpus, np.float32)
    valid = np.asarray(valid, bool)
    if score_dtype == jnp.int8:
        # the sharded engine has no per-row dequant scale (a raw astype
        # would truncate unit vectors to {-1,0,1} and _tilemax_topk's
        # int8 branch would then crash on scale=None). The store coerces
        # int8 -> bf16 before calling here (store.py _build_device);
        # mirror that for direct library users instead of corrupting.
        score_dtype = jnp.bfloat16
    dp = mesh.shape[AXIS_DATA]
    n = corpus.shape[0]
    pad = (-n) % (dp * tile_n)
    if pad:
        corpus = np.pad(corpus, ((0, pad), (0, 0)))
        valid = np.pad(valid, (0, pad))
    row_sh = NamedSharding(mesh, P(AXIS_DATA, None))
    return ShardedCorpus(
        scoring=jax.device_put(corpus.astype(score_dtype), row_sh)
        if score_dtype != jnp.float32
        else jax.device_put(corpus, row_sh),
        exact=jax.device_put(corpus, row_sh),
        valid=jax.device_put(valid, NamedSharding(mesh, P(AXIS_DATA))),
        mesh=mesh,
        tile_n=tile_n,
    )


@functools.partial(jax.jit, static_argnames=("k", "mesh", "tile_n"))
def _sharded_topk_prepared(
    queries, scoring, exact, valid, *, mesh: Mesh, k: int, tile_n: int
):
    dp = mesh.shape[AXIS_DATA]
    shard_rows = scoring.shape[0] // dp

    def local(q, sc, ex, v):
        s, i = _tilemax_topk(q, sc, ex, v, None, k=k, tile_n=tile_n)
        shard = jax.lax.axis_index(AXIS_DATA)
        i = jnp.where(i >= 0, i + shard * shard_rows, -1)
        ss = jax.lax.all_gather(s, AXIS_DATA, axis=1, tiled=True)
        ii = jax.lax.all_gather(i, AXIS_DATA, axis=1, tiled=True)
        # ties break to the lower global index (chroma parity): order
        # candidates by global index before the stable top_k
        order = jnp.argsort(jnp.where(ii < 0, jnp.iinfo(jnp.int32).max, ii))
        ss = jnp.take_along_axis(ss, order, axis=1)
        ii = jnp.take_along_axis(ii, order, axis=1)
        top_s, pos = jax.lax.top_k(ss, k)
        top_i = jnp.take_along_axis(ii, pos, axis=1)
        return top_s, top_i

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS_DATA, None), P(AXIS_DATA, None), P(AXIS_DATA)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, scoring, exact, valid)


def sharded_topk_prepared(
    queries: jax.Array, sc: ShardedCorpus, *, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Top-k against a prepared sharded corpus — the store's hot query
    path on a multi-chip mesh. Same contract as tilemax_topk: (Q, k)
    fp32 scores descending + global int32 row indices, -1 padded."""
    return _sharded_topk_prepared(
        jnp.asarray(queries),
        sc.scoring,
        sc.exact,
        sc.valid,
        mesh=sc.mesh,
        k=k,
        tile_n=sc.tile_n,
    )


def pad_corpus_for_mesh(corpus, valid, dp: int):
    """Pad corpus rows to a multiple of the data-axis size."""
    n = corpus.shape[0]
    pad = (-n) % dp
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    return corpus, valid


def shard_corpus(corpus, valid, mesh: Mesh):
    """Place a (padded) corpus with rows sharded over the data axis."""
    cs = jax.device_put(corpus, NamedSharding(mesh, P(AXIS_DATA, None)))
    vs = jax.device_put(valid, NamedSharding(mesh, P(AXIS_DATA)))
    return cs, vs
