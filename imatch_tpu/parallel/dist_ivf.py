"""Mesh-sharded IVF — the ANN capacity tier past one chip's HBM.

Single-chip IVF (index/ivf.py) caps out where the corpus itself does:
10M x 512 bf16 is ~10 GB of a 16 GB chip. The mesh form row-shards the
corpus over the ``data`` axis and builds an INDEPENDENT IVF per shard
(per-shard k-means over N/P rows). A query probes every shard's index
concurrently under ``shard_map`` and all-gathers only k candidates per
shard — so per-chip HBM holds N/P rows + one small index, per-query ICI
traffic is k*P*(4+4) bytes (corpus-size independent, same as the exact
sharded engine), and capacity scales linearly with the mesh.

Recall note: P independent indexes probed with n_probe each is
effectively P*n_probe global probes — at equal n_probe the sharded form
scans a LARGER fraction than a global IVF, in parallel, so recall is at
least as good at unchanged latency. With n_probe >= clusters-per-shard
every shard scans everything and the result equals the exact sharded
engine bit-for-bit (pinned in tests/test_sharded_store.py).

The reference's ANN is one in-process hnswlib graph
(/root/reference/utils.py:129, backend/app/main.py:761) — no sharded
form exists to anchor semantics beyond the query contract itself.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from imatch_tpu.index import ivf as _ivf
from imatch_tpu.index.ivf import _ivf_probe_topk
from imatch_tpu.parallel.mesh import AXIS_DATA


class ShardedIVF(NamedTuple):
    """Per-shard IVF state, each array stacked on a leading shard axis
    sharded over ``data`` (device d holds block [d])."""

    centroids: jax.Array  # (P, C_max, D) fp32
    members: jax.Array  # (P, C_max, M_max) int32 LOCAL row ids, -1 pad
    corpus: jax.Array  # (P, N/P, D) storage dtype
    valid: jax.Array  # (P, N/P) bool
    nonempty: jax.Array  # (P, C_max) bool — padded clusters masked
    mesh: Mesh


def prepare_sharded_ivf(
    corpus,
    valid,
    *,
    mesh: Mesh,
    n_clusters: int = 0,
    seed: int = 0,
) -> ShardedIVF:
    """Row-shard the corpus and build one IVF per shard (full build)."""
    state, _ = prepare_sharded_ivf_incremental(
        corpus, valid, mesh=mesh, n_clusters=n_clusters, seed=seed
    )
    return state


def prepare_sharded_ivf_incremental(
    corpus,
    valid,
    *,
    mesh: Mesh,
    n_clusters: int = 0,
    seed: int = 0,
    snap: dict = None,
) -> Tuple[ShardedIVF, dict]:
    """Sharded IVF build with per-shard incremental repair.

    Shard boundaries are ranges of the CAPACITY-padded buffer the store
    hands us, so they stay stable between capacity growths — which makes
    the single-device repair trick (index/ivf.py, store._build_ivf)
    compose per shard: when ``snap`` (the previous build's host state)
    is structurally compatible and the live set grew less than
    IMATCH_IVF_REBUILD_FRAC, each shard only assigns its unassigned rows
    against its EXISTING centroids and re-packs member lists — no Lloyd
    runs. The store drops the host state on capacity growth or
    compaction (rows would cross shard boundaries, invalidating the
    per-shard assignments), so those rare events retrain.

    Shards are padded to equal cluster count / member width so the
    stacked arrays are rectangular; empty/padded clusters carry an
    all-False ``nonempty`` mask and never win probe slots.

    Returns ``(state, host_state)``; host_state is store-opaque and
    round-trips through the next call's ``snap``."""
    import os

    corpus = np.asarray(corpus)
    valid = np.asarray(valid, bool)
    dp = mesh.shape[AXIS_DATA]
    n = corpus.shape[0]
    pad = (-n) % dp
    if pad:
        corpus = np.pad(corpus, ((0, pad), (0, 0)))
        valid = np.pad(valid, (0, pad))
    rows = corpus.shape[0] // dp
    live = int(valid.sum())
    frac = float(os.environ.get("IMATCH_IVF_REBUILD_FRAC", "0.3"))

    try:
        repair = (
            snap is not None
            and snap.get("kind") == "ivf-sharded"
            and snap.get("dp") == dp
            and snap.get("rows") == rows
            and len(snap["cents"]) == dp
            and all(c.ndim == 2 for c in snap["cents"])
            and snap["cents"][0].shape[1] == corpus.shape[1]
            and live <= snap["built_live"] * (1.0 + frac)
            # probe 'assign' INSIDE the guard: the repair branch below
            # dereferences snap["assign"].shape, and a snap that is
            # valid except for a missing/non-ndarray assign must degrade
            # to retrain like every other malformed-state case
            and hasattr(snap["assign"], "shape")
            and snap["assign"].ndim == 1
        )
    except (KeyError, IndexError, AttributeError, TypeError):
        # malformed host state (e.g. a hand-edited sidecar): the probe
        # itself must degrade to retrain, same as a failing repair
        repair = False
    cents, membs, masks, fills = [], [], [], []
    if repair:
        assign = snap["assign"]
        if assign.shape[0] < corpus.shape[0]:
            assign = np.concatenate(
                [
                    assign,
                    np.full((corpus.shape[0] - assign.shape[0],), -1, np.int32),
                ]
            )
        else:
            # copy, not a view: the per-shard repair writes in place and
            # callers own their snap dict (the store passes a private
            # copy, but this is public API)
            assign = assign[: corpus.shape[0]].copy()
        assign[~valid] = -1  # dead slots: reused slots must repair
        built_live = snap["built_live"]
        cents = list(snap["cents"])
        try:
            for s in range(dp):
                sl = slice(s * rows, (s + 1) * rows)
                a_s, ok_s = assign[sl], valid[sl]
                fresh = np.nonzero((a_s == -1) & ok_s)[0]
                if fresh.size:
                    a_s[fresh] = _ivf.assign_rows(
                        corpus[sl][fresh], cents[s]
                    )
                m, counts = _ivf.pack_members(
                    a_s, ok_s, cents[s].shape[0]
                )
                membs.append(m)
                masks.append(counts > 0)
                fills.append(counts.astype(np.int64))
        except (IndexError, ValueError):
            # semantically-corrupt host state (e.g. a bad sidecar whose
            # assignments exceed a shard's cluster count) degrades to a
            # full per-shard retrain, never a poisoned serving path
            repair = False
            cents, membs, masks, fills = [], [], [], []
    if not repair:
        assign = np.full((corpus.shape[0],), -1, np.int32)
        built_live = live
        for s in range(dp):
            sl = slice(s * rows, (s + 1) * rows)
            c = np.asarray(
                _ivf.train_centroids(
                    corpus[sl], valid[sl], n_clusters=n_clusters, seed=seed + s
                ),
                np.float32,
            )
            a_s = _ivf.assign_rows(corpus[sl], c)
            assign[sl] = a_s
            m, counts = _ivf.pack_members(a_s, valid[sl], c.shape[0])
            cents.append(c)
            membs.append(m)
            masks.append(counts > 0)
            fills.append(counts.astype(np.int64))
        # the streamed argmax assigned EVERY slot — dead/padding rows
        # (zero vectors) landed in an arbitrary cluster; stamp them
        # unassigned so rows added into those slots later get repaired
        # into their true nearest cluster
        assign[~valid] = -1

    host = {
        "kind": "ivf-sharded",
        "cents": cents,
        "assign": assign,
        "built_live": built_live,
        "dp": dp,
        "rows": rows,
        # per-shard member-table fill, consumed by the incremental
        # append path (index/patch.py) to place new rows in O(batch)
        "counts": fills,
        "last_mode": "repair" if repair else "train",
    }
    c_max = max(c.shape[0] for c in cents)
    m_max = max(m.shape[1] for m in membs)
    cents = list(cents)  # don't pad the host-state copies in place
    for s in range(dp):
        c, m = cents[s], membs[s]
        masks[s] = np.pad(
            masks[s], (0, c_max - c.shape[0]), constant_values=False
        )
        cents[s] = np.pad(c, ((0, c_max - c.shape[0]), (0, 0)))
        membs[s] = np.pad(
            m,
            ((0, c_max - m.shape[0]), (0, m_max - m.shape[1])),
            constant_values=-1,
        )

    storage = corpus.dtype
    lead = lambda spec: NamedSharding(mesh, spec)  # noqa: E731
    state = ShardedIVF(
        centroids=jax.device_put(
            np.stack(cents), lead(P(AXIS_DATA, None, None))
        ),
        members=jax.device_put(
            np.stack(membs), lead(P(AXIS_DATA, None, None))
        ),
        # NO astype here: storage == corpus.dtype (set above), and the
        # cast forced a full host copy of the corpus (a second ~10-20 GB
        # buffer at the 10M-row scale this tier exists for) — reshape
        # alone is a view and device_put handles it
        corpus=jax.device_put(
            corpus.reshape(dp, rows, -1), lead(P(AXIS_DATA, None, None))
        ),
        valid=jax.device_put(
            valid.reshape(dp, rows), lead(P(AXIS_DATA, None))
        ),
        nonempty=jax.device_put(np.stack(masks), lead(P(AXIS_DATA, None))),
        mesh=mesh,
    )
    return state, host


@functools.partial(
    jax.jit, static_argnames=("k", "n_probe", "rescore_margin", "mesh")
)
def _sharded_ivf_topk(
    queries,
    centroids,
    members,
    corpus,
    valid,
    nonempty,
    *,
    mesh: Mesh,
    k: int,
    n_probe: int,
    rescore_margin: int,
):
    shard_rows = corpus.shape[1]

    def local(q, ce, me, co, va, ne):
        s, i = _ivf_probe_topk(
            q,
            ce[0],
            me[0],
            co[0],
            va[0],
            k=k,
            n_probe=n_probe,
            rescore_margin=rescore_margin,
            nonempty=ne[0],
        )
        shard = jax.lax.axis_index(AXIS_DATA)
        i = jnp.where(i >= 0, i + shard * shard_rows, -1)
        ss = jax.lax.all_gather(s, AXIS_DATA, axis=1, tiled=True)
        ii = jax.lax.all_gather(i, AXIS_DATA, axis=1, tiled=True)
        # ties break to the lower global index (chroma parity)
        order = jnp.argsort(jnp.where(ii < 0, jnp.iinfo(jnp.int32).max, ii))
        ss = jnp.take_along_axis(ss, order, axis=1)
        ii = jnp.take_along_axis(ii, order, axis=1)
        top_s, pos = jax.lax.top_k(ss, k)
        top_i = jnp.take_along_axis(ii, pos, axis=1)
        return top_s, top_i

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),
            P(AXIS_DATA, None, None),
            P(AXIS_DATA, None, None),
            P(AXIS_DATA, None, None),
            P(AXIS_DATA, None),
            P(AXIS_DATA, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, centroids, members, corpus, valid, nonempty)


def sharded_ivf_topk(
    queries,
    index: ShardedIVF,
    *,
    k: int,
    n_probe: int = 8,
    rescore_margin: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate global top-k against a prepared sharded IVF. Same
    contract as tilemax_topk: (Q, k) fp32 scores descending + GLOBAL
    int32 row indices into the unsharded corpus, -1 padded."""
    return _sharded_ivf_topk(
        jnp.asarray(queries, jnp.float32),
        index.centroids,
        index.members,
        index.corpus,
        index.valid,
        index.nonempty,
        mesh=index.mesh,
        k=k,
        n_probe=n_probe,
        rescore_margin=rescore_margin,
    )
