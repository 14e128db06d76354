"""IVF-flat approximate index — the optional ANN tier.

The reference's ANN is chroma's hnswlib graph (SURVEY.md §2.2). A graph
walk is a pointer-chasing workload the TPU hates; the TPU-shaped
equivalent is IVF: k-means cluster the corpus (pure matmul Lloyd
iterations on the MXU), keep per-cluster member lists, and at query time
score the C centroids, probe the best ``n_probe`` clusters, and exactly
rescore just their members in fp32 — per-query HBM reads drop from O(N)
to O(n_probe * N / C), which is what matters beyond ~10M rows. The
default exact tile-max path (search.py) stays the accuracy reference;
IVF trades recall (tested >=95% @ n_probe=8/64 on clustered data, exact
when n_probe == C) for that read reduction.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-3.0e38)


class IVFIndex(NamedTuple):
    centroids: jax.Array  # (C, D) fp32, L2-normalized
    members: jax.Array  # (C, M) int32 row ids, -1 padding
    corpus: jax.Array  # (N, D) fp32 (the exact vectors)
    valid: jax.Array  # (N,) bool


def _pad_chunks(x, chunk, fill=0):
    n = x.shape[0]
    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    if pad:
        width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        x = jnp.pad(x, width, constant_values=fill)
    return x.reshape((n_chunks, chunk) + x.shape[1:])


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters", "chunk"))
def _kmeans_chunked(train, tvalid, key, *, n_clusters, iters, chunk):
    """Lloyd iterations streamed over row chunks: sims + per-chunk
    one-hot accumulation stay (chunk, C)-sized, never (N, C) — MXU
    matmuls, no scatter. ``train`` may be bf16 (capacity corpora);
    accumulation is fp32."""
    n, d = train.shape
    probs = tvalid.astype(jnp.float32)
    probs = probs / jnp.sum(probs)
    idx = jax.random.choice(key, n, (n_clusters,), p=probs)
    cents = train[idx].astype(jnp.float32)
    cents = cents / jnp.maximum(
        jnp.linalg.norm(cents, axis=1, keepdims=True), 1e-9
    )
    rows_c = _pad_chunks(train, chunk)
    ok_c = _pad_chunks(tvalid, chunk)

    def lloyd(_, cents):
        cb = cents.astype(train.dtype)

        def step(carry, xs):
            sums, counts = carry
            rows, ok = xs
            sims = jnp.einsum(
                "nd,cd->nc", rows, cb, preferred_element_type=jnp.float32
            )
            assign = jnp.argmax(
                jnp.where(ok[:, None], sims, -jnp.inf), axis=1
            )
            onehot = jax.nn.one_hot(assign, n_clusters, dtype=train.dtype)
            onehot = onehot * ok[:, None].astype(train.dtype)
            sums = sums + jnp.einsum(
                "nc,nd->cd", onehot, rows, preferred_element_type=jnp.float32
            )
            counts = counts + jnp.sum(
                onehot.astype(jnp.float32), axis=0
            )
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            step,
            (
                jnp.zeros((n_clusters, d), jnp.float32),
                jnp.zeros((n_clusters,), jnp.float32),
            ),
            (rows_c, ok_c),
        )
        counts = counts[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cents)
        return new / jnp.maximum(
            jnp.linalg.norm(new, axis=1, keepdims=True), 1e-9
        )

    return jax.lax.fori_loop(0, iters, lloyd, cents)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _assign_chunked(corpus, cents, *, chunk):
    """argmax cluster id per row, streamed — assignment only, no stats."""
    rows_c = _pad_chunks(corpus, chunk)
    cb = cents.astype(corpus.dtype)

    def step(_, rows):
        sims = jnp.einsum(
            "nd,cd->nc", rows, cb, preferred_element_type=jnp.float32
        )
        return None, jnp.argmax(sims, axis=1).astype(jnp.int32)

    _, assign = jax.lax.scan(step, None, rows_c)
    return assign.reshape(-1)[: corpus.shape[0]]


def _coerce_corpus(corpus, valid):
    corpus = jnp.asarray(corpus)
    if corpus.dtype not in (jnp.float32, jnp.bfloat16):
        corpus = corpus.astype(jnp.float32)
    return corpus, jnp.asarray(valid, bool)


def train_centroids(
    corpus,
    valid,
    *,
    n_clusters: int = 0,
    iters: int = 10,
    seed: int = 0,
    sample: int = 1 << 18,
    chunk: int = 8192,
) -> jax.Array:
    """K-means training stage alone: (C, D) fp32 L2-normalized
    centroids, UNPRUNED (every requested cluster present, so row
    assignments index a stable [0, C) space that survives later
    incremental repairs — pruning happens per-build in :func:`pack_ivf`).
    Trains on a <=``sample``-row subset via chunked Lloyd iterations;
    nothing (N, C)-sized ever materializes."""
    corpus, valid = _coerce_corpus(corpus, valid)
    n = corpus.shape[0]
    # size clusters by LIVE rows, not array capacity: the store hands us
    # its capacity-padded buffer (e.g. 6 live rows in a 1024-slot
    # array), and sqrt-of-capacity would scatter a handful of rows over
    # a hundred clusters
    n_live = int(jnp.sum(valid))
    if n_clusters <= 0:
        base = max(n_live, 1)
        n_clusters = max(1, min(base, int(4 * np.sqrt(base))))
    n_clusters = min(n_clusters, n)
    key_s, key_k = jax.random.split(jax.random.key(seed))
    if n > sample:
        # sample LIVE slots (with replacement — duplicate rows are
        # harmless for Lloyd). Uniform-over-capacity sampling trained
        # mostly on dead zero rows after mass deletion on a capacity-
        # padded buffer (live << capacity), degenerating the centroids;
        # weighting by liveness keeps the training set all-live.
        live_idx = np.flatnonzero(np.asarray(valid))
        if live_idx.size:
            sel = np.asarray(
                jax.random.randint(key_s, (sample,), 0, live_idx.size)
            )
            idx = live_idx[sel]
        else:
            idx = jax.random.randint(key_s, (sample,), 0, n)
        train, tvalid = corpus[idx], valid[idx]
    else:
        train, tvalid = corpus, valid
    return _kmeans_chunked(
        train, tvalid, key_k, n_clusters=n_clusters, iters=iters, chunk=chunk
    )


def assign_rows(rows, cents, *, chunk: int = 8192) -> np.ndarray:
    """Nearest-centroid id per row (host int32). ``rows`` may be any
    subset of the corpus — this is the incremental-add stage: new rows
    join the index by one streamed argmax pass against the EXISTING
    centroids (the FAISS IVF add discipline) instead of re-clustering
    the corpus."""
    rows = jnp.asarray(rows)
    if rows.dtype not in (jnp.float32, jnp.bfloat16):
        rows = rows.astype(jnp.float32)
    if rows.shape[0] == 0:
        return np.zeros((0,), np.int32)
    # np.array (copy), not np.asarray: a numpy view of a jax buffer is
    # read-only, and callers mutate assignment tables in place
    return np.array(_assign_chunked(rows, cents, chunk=chunk))


def member_slack(max_count: int) -> int:
    """Headroom columns appended to the member table so incremental
    appends (index/patch.py) can scatter new rows into existing clusters
    without a repack: 25% of the deepest cluster, at least 16. Costs
    C * slack int32s of HBM (~4 MB at 1M rows) and buys O(batch)
    mutations between rebuilds."""
    return max(16, -(-max_count // 4))


def pack_members(
    assign: np.ndarray, ok: np.ndarray, n_clusters: int, slack=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized member-list scatter: live rows into a (C, M) padded
    int32 table (M = deepest cluster + ``slack`` append headroom;
    ``slack=None`` sizes it internally via :func:`member_slack` — the
    histogram is already in hand here, so callers need not pay a second
    O(N) bincount through :func:`counts_max`). Returns (members,
    per-cluster counts). Shared by the single-device pack and the
    per-shard pack in parallel/dist_ivf.py. Rows within a cluster ascend
    by row id — the incremental append (index/patch.py) relies on this
    to place new (highest-id) rows at the fill point and stay
    list-identical to a repack."""
    rows = np.nonzero(ok)[0].astype(np.int64)
    a = assign[rows]
    order = np.argsort(a, kind="stable")
    rows_sorted = rows[order].astype(np.int32)
    a_sorted = a[order]
    counts = np.bincount(a, minlength=n_clusters)
    max_count = int(counts.max()) if counts.size else 1
    if slack is None:
        slack = member_slack(max(1, max_count))
    m = max(1, max_count + slack)
    starts = np.cumsum(counts) - counts
    pos = np.arange(len(rows_sorted)) - np.repeat(starts, counts)
    members = np.full((n_clusters, m), -1, np.int32)
    members[a_sorted, pos] = rows_sorted
    return members, counts


def pack_ivf(corpus, valid, cents, assign: np.ndarray) -> IVFIndex:
    """Member-list pack: vectorized numpy scatter of live rows into a
    (C, M) padded table, then empty-cluster prune. ``assign`` indexes
    the UNPRUNED centroid space; the returned IVFIndex carries the
    pruned view (probe matmul only sees clusters that can contribute)."""
    index, _ = pack_ivf_stats(corpus, valid, cents, assign)
    return index


def pack_ivf_stats(
    corpus, valid, cents, assign: np.ndarray
) -> Tuple[IVFIndex, dict]:
    """:func:`pack_ivf` plus the host-side bookkeeping the incremental
    append path (index/patch.py) needs to scatter future rows straight
    into the packed table:

    - ``counts``: (C_pruned,) per-cluster fill of the member table;
    - ``pruned_map``: (C_unpruned,) int32 mapping unpruned cluster ids
      (the ``assign`` space) to pruned member-table rows, -1 where the
      cluster was pruned out.
    """
    corpus, valid = _coerce_corpus(corpus, valid)
    cents = jnp.asarray(cents, jnp.float32)
    n_clusters = cents.shape[0]
    ok = np.asarray(valid)
    members, counts = pack_members(assign, ok, n_clusters)
    # prune empty clusters: their centroids are k-means leftovers
    # (random-init positions, dead-row artifacts) that would compete
    # for probe slots against real clusters — on a near-empty
    # capacity-padded corpus a query's every probe could land on one
    # and return nothing. Pruning also shrinks the (Q, C) probe matmul
    # to the clusters that can possibly contribute.
    nonempty = np.nonzero(counts > 0)[0]
    pruned_map = np.full((n_clusters,), -1, np.int32)
    if nonempty.size and nonempty.size < n_clusters:
        members = members[nonempty]
        cents = cents[jnp.asarray(nonempty, dtype=jnp.int32)]
        pruned_map[nonempty] = np.arange(nonempty.size, dtype=np.int32)
        counts = counts[nonempty]
    elif not nonempty.size:
        members = members[:1]
        cents = cents[:1]
        counts = counts[:1]
    else:
        pruned_map[:] = np.arange(n_clusters, dtype=np.int32)
    stats = {"counts": counts.astype(np.int64), "pruned_map": pruned_map}
    return IVFIndex(cents, jnp.asarray(members), corpus, valid), stats


def build_ivf(
    corpus,
    valid,
    *,
    n_clusters: int = 0,
    iters: int = 10,
    seed: int = 0,
    sample: int = 1 << 18,
    chunk: int = 8192,
) -> IVFIndex:
    """Scalable k-means build: train centroids on a <=``sample``-row
    subset (chunked Lloyd — nothing (N, C)-sized ever materializes),
    assign all rows in a streamed argmax pass, pack member lists with
    vectorized numpy. ``corpus`` keeps its dtype on device — pass bf16
    for 10M-row capacity corpora whose fp32 copy exceeds HBM; the query
    rescore upcasts to fp32 either way.

    Composition of the three stages the incremental path reuses:
    :func:`train_centroids` + :func:`assign_rows` + :func:`pack_ivf`."""
    corpus, valid = _coerce_corpus(corpus, valid)
    cents = train_centroids(
        corpus,
        valid,
        n_clusters=n_clusters,
        iters=iters,
        seed=seed,
        sample=sample,
        chunk=chunk,
    )
    assign = assign_rows(corpus, cents, chunk=chunk)
    return pack_ivf(corpus, valid, cents, assign)


@functools.partial(
    jax.jit, static_argnames=("k", "n_probe", "rescore_margin")
)
def ivf_topk(
    queries: jax.Array,
    index: IVFIndex,
    *,
    k: int,
    n_probe: int = 8,
    rescore_margin: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k: probe ``n_probe`` clusters, two-phase rescore.

    Phase 1 scores every probed member in the corpus's STORAGE dtype
    (bf16 MXU passes on capacity corpora, fp32 otherwise) and keeps
    top-(k + rescore_margin); phase 2 rescores just those survivors in
    fp32 HIGHEST — the same bf16-select/fp32-rescore scheme as
    search.tilemax_topk, so final ordering matches the exact engines.
    Queries run through ``lax.map``, so peak HBM is ONE query's
    (n_probe * max_cluster, D) gather — not the whole batch's (the vmap
    form OOMed at 10M x 512: an 8-query batch materialized a 4.8 GB
    fp32 temp on top of the 9.8 GB corpus).

    Same return contract as search.tilemax_topk (-1/-inf padding; ties
    break to the lower row index).
    """
    return _ivf_probe_topk(
        queries.astype(jnp.float32),
        index.centroids,
        index.members,
        index.corpus,
        index.valid,
        k=k,
        n_probe=n_probe,
        rescore_margin=rescore_margin,
    )


def _ivf_probe_topk(
    q32,
    centroids,
    members,
    corpus,
    valid,
    *,
    k: int,
    n_probe: int,
    rescore_margin: int,
    nonempty=None,
):
    """Shared probe + two-phase rescore core: used by the single-device
    ivf_topk and by the per-shard body of the mesh-sharded engine
    (parallel/dist_ivf.py). ``nonempty``: optional (C,) mask — clusters
    padded in across shards must never win probe slots."""
    c, m = members.shape
    n_probe = min(n_probe, c)
    cand = n_probe * m
    kk = min(k + rescore_margin, cand)
    big = jnp.iinfo(jnp.int32).max

    csims = jnp.einsum(
        "qd,cd->qc",
        q32,
        centroids,
        preferred_element_type=jnp.float32,
    )
    if nonempty is not None:
        csims = jnp.where(nonempty[None, :], csims, NEG_INF)
    _, probe = jax.lax.top_k(csims, n_probe)  # (Q, n_probe)

    def one(args):
        q, clusters = args
        ids = members[clusters].reshape(cand)  # (P*M,)
        safe = jnp.maximum(ids, 0)
        rows = corpus[safe]  # storage dtype — no fp32 blow-up
        ok = jnp.logical_and(ids >= 0, valid[safe])
        s1 = jnp.einsum(
            "nd,d->n",
            rows,
            q.astype(rows.dtype),
            preferred_element_type=jnp.float32,
        )
        s1 = jnp.where(ok, s1, NEG_INF)
        # lower-index tie-break (chroma parity): order by id first
        order = jnp.argsort(jnp.where(ok, ids, big))
        s1, ids_o = s1[order], ids[order]
        ts1, pos1 = jax.lax.top_k(s1, kk)
        cid = jnp.where(ts1 <= NEG_INF / 2, -1, ids_o[pos1])
        # phase 2: fp32 HIGHEST rescore of the k+margin survivors only
        crows = corpus[jnp.maximum(cid, 0)].astype(jnp.float32)
        s2 = jnp.einsum(
            "nd,d->n",
            crows,
            q,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        s2 = jnp.where(cid >= 0, s2, NEG_INF)
        order2 = jnp.argsort(jnp.where(cid >= 0, cid, big))
        s2, cid_o = s2[order2], cid[order2]
        kf = min(k, kk)
        ts, pos = jax.lax.top_k(s2, kf)
        ti = jnp.where(ts <= NEG_INF / 2, -1, cid_o[pos])
        if kf < k:
            ts = jnp.pad(ts, (0, k - kf), constant_values=NEG_INF)
            ti = jnp.pad(ti, (0, k - kf), constant_values=-1)
        return ts, ti

    return jax.lax.map(one, (q32, probe))
