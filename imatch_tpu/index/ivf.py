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


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def _kmeans(corpus, valid, key, *, n_clusters, iters):
    n, d = corpus.shape
    # init: random valid rows (sampling with replacement is fine here)
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.sum(probs)
    idx = jax.random.choice(key, n, (n_clusters,), p=probs)
    cents = corpus[idx]
    cents = cents / jnp.maximum(
        jnp.linalg.norm(cents, axis=1, keepdims=True), 1e-9
    )
    big_neg = -1e30

    def step(_, cents):
        sims = jnp.einsum(
            "nd,cd->nc", corpus, cents, preferred_element_type=jnp.float32
        )
        sims = jnp.where(valid[:, None], sims, big_neg)
        assign = jnp.argmax(sims, axis=1)  # (N,)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)
        onehot = onehot * valid[:, None]
        sums = jnp.einsum(
            "nc,nd->cd", onehot, corpus, preferred_element_type=jnp.float32
        )
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cents)
        new = new / jnp.maximum(
            jnp.linalg.norm(new, axis=1, keepdims=True), 1e-9
        )
        return new

    cents = jax.lax.fori_loop(0, iters, step, cents)
    sims = jnp.einsum(
        "nd,cd->nc", corpus, cents, preferred_element_type=jnp.float32
    )
    assign = jnp.argmax(sims, axis=1)
    return cents, assign


def build_ivf(
    corpus,
    valid,
    *,
    n_clusters: int = 0,
    iters: int = 10,
    seed: int = 0,
) -> IVFIndex:
    """K-means build (device matmuls) + host member-list packing."""
    corpus = jnp.asarray(corpus, jnp.float32)
    valid = jnp.asarray(valid, bool)
    n = corpus.shape[0]
    if n_clusters <= 0:
        n_clusters = max(1, min(n, int(4 * np.sqrt(max(n, 1)))))
    n_clusters = min(n_clusters, n)
    cents, assign = _kmeans(
        corpus, valid, jax.random.key(seed), n_clusters=n_clusters, iters=iters
    )
    assign = np.asarray(assign)
    ok = np.asarray(valid)
    lists = [[] for _ in range(n_clusters)]
    for i in np.nonzero(ok)[0]:
        lists[assign[i]].append(i)
    m = max(1, max(len(l) for l in lists))
    members = np.full((n_clusters, m), -1, np.int32)
    for c, l in enumerate(lists):
        members[c, : len(l)] = l
    return IVFIndex(cents, jnp.asarray(members), corpus, valid)


@functools.partial(jax.jit, static_argnames=("k", "n_probe"))
def ivf_topk(
    queries: jax.Array, index: IVFIndex, *, k: int, n_probe: int = 8
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k: probe ``n_probe`` clusters, exact fp32 rescore.

    Same return contract as search.tilemax_topk (-1/-inf padding; ties
    break to the lower row index).
    """
    q32 = queries.astype(jnp.float32)
    nq = q32.shape[0]
    c, m = index.members.shape
    n_probe = min(n_probe, c)

    csims = jnp.einsum(
        "qd,cd->qc",
        q32,
        index.centroids,
        preferred_element_type=jnp.float32,
    )
    _, probe = jax.lax.top_k(csims, n_probe)  # (Q, n_probe)

    def one(q, clusters):
        ids = index.members[clusters].reshape(n_probe * m)  # (P*M,)
        safe = jnp.maximum(ids, 0)
        rows = index.corpus[safe]
        ok = jnp.logical_and(ids >= 0, index.valid[safe])
        s = jnp.einsum(
            "nd,d->n",
            rows,
            q,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(ok, s, NEG_INF)
        # lower-index tie-break (chroma parity): order by id first
        order = jnp.argsort(jnp.where(ids < 0, jnp.iinfo(jnp.int32).max, ids))
        s, ids_o = s[order], ids[order]
        kk = min(k, n_probe * m)
        ts, pos = jax.lax.top_k(s, kk)
        ti = jnp.where(ts <= NEG_INF / 2, -1, ids_o[pos])
        if kk < k:
            ts = jnp.pad(ts, (0, k - kk), constant_values=NEG_INF)
            ti = jnp.pad(ti, (0, k - kk), constant_values=-1)
        return ts, ti

    return jax.vmap(one)(q32, probe)
