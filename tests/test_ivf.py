"""IVF-flat ANN: recall on clustered data, exactness at full probe,
tombstones, padding contract."""

import jax.numpy as jnp
import numpy as np
import pytest

from imatch_tpu.index.ivf import build_ivf, ivf_topk


def norm_rows(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def clustered_corpus(n_clusters=64, per=50, d=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = norm_rows(rng.standard_normal((n_clusters, d)))
    pts = centers.repeat(per, axis=0) + 0.15 * rng.standard_normal(
        (n_clusters * per, d)
    )
    return norm_rows(pts).astype(np.float32)


def test_ivf_recall_on_clustered_data():
    corpus = clustered_corpus()
    n = len(corpus)
    valid = np.ones(n, bool)
    idx = build_ivf(corpus, valid, n_clusters=64, seed=1)
    rng = np.random.default_rng(2)
    q_ids = rng.integers(0, n, 20)
    queries = jnp.asarray(corpus[q_ids])
    s, i = ivf_topk(queries, idx, k=10, n_probe=8)
    i = np.asarray(i)
    ref = corpus @ corpus.T
    recalls = []
    for row, qi in enumerate(q_ids):
        true = set(np.argsort(-ref[qi], kind="stable")[:10].tolist())
        got = set(x for x in i[row].tolist() if x >= 0)
        recalls.append(len(true & got) / 10)
    assert np.mean(recalls) >= 0.95, np.mean(recalls)
    # self-match always found (its own cluster is probed first)
    assert (i[:, 0] == q_ids).all()


def test_ivf_full_probe_is_exact():
    rng = np.random.default_rng(3)
    corpus = norm_rows(rng.standard_normal((500, 16)).astype(np.float32))
    valid = np.ones(500, bool)
    valid[77] = False
    idx = build_ivf(corpus, valid, n_clusters=16, seed=0)
    queries = jnp.asarray(corpus[:6])
    s, i = ivf_topk(queries, idx, k=12, n_probe=16)  # probe everything
    ref = corpus.astype(np.float64) @ corpus.astype(np.float64).T
    ref[:, 77] = -np.inf
    for qi in range(6):
        order = np.argsort(-ref[qi], kind="stable")[:12]
        assert np.asarray(i[qi]).tolist() == order.tolist()
        np.testing.assert_allclose(
            np.asarray(s[qi]), ref[qi][order], atol=1e-5
        )
    assert 77 not in np.asarray(i)


def test_ivf_sampled_training_and_bf16_storage():
    """The scalable build path: centroids trained on a row sample
    (chunked Lloyd, no (N, C) temporaries), bf16 corpus storage with
    fp32 rescore — the 10M-row capacity configuration, exercised small."""
    corpus = clustered_corpus(n_clusters=32, per=40, d=32, seed=5)
    n = len(corpus)
    idx = build_ivf(
        jnp.asarray(corpus, jnp.bfloat16),
        np.ones(n, bool),
        n_clusters=32,
        seed=1,
        sample=256,  # < n: forces the sampled-training path
        chunk=128,
    )
    assert idx.corpus.dtype == jnp.bfloat16
    # member packing: every valid row exactly once
    m = np.asarray(idx.members)
    flat = m[m >= 0]
    assert len(flat) == n and len(set(flat.tolist())) == n
    rng = np.random.default_rng(6)
    q_ids = rng.integers(0, n, 16)
    s, i = ivf_topk(jnp.asarray(corpus[q_ids]), idx, k=10, n_probe=8)
    i = np.asarray(i)
    ref = corpus @ corpus.T
    recalls = []
    for row, qi in enumerate(q_ids):
        true = set(np.argsort(-ref[qi], kind="stable")[:10].tolist())
        recalls.append(len(true & set(i[row].tolist())) / 10)
    assert np.mean(recalls) >= 0.9, np.mean(recalls)
    assert (i[:, 0] == q_ids).all()  # self-match survives bf16 storage


def test_ivf_small_corpus_padding():
    rng = np.random.default_rng(4)
    corpus = norm_rows(rng.standard_normal((5, 8)).astype(np.float32))
    idx = build_ivf(corpus, np.ones(5, bool), n_clusters=2)
    s, i = ivf_topk(jnp.asarray(corpus[:1]), idx, k=10, n_probe=2)
    i = np.asarray(i)[0]
    assert i[0] == 0
    assert (i[5:] == -1).all()


def test_ivf_capacity_padded_store_corpus():
    """Regression: the VectorStore hands build_ivf its capacity-padded
    buffer (e.g. 6 live rows in 1024 slots). Cluster count must derive
    from LIVE rows and empty clusters must be pruned — before the fix,
    probe slots went to empty clusters' junk centroids and a
    low-similarity query (text vs image embeddings) could return ZERO
    results from a populated index."""
    rng = np.random.default_rng(11)
    live = norm_rows(rng.standard_normal((6, 16)).astype(np.float32))
    cap = 1024
    emb = np.zeros((cap, 16), np.float32)
    emb[:6] = live
    alive = np.zeros(cap, bool)
    alive[:6] = True
    idx = build_ivf(emb, alive)
    # clusters sized by the 6 live rows, all non-empty after pruning
    assert idx.members.shape[0] <= 6
    assert (np.asarray(idx.members) >= 0).any(axis=1).all()
    # a far-away query (the text-vs-image modality gap) still sees every
    # live row once probes cover all real clusters
    q = norm_rows(rng.standard_normal((1, 16)).astype(np.float32))
    s, i = ivf_topk(jnp.asarray(q), idx, k=6, n_probe=8)
    got = set(np.asarray(i)[0].tolist()) - {-1}
    assert got == set(range(6)), got
    # ordering matches the exact fp32 ranking
    exact = np.argsort(-(q @ live.T)[0], kind="stable")
    assert np.asarray(i)[0].tolist() == exact.tolist()


def test_ivf_engine_through_store():
    """The store's ivf engine end-to-end on a tiny corpus: results must
    match the default exact engine (same ids, same distances)."""
    from imatch_tpu.index.store import VectorStore

    rng = np.random.default_rng(12)
    e = norm_rows(rng.standard_normal((6, 8)).astype(np.float32))
    ids = [f"i{j}" for j in range(6)]
    exact = VectorStore(dim=8, engine="tilemax")
    approx = VectorStore(dim=8, engine="ivf")
    for st in (exact, approx):
        st.add(ids=ids, embeddings=e)
    q = norm_rows(rng.standard_normal((2, 8)).astype(np.float32))
    r_e = exact.query(query_embeddings=q, n_results=4)
    r_a = approx.query(query_embeddings=q, n_results=4)
    assert r_a["ids"] == r_e["ids"]
    np.testing.assert_allclose(
        r_a["distances"], r_e["distances"], atol=1e-5
    )


def test_train_centroids_on_deletion_heavy_capacity_buffer():
    """Uniform-over-capacity sampling trained k-means mostly on dead
    zero rows when live << capacity (mass deletion on a capacity-padded
    store), degenerating the centroids — the sample must come from LIVE
    slots."""
    import numpy as np

    from imatch_tpu.index.ivf import assign_rows, train_centroids

    rng = np.random.default_rng(5)
    n, d, live_n = 4096, 32, 128
    corpus = np.zeros((n, d), np.float32)
    valid = np.zeros((n,), bool)
    # live rows clustered around 4 distinct centers, scattered over slots
    centers = rng.standard_normal((4, d)).astype(np.float32) * 3
    slots = rng.choice(n, live_n, replace=False)
    for j, s in enumerate(slots):
        corpus[s] = centers[j % 4] + rng.standard_normal(d) * 0.05
        valid[s] = True
    cents = np.asarray(
        train_centroids(corpus, valid, n_clusters=4, sample=256)
    )
    # centroids must be trained on live data: non-degenerate (not the
    # dead-row zeros) and separating the 4 latent clusters
    assert np.linalg.norm(cents, axis=1).min() > 0.5
    assign = assign_rows(corpus[slots], cents)
    assert len(set(assign.tolist())) >= 3
