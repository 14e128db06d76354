"""Vector index: exact ordering parity vs numpy brute force (the
ChromaDB-equivalent ordering gate from BASELINE.md), store semantics,
tombstones, persistence."""

import numpy as np
import pytest

import jax.numpy as jnp

from imatch_tpu.index.search import cosine_topk
from imatch_tpu.index.store import VectorStore


def norm_rows(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.parametrize("n,q,k,chunk", [(1000, 4, 10, 256), (100, 1, 200, 64), (5000, 8, 50, 4096), (3, 2, 10, 256)])
def test_cosine_topk_matches_numpy(n, q, k, chunk):
    rng = np.random.default_rng(0)
    corpus = norm_rows(rng.standard_normal((n, 64)).astype(np.float32))
    queries = norm_rows(rng.standard_normal((q, 64)).astype(np.float32))
    valid = np.ones(n, dtype=bool)
    scores, idx = cosine_topk(
        jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(valid), k=k, chunk=chunk
    )
    scores, idx = np.asarray(scores), np.asarray(idx)
    ref = queries.astype(np.float64) @ corpus.astype(np.float64).T
    kk = min(k, n)
    for i in range(q):
        order = np.argsort(-ref[i], kind="stable")[:kk]
        assert idx[i, :kk].tolist() == order.tolist()
        np.testing.assert_allclose(scores[i, :kk], ref[i][order], atol=1e-5)
        # padding slots
        assert (idx[i, kk:] == -1).all()


def test_cosine_topk_respects_mask():
    rng = np.random.default_rng(1)
    corpus = norm_rows(rng.standard_normal((50, 16)).astype(np.float32))
    queries = corpus[:2]
    valid = np.ones(50, dtype=bool)
    valid[0] = False  # exact match of query 0 is masked out
    scores, idx = cosine_topk(
        jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(valid), k=5
    )
    assert 0 not in np.asarray(idx)[0]
    assert np.asarray(idx)[1][0] == 1  # query 1 still finds itself


def make_store(n=100, dim=32, seed=0, persist_dir=None):
    rng = np.random.default_rng(seed)
    emb = norm_rows(rng.standard_normal((n, dim)).astype(np.float32))
    store = VectorStore(persist_dir=persist_dir)
    store.add(
        ids=[f"img_{i:04d}" for i in range(n)],
        embeddings=emb,
        metadatas=[{"i": i} for i in range(n)],
        documents=[f"doc {i}" for i in range(n)],
    )
    return store, emb


def test_store_add_get_count():
    store, emb = make_store()
    assert store.count() == 100
    got = store.get(ids=["img_0003", "img_0042", "missing"])
    assert got["ids"] == ["img_0003", "img_0042"]
    assert got["metadatas"][1] == {"i": 42}
    all_ids = store.get(include=[])["ids"]
    assert len(all_ids) == 100
    with pytest.raises(ValueError):
        store.add(ids=["img_0003"], embeddings=emb[:1])


def test_store_query_chroma_shape_and_distance():
    store, emb = make_store()
    res = store.query(query_embeddings=[emb[7]], n_results=5)
    assert res["ids"][0][0] == "img_0007"
    # chroma cosine distance of an exact match is ~0
    assert abs(res["distances"][0][0]) < 1e-5
    assert res["metadatas"][0][0] == {"i": 7}
    # ascending distances
    d = res["distances"][0]
    assert d == sorted(d)
    # similarity mapping used by the reference API: 1 - d/2 in [0, 1]
    sims = [1 - x / 2 for x in d]
    assert all(0 <= s <= 1.0000001 for s in sims)


def test_store_query_ordering_matches_numpy():
    store, emb = make_store(n=500)
    rng = np.random.default_rng(3)
    q = norm_rows(rng.standard_normal((1, 32)).astype(np.float32))[0]
    res = store.query(query_embeddings=[q], n_results=20)
    ref = np.argsort(-(emb.astype(np.float64) @ q), kind="stable")[:20]
    assert res["ids"][0] == [f"img_{i:04d}" for i in ref]


def test_store_update_delete_tombstone_query():
    store, emb = make_store()
    store.update(ids=["img_0001"], metadatas=[{"i": 1, "tag": "x"}])
    assert store.get(ids=["img_0001"])["metadatas"][0]["tag"] == "x"
    store.delete(ids=["img_0007"])
    assert store.count() == 99
    res = store.query(query_embeddings=[emb[7]], n_results=3)
    assert "img_0007" not in res["ids"][0]
    # re-point embedding of another record onto emb[7]
    store.update(ids=["img_0002"], embeddings=[emb[7]])
    res = store.query(query_embeddings=[emb[7]], n_results=1)
    assert res["ids"][0] == ["img_0002"]


def test_store_update_unknown_id_is_atomic(tmp_path):
    """An unknown id ANYWHERE in the batch must leave the store
    untouched — a partial apply would mutate the host mirror/journal
    for earlier rows while the cached device index keeps serving their
    old vectors (live serving and a restart would disagree)."""
    store, emb = make_store(n=50, persist_dir=str(tmp_path))
    q = emb[3]
    before = store.query(query_embeddings=[q], n_results=5)
    new = norm_rows(
        np.random.default_rng(7).standard_normal((2, 32)).astype(np.float32)
    )
    with pytest.raises(KeyError):
        store.update(
            ids=["img_0003", "img_9999"],
            embeddings=[new[0], new[1]],
            metadatas=[{"t": 1}, {"t": 2}],
        )
    # img_0003 keeps its original vector/metadata everywhere
    assert store.get(ids=["img_0003"])["metadatas"][0] == {"i": 3}
    after = store.query(query_embeddings=[q], n_results=5)
    assert before["ids"] == after["ids"]
    np.testing.assert_allclose(
        before["distances"], after["distances"], atol=1e-6
    )
    reloaded = VectorStore.load(str(tmp_path))
    np.testing.assert_allclose(
        reloaded.query(query_embeddings=[q], n_results=5)["distances"],
        before["distances"],
        atol=1e-6,
    )


def test_store_compaction_preserves_results():
    store, emb = make_store(n=2048)
    victims = [f"img_{i:04d}" for i in range(2, 1202)]
    store.delete(victims)  # > half dead -> compaction
    assert store.count() == 2048 - 1200
    res = store.query(query_embeddings=[emb[1]], n_results=1)
    assert res["ids"][0] == ["img_0001"]


def test_store_empty_query():
    store = VectorStore()
    res = store.query(query_embeddings=[[0.0, 1.0]], n_results=5)
    assert res["ids"] == [[]]


def test_save_load_roundtrip(tmp_path):
    store, emb = make_store(n=64)
    store.delete(["img_0000"])
    store.save(str(tmp_path))
    loaded = VectorStore.load(str(tmp_path))
    assert loaded.count() == 63
    res = store.query(query_embeddings=[emb[5]], n_results=3)
    res2 = loaded.query(query_embeddings=[emb[5]], n_results=3)
    assert res["ids"] == res2["ids"]
    np.testing.assert_allclose(res["distances"], res2["distances"], atol=1e-6)


def test_load_missing_dir_is_empty(tmp_path):
    store = VectorStore.load(str(tmp_path / "nope"))
    assert store.count() == 0


# ---------------------------------------------------------------------------
# tilemax_topk — the prepared two-phase fast path (store's hot query path)
# ---------------------------------------------------------------------------

from imatch_tpu.index.search import prepare_device_corpus, tilemax_topk


@pytest.mark.parametrize(
    "n,q,k,tile_n", [(1000, 4, 10, 256), (100, 1, 200, 64), (5000, 8, 50, 512), (3, 2, 10, 256)]
)
def test_tilemax_topk_matches_numpy(n, q, k, tile_n):
    rng = np.random.default_rng(0)
    corpus = norm_rows(rng.standard_normal((n, 64)).astype(np.float32))
    queries = norm_rows(rng.standard_normal((q, 64)).astype(np.float32))
    valid = np.ones(n, dtype=bool)
    dc = prepare_device_corpus(
        jnp.asarray(corpus),
        jnp.asarray(valid),
        tile_n=tile_n,
        score_dtype=jnp.float32,
    )
    scores, idx = tilemax_topk(jnp.asarray(queries), dc, k=k)
    scores, idx = np.asarray(scores), np.asarray(idx)
    ref = queries.astype(np.float64) @ corpus.astype(np.float64).T
    kk = min(k, n)
    for i in range(q):
        order = np.argsort(-ref[i], kind="stable")[:kk]
        assert idx[i, :kk].tolist() == order.tolist()
        np.testing.assert_allclose(scores[i, :kk], ref[i][order], atol=1e-5)
        assert (idx[i, kk:] == -1).all()


def test_tilemax_topk_mask_and_duplicates():
    rng = np.random.default_rng(3)
    base = norm_rows(rng.standard_normal((40, 32)).astype(np.float32))
    corpus = np.concatenate([base, base[:10]])  # rows 40..49 duplicate 0..9
    valid = np.ones((50,), bool)
    valid[5] = False  # tombstone: its duplicate at 45 must surface instead
    dc = prepare_device_corpus(
        jnp.asarray(corpus), jnp.asarray(valid), tile_n=16,
        score_dtype=jnp.float32,
    )
    s, i = tilemax_topk(jnp.asarray(corpus[:8]), dc, k=3)
    i = np.asarray(i)
    # Self-match resolves to the lowest-index live duplicate.
    expected_first = [0, 1, 2, 3, 4, 45, 6, 7]
    assert i[:, 0].tolist() == expected_first


def test_tilemax_topk_int8_scoring():
    """int8-quantized phase-1 scoring: final scores are exact fp32 and the
    returned set matches the fp32 reference (tile selection quantized)."""
    rng = np.random.default_rng(7)
    n, d, q, k = 4000, 64, 4, 10
    corpus = norm_rows(rng.standard_normal((n, d)).astype(np.float32))
    queries = jnp.asarray(corpus[:q])
    valid = np.ones(n, bool)
    dc8 = prepare_device_corpus(
        jnp.asarray(corpus), jnp.asarray(valid), tile_n=256,
        score_dtype=jnp.int8,
    )
    assert dc8.scoring.dtype == jnp.int8 and dc8.scale is not None
    s8, i8 = tilemax_topk(queries, dc8, k=k)
    ref = queries @ corpus.astype(np.float64).T
    for qi in range(q):
        order = np.argsort(-np.asarray(ref[qi]), kind="stable")[:k]
        assert np.asarray(i8[qi]).tolist() == order.tolist()
        # returned scores are the exact fp32 values, not quantized ones
        np.testing.assert_allclose(
            np.asarray(s8[qi]), np.asarray(ref[qi])[order], atol=1e-5
        )


# ---------------------------------------------------------------------------
# Journal persistence (per-op durability + compaction)
# ---------------------------------------------------------------------------


def test_journal_replay_without_snapshot(tmp_path):
    d = str(tmp_path)
    store = VectorStore(persist_dir=d)
    emb = norm_rows(np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32))
    store.add(
        ids=[f"a{i}" for i in range(5)],
        embeddings=emb,
        metadatas=[{"i": i} for i in range(5)],
        documents=[None] * 5,
    )
    store.update(ids=["a1"], metadatas=[{"i": 1, "x": True}])
    store.delete(["a3"])
    # never called save(); a fresh load must replay the journal
    loaded = VectorStore.load(d)
    assert loaded.count() == 4
    assert loaded.get(ids=["a1"])["metadatas"][0] == {"i": 1, "x": True}
    assert loaded.get(ids=["a3"])["ids"] == []
    res = loaded.query(query_embeddings=[emb[0]], n_results=1)
    assert res["ids"][0] == ["a0"]


def test_journal_compaction_resets(tmp_path):
    import os as _os

    d = str(tmp_path)
    store = VectorStore(persist_dir=d)
    emb = norm_rows(np.random.default_rng(1).standard_normal((3, 8)).astype(np.float32))
    store.add(ids=["x0", "x1", "x2"], embeddings=emb)
    jpath = _os.path.join(d, "journal.jsonl")
    assert _os.path.exists(jpath)
    store.checkpoint(force=True)
    assert not _os.path.exists(jpath)  # compacted into the snapshot
    loaded = VectorStore.load(d)
    assert loaded.count() == 3


def test_journal_torn_tail_is_ignored(tmp_path):
    import os as _os

    d = str(tmp_path)
    store = VectorStore(persist_dir=d)
    emb = norm_rows(np.random.default_rng(2).standard_normal((2, 8)).astype(np.float32))
    store.add(ids=["t0", "t1"], embeddings=emb)
    with open(_os.path.join(d, "journal.jsonl"), "a") as f:
        f.write('{"op": "add", "id": "torn')  # crash mid-write
    loaded = VectorStore.load(d)
    assert loaded.count() == 2  # torn tail dropped, prefix intact


def test_snapshot_plus_journal_roundtrip(tmp_path):
    d = str(tmp_path)
    store = VectorStore(persist_dir=d)
    emb = norm_rows(np.random.default_rng(3).standard_normal((6, 8)).astype(np.float32))
    store.add(ids=[f"s{i}" for i in range(4)], embeddings=emb[:4])
    store.save()  # snapshot of 4
    store.add(ids=["s4", "s5"], embeddings=emb[4:])  # journaled on top
    store.delete(["s0"])
    loaded = VectorStore.load(d)
    assert loaded.count() == 5
    assert sorted(loaded.get(include=[])["ids"]) == ["s1", "s2", "s3", "s4", "s5"]


def test_journal_torn_tail_truncated_and_appendable(tmp_path):
    """After recovering from a torn tail, new appends must not glue onto
    the fragment (which would silently lose every later op next load)."""
    import os as _os

    d = str(tmp_path)
    store = VectorStore(persist_dir=d)
    emb = norm_rows(np.random.default_rng(5).standard_normal((3, 8)).astype(np.float32))
    store.add(ids=["a", "b"], embeddings=emb[:2])
    with open(_os.path.join(d, "journal.jsonl"), "a") as f:
        f.write('{"op": "add", "id": "torn')  # crash mid-append
    # restart: torn tail dropped AND truncated
    s2 = VectorStore.load(d)
    assert s2.count() == 2
    s2.add(ids=["c"], embeddings=emb[2:])  # append post-recovery
    s3 = VectorStore.load(d)
    assert sorted(s3.get(include=[])["ids"]) == ["a", "b", "c"]


def test_snapshot_generation_commit(tmp_path):
    """Manifest is the commit record; counts are validated on load."""
    import json as _json
    import os as _os

    d = str(tmp_path)
    store = VectorStore(persist_dir=d)
    emb = norm_rows(np.random.default_rng(6).standard_normal((4, 8)).astype(np.float32))
    store.add(ids=[f"g{i}" for i in range(4)], embeddings=emb)
    store.save()
    m = _json.load(open(_os.path.join(d, "manifest.json")))
    assert m["count"] == 4 and m["embeddings"].startswith("embeddings-")
    # corrupt: manifest count disagrees with records -> load refuses
    m["count"] = 3
    _json.dump(m, open(_os.path.join(d, "manifest.json"), "w"))
    with pytest.raises(ValueError):
        VectorStore.load(d)


def test_store_query_k_bucketing_consistency():
    store, emb = make_store(n=50)
    r5 = store.query(query_embeddings=[emb[3]], n_results=5)
    r7 = store.query(query_embeddings=[emb[3]], n_results=7)
    assert len(r5["ids"][0]) == 5 and len(r7["ids"][0]) == 7
    assert r7["ids"][0][:5] == r5["ids"][0]


def make_engine_store(engine, n=300, dim=32, seed=0, **kw):
    rng = np.random.default_rng(seed)
    emb = norm_rows(rng.standard_normal((n, dim)).astype(np.float32))
    store = VectorStore(engine=engine, **kw)
    store.add(
        ids=[f"img_{i:04d}" for i in range(n)],
        embeddings=emb,
        metadatas=[{"i": i} for i in range(n)],
    )
    return store, emb


def test_store_engine_pallas_matches_tilemax():
    """IMATCH_INDEX_ENGINE=pallas routes queries through the fused Pallas
    kernel (ops/pallas/topk.py) with identical results."""
    tstore, emb = make_engine_store("tilemax")
    pstore, _ = make_engine_store("pallas")
    rng = np.random.default_rng(9)
    q = norm_rows(rng.standard_normal((2, 32)).astype(np.float32))
    rt = tstore.query(query_embeddings=q, n_results=10)
    rp = pstore.query(query_embeddings=q, n_results=10)
    assert rt["ids"] == rp["ids"]
    np.testing.assert_allclose(rt["distances"], rp["distances"], atol=1e-5)


def test_store_engine_ivf_smoke():
    """IVF is approximate; with every cluster probed it is exact."""
    import os

    os.environ["IMATCH_IVF_NPROBE"] = "100000"
    try:
        istore, emb = make_engine_store("ivf", n=200)
        res = istore.query(query_embeddings=[emb[7]], n_results=5)
        assert res["ids"][0][0] == "img_0007"
    finally:
        del os.environ["IMATCH_IVF_NPROBE"]


@pytest.mark.parametrize(
    "engine", ["tilemax", "pallas", "sharded", "tilemax-host", "ivf", "ivf-sharded"]
)
def test_store_batch_query_matches_per_query(engine, monkeypatch):
    """A (Q, d) batched query must return exactly what Q single-query
    calls return, on EVERY engine — the invariant POST /api/search/batch
    (one device dispatch for all queries) is built on."""
    monkeypatch.setenv("IMATCH_IVF_NPROBE", "100000")  # full probe: exact
    store, emb = make_engine_store(engine, n=257, dim=32)
    rng = np.random.default_rng(3)
    q = norm_rows(
        emb[[5, 99, 200]] * 0.8
        + rng.standard_normal((3, 32)).astype(np.float32) * 0.2
    )
    batched = store.query(query_embeddings=q, n_results=7)
    for qi in range(3):
        single = store.query(query_embeddings=q[qi], n_results=7)
        assert batched["ids"][qi] == single["ids"][0]
        np.testing.assert_allclose(
            batched["distances"][qi], single["distances"][0], atol=1e-6
        )


def test_store_engine_env_selection(monkeypatch):
    monkeypatch.setenv("IMATCH_INDEX_ENGINE", "pallas")
    assert VectorStore().engine == "pallas"
    monkeypatch.setenv("IMATCH_INDEX_ENGINE", "bogus")
    with pytest.raises(ValueError):
        VectorStore()


def test_store_warm_then_query():
    store, emb = make_store(n=64)
    store.warm()  # compiles the limit-select k buckets; must not mutate
    res = store.query(query_embeddings=[emb[5]], n_results=10)
    assert res["ids"][0][0] == "img_0005"
    assert store.count() == 64


def test_query_runs_outside_store_lock():
    """The store lock must be free while the device query executes —
    a writer grabbing the lock mid-query must not deadlock or wait for
    the full query round-trip."""
    import threading
    import time as _time

    store, emb = make_store(n=128)
    release = threading.Event()
    orig = store._run_engine

    def slow_engine(q, dc, k):
        release.set()
        _time.sleep(0.2)  # keep the "device" busy
        return orig(q, dc, k)

    store._run_engine = slow_engine
    t = threading.Thread(
        target=lambda: store.query(query_embeddings=[emb[0]], n_results=4)
    )
    t.start()
    assert release.wait(5)
    t0 = _time.perf_counter()
    acquired = store._lock.acquire(timeout=5)
    dt = _time.perf_counter() - t0
    assert acquired
    store._lock.release()
    t.join()
    assert dt < 0.1, f"writer blocked {dt:.3f}s behind an in-flight query"


def test_empty_add_raises_and_does_not_poison_dim():
    """chroma raises on an empty add; and np.asarray([]) is shape (0,),
    so inferring dim from it would set dim=0, after which every real add
    on the fresh store fails forever — the raise must come first."""
    from imatch_tpu.index.store import VectorStore

    store = VectorStore()
    with pytest.raises(ValueError):
        store.add(ids=[], embeddings=[])
    assert store.dim is None and store.count() == 0
    store.add(ids=["a"], embeddings=[[1.0, 0.0, 0.0]])
    assert store.dim == 3 and store.count() == 1


def test_in_batch_duplicate_ids_rejected():
    """chroma rejects duplicate ids within one add() batch; accepting
    them would leave an alive-but-unreachable phantom slot."""
    from imatch_tpu.index.store import VectorStore

    store = VectorStore(dim=3)
    with pytest.raises(ValueError):
        store.add(ids=["a", "a"], embeddings=[[1, 0, 0], [0, 1, 0]])
    assert store.count() == 0


def test_device_snapshot_not_aliased_to_live_buffers():
    """The lock-free query snapshot must copy the host buffers: writers
    mutate _emb/_alive in place after the lock drops, and jnp.asarray
    can alias numpy memory (zero-copy on CPU)."""
    import numpy as np

    from imatch_tpu.index.store import VectorStore

    store = VectorStore(dim=4)
    store.add(ids=["a"], embeddings=[[1.0, 0, 0, 0]])
    dc = store._device_state()
    # mutate the live buffer the way add()/update() do
    store._emb[0] = np.asarray([0, 1.0, 0, 0], np.float32)
    res = store.query([[1.0, 0, 0, 0]], n_results=1)
    # the cached device corpus must still hold the ORIGINAL row
    assert res["ids"][0][0] == "a"
    assert abs(res["distances"][0][0]) < 1e-5  # exact match, not torn


def test_tilemax_host_matches_device_int8():
    """The tilemax-host capacity tier shares phase 1 (int8 tile
    selection) with the device int8 engine and rescores the same
    candidate tiles in >=fp32, so both engines must return identical
    ids and matching scores — and the store must serve it end-to-end."""
    import numpy as np

    from imatch_tpu.index.store import VectorStore

    rng = np.random.default_rng(17)
    n, d = 3000, 32
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"r{i:05d}" for i in range(n)]

    dev = VectorStore(dim=d, engine="tilemax", score_dtype=jnp.int8)
    host = VectorStore(dim=d, engine="tilemax-host")
    for st in (dev, host):
        st.add(ids=ids, embeddings=emb)
    q = emb[rng.integers(0, n, 5)]
    rd = dev.query(q, n_results=10)
    rh = host.query(q, n_results=10)
    assert rh["ids"] == rd["ids"]
    for a, b in zip(rh["distances"], rd["distances"]):
        np.testing.assert_allclose(a, b, atol=1e-5)
    # deletes flow through (device snapshot rebuilt)
    host.delete([rh["ids"][0][0]])
    rh2 = host.query(q[:1], n_results=5)
    assert rh["ids"][0][0] not in rh2["ids"][0]


def test_mutation_during_device_build_stays_consistent(monkeypatch):
    """The prepared-state build runs OUTSIDE the store lock; a mutation
    landing mid-build must not corrupt the serving query (the stale
    build still matches its captured snapshot) and the next query must
    see a fresh build including the mutation (generation check)."""
    import numpy as np

    from imatch_tpu.index.store import VectorStore

    store = VectorStore(dim=4)
    store.add(ids=["a"], embeddings=[[1.0, 0, 0, 0]])
    orig = store._build_device

    def racy(emb, alive, ivf_snap=None):
        dc = orig(emb, alive, ivf_snap)
        store.add(ids=["b"], embeddings=[[0, 1.0, 0, 0]])  # mid-build write
        return dc

    monkeypatch.setattr(store, "_build_device", racy)
    res = store.query([[0, 1.0, 0, 0]], n_results=2)
    # 'b' was added after the snapshot: this query serves the stale but
    # self-consistent corpus
    assert res["ids"][0] == ["a"]
    monkeypatch.setattr(store, "_build_device", orig)
    res2 = store.query([[0, 1.0, 0, 0]], n_results=2)
    assert res2["ids"][0][0] == "b"  # fresh build sees the mutation


def test_auto_engine_capacity_escalation(monkeypatch):
    """IMATCH_INDEX_ENGINE=auto escalates to the tilemax-host capacity
    tier per build when the projected device copies exceed
    IMATCH_AUTO_HBM_FRAC of the device budget — instead of OOMing as
    the corpus grows. Results stay exact (tilemax-host is int8 tile
    selection + host fp32 rescore, pinned identical elsewhere)."""
    import numpy as np

    from imatch_tpu.index.store import VectorStore

    rng = np.random.default_rng(23)
    e = rng.standard_normal((64, 32)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    ids = [f"r{j}" for j in range(64)]

    exact = VectorStore(dim=32, engine="tilemax")
    exact.add(ids=ids, embeddings=e)

    # budget smaller than the device copies -> a SINGLE-chip engine
    # must escalate (host int8 tier is 6x smaller than bf16+fp32).
    # White-box: auto on this 8-device mesh resolves to sharded, whose
    # per-chip cost beats the host tier (below) — so force the
    # single-chip resolution to exercise the escalating branch.
    monkeypatch.setenv("IMATCH_DEVICE_BYTES_BUDGET", str(4096))
    auto = VectorStore(dim=32, engine="tilemax")
    auto._auto = True
    auto.add(ids=ids, embeddings=e)
    r_a = auto.query(query_embeddings=e[:3], n_results=5)
    assert auto._device[0] == "tilemax-host"
    assert auto.engine == "tilemax"  # default untouched
    r_e = exact.query(query_embeddings=e[:3], n_results=5)
    assert r_a["ids"] == r_e["ids"]
    np.testing.assert_allclose(
        r_a["distances"], r_e["distances"], atol=1e-4
    )

    # the real auto resolution on this 8-device mesh is sharded, and
    # its 6/P bytes/chip footprint BEATS the host tier's single-chip
    # int8 copy — escalating would be strictly worse, so it must not
    monkeypatch.setenv("IMATCH_DEVICE_BYTES_BUDGET", str(4096))
    wide = VectorStore(dim=32, engine="auto")
    assert wide.engine == "sharded"
    wide.add(ids=ids, embeddings=e)
    wide.query(query_embeddings=e[:1], n_results=5)
    assert wide._device[0] == "sharded"

    # generous budget -> no escalation
    monkeypatch.setenv("IMATCH_DEVICE_BYTES_BUDGET", str(1 << 30))
    auto2 = VectorStore(dim=32, engine="auto")
    auto2.add(ids=ids, embeddings=e)
    auto2.query(query_embeddings=e[:1], n_results=5)
    assert auto2._device[0] == auto2.engine

    # a NON-auto engine is never overridden by the budget
    monkeypatch.setenv("IMATCH_DEVICE_BYTES_BUDGET", str(4096))
    pinned = VectorStore(dim=32, engine="tilemax")
    pinned.add(ids=ids, embeddings=e)
    pinned.query(query_embeddings=e[:1], n_results=5)
    assert pinned._device[0] == "tilemax"


def test_add_short_metadatas_rejected():
    """A short metadatas/documents list used to extend _meta by fewer
    entries than _ids — permanently misaligning the row lists (and the
    journal generator zipped short, silently dropping rows on restart)."""
    from imatch_tpu.index.store import VectorStore

    store = VectorStore()
    with pytest.raises(ValueError):
        store.add(
            ids=["a", "b"],
            embeddings=[[1.0, 0.0], [0.0, 1.0]],
            metadatas=[{"x": 1}],
        )
    assert store.count() == 0
    store.add(ids=["a", "b"], embeddings=[[1.0, 0.0], [0.0, 1.0]])
    with pytest.raises(ValueError):
        store.add(
            ids=["c", "d"],
            embeddings=[[1.0, 0.0], [0.0, 1.0]],
            documents=["only one"],
        )
    assert store.count() == 2


def test_add_wrong_dim_rejected_not_broadcast():
    """(n, 1) embeddings numpy-broadcast into constant dim-D rows at the
    slice copy with no error — must raise up front instead."""
    from imatch_tpu.index.store import VectorStore

    store = VectorStore()
    store.add(ids=["a"], embeddings=[[1.0, 0.0, 0.0]])
    with pytest.raises(ValueError):
        store.add(ids=["b", "c"], embeddings=[[0.5], [0.25]])
    assert store.count() == 1


def test_update_validates_before_mutation():
    """A short metadatas / wrong-dim embeddings batch must raise BEFORE
    any row is touched — the same all-or-nothing rule update() already
    enforces for unknown ids."""
    from imatch_tpu.index.store import VectorStore

    store = VectorStore()
    store.add(
        ids=["a", "b"],
        embeddings=[[1.0, 0.0], [0.0, 1.0]],
        metadatas=[{"v": 1}, {"v": 2}],
    )
    with pytest.raises(ValueError):
        store.update(ids=["a", "b"], metadatas=[{"v": 9}])
    assert store.get(ids=["a"])["metadatas"][0] == {"v": 1}
    with pytest.raises(ValueError):
        store.update(ids=["a", "b"], embeddings=[[1.0], [2.0]])
    r = store.query(query_embeddings=[[1.0, 0.0]], n_results=1)
    assert r["ids"][0][0] == "a"


def test_empty_store_query_respects_include():
    """The empty-store early return used to skip the include filtering,
    so the result's key set changed with store occupancy."""
    from imatch_tpu.index.store import VectorStore

    store = VectorStore()
    res = store.query(
        query_embeddings=[[0.0, 1.0]], n_results=5, include=("distances",)
    )
    assert set(res) == {"ids", "distances"}
    store.add(ids=["a"], embeddings=[[1.0, 0.0]])
    res2 = store.query(
        query_embeddings=[[0.0, 1.0]], n_results=5, include=("distances",)
    )
    assert set(res2) == set(res)


def test_store_capacity_env_applies_on_load(tmp_path, monkeypatch):
    """IMATCH_STORE_CAPACITY was a silent no-op for the serving store:
    VectorStore.load() constructs with dim=None, so the reservation must
    apply at the first capacity check, not only at construction."""
    from imatch_tpu.index.store import VectorStore

    store = VectorStore(persist_dir=str(tmp_path))
    store.add(ids=["a"], embeddings=[[1.0, 0.0]])
    store.save()
    monkeypatch.setenv("IMATCH_STORE_CAPACITY", "5000")
    loaded = VectorStore.load(str(tmp_path))
    assert loaded.count() == 1
    assert loaded._emb.shape[0] >= 5000
