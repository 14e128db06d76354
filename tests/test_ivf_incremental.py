"""Incremental IVF: mutation-invalidated builds repair (assign new rows
against the existing centroids — the FAISS IVF add discipline) instead
of re-running k-means, and the trained state survives restarts via the
snapshot sidecar. The reference's hnswlib index is incrementally
updatable (collection.add, /root/reference/backend/app/main.py:735);
this pins the same property for the TPU ANN tier."""

import numpy as np
import pytest

import imatch_tpu.index.ivf as ivf_mod
from imatch_tpu.index.store import VectorStore


def norm_rows(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture
def train_counter(monkeypatch):
    """Counts k-means training runs; repair builds must not add any."""
    calls = {"n": 0}
    orig = ivf_mod.train_centroids

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(ivf_mod, "train_centroids", counting)
    return calls


@pytest.fixture
def full_probe(monkeypatch):
    # probe every cluster -> IVF results are exact (comparable to tilemax)
    monkeypatch.setenv("IMATCH_IVF_NPROBE", "1000000")


def _corpus(n, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return norm_rows(rng.standard_normal((n, d))).astype(np.float32)


def _ids(n, base=0):
    return [f"r{base + i:06d}" for i in range(n)]


def assert_same_results(a, b):
    """Cross-engine comparison: ids exact, distances to float tolerance
    (tilemax and IVF tile their fp32 rescore einsums differently, so
    scores agree only to the last few ulps)."""
    assert a["ids"] == b["ids"]
    for da, db in zip(a["distances"], b["distances"]):
        np.testing.assert_allclose(da, db, atol=1e-5)


def test_incremental_add_repairs_without_retraining(
    train_counter, full_probe
):
    d = 32
    emb = _corpus(576, d=d, seed=1)
    ivf = VectorStore(dim=d, engine="ivf")
    ref = VectorStore(dim=d, engine="tilemax")
    for st in (ivf, ref):
        st.add(ids=_ids(512), embeddings=emb[:512])
    q = emb[:5]
    assert_same_results(ivf.query(q, n_results=10), ref.query(q, n_results=10))
    assert train_counter["n"] == 1
    # +12.5% growth: below IMATCH_IVF_REBUILD_FRAC -> repair, not retrain
    for st in (ivf, ref):
        st.add(ids=_ids(64, base=512), embeddings=emb[512:])
    assert_same_results(ivf.query(q, n_results=10), ref.query(q, n_results=10))
    # new rows are findable (exactness above already implies it, but pin
    # one id explicitly)
    hit = ivf.query(emb[512:513], n_results=1)
    assert hit["ids"][0][0] == _ids(1, base=512)[0]
    assert train_counter["n"] == 1


def test_growth_past_threshold_retrains(train_counter, full_probe):
    d = 16
    emb = _corpus(1024, d=d, seed=2)
    ivf = VectorStore(dim=d, engine="ivf")
    ivf.add(ids=_ids(512), embeddings=emb[:512])
    ivf.query(emb[:1], n_results=5)
    assert train_counter["n"] == 1
    # 2x growth: clustering is stale -> full k-means rerun
    ivf.add(ids=_ids(512, base=512), embeddings=emb[512:])
    ivf.query(emb[:1], n_results=5)
    assert train_counter["n"] == 2


def test_update_reassigns_changed_vector(train_counter, full_probe):
    d = 32
    emb = _corpus(512, d=d, seed=3)
    ivf = VectorStore(dim=d, engine="ivf")
    ref = VectorStore(dim=d, engine="tilemax")
    for st in (ivf, ref):
        st.add(ids=_ids(512), embeddings=emb)
    ivf.query(emb[:1], n_results=5)
    assert train_counter["n"] == 1
    new_vec = -emb[7]  # far from its old cluster
    for st in (ivf, ref):
        st.update(ids=[_ids(8)[7]], embeddings=[new_vec])
    q = np.stack([new_vec, emb[3]])
    assert_same_results(ivf.query(q, n_results=10), ref.query(q, n_results=10))
    assert ivf.query(new_vec[None], n_results=1)["ids"][0][0] == _ids(8)[7]
    assert train_counter["n"] == 1  # repaired, not retrained


def test_low_probe_self_match_after_repair(train_counter, monkeypatch):
    """n_probe=1 finds each row via its OWN cluster — misplaced member
    lists (a bad assignment repair) would break this where full-probe
    exactness tests cannot see it. Regression: the train pass assigns
    EVERY capacity slot (dead/padding rows included), and before the
    fix those stale assignments made the repair pass skip post-train
    adds, packing all of them into cluster 0 (127/128 self-match misses
    at n_probe=1)."""
    monkeypatch.setenv("IMATCH_IVF_NPROBE", "1")
    rng = np.random.default_rng(4)
    centers = norm_rows(rng.standard_normal((16, 32)))
    pts = norm_rows(
        centers.repeat(40, axis=0)
        + 0.05 * rng.standard_normal((640, 32))
    ).astype(np.float32)
    ivf = VectorStore(dim=32, engine="ivf")
    ivf.add(ids=_ids(512), embeddings=pts[:512])
    ivf.query(pts[:1], n_results=1)
    ivf.add(ids=_ids(128, base=512), embeddings=pts[512:])
    assert train_counter["n"] == 1
    res = ivf.query(pts, n_results=1)  # EVERY row, old and new
    got = [r[0] for r in res["ids"]]
    assert got == _ids(640)
    assert train_counter["n"] == 1  # still the repair path


def test_sharded_low_probe_self_match_after_repair(
    train_counter, monkeypatch
):
    """Sharded variant of the regression above: rows added into a
    partially-filled shard must be repaired into their true nearest
    cluster, not inherit the dead slot's stale assignment."""
    monkeypatch.setenv("IMATCH_IVF_NPROBE", "1")
    rng = np.random.default_rng(5)
    centers = norm_rows(rng.standard_normal((12, 32)))
    pts = norm_rows(
        centers.repeat(50, axis=0)
        + 0.05 * rng.standard_normal((600, 32))
    ).astype(np.float32)
    ivf = VectorStore(dim=32, engine="ivf-sharded")
    ivf.add(ids=_ids(480), embeddings=pts[:480])  # shards partially live
    ivf.query(pts[:1], n_results=1)
    assert train_counter["n"] == 8
    ivf.add(ids=_ids(120, base=480), embeddings=pts[480:])
    res = ivf.query(pts, n_results=1)
    got = [r[0] for r in res["ids"]]
    assert got == _ids(600)
    assert train_counter["n"] == 8  # repaired, not retrained


def test_compaction_remaps_assignments(train_counter, full_probe):
    d = 16
    n = 2048
    emb = _corpus(n, d=d, seed=5)
    ivf = VectorStore(dim=d, engine="ivf")
    ref = VectorStore(dim=d, engine="tilemax")
    all_ids = _ids(n)
    for st in (ivf, ref):
        st.add(ids=all_ids, embeddings=emb)
    ivf.query(emb[:1], n_results=5)
    assert train_counter["n"] == 1
    # delete >half -> tombstone compaction rewrites the slot layout
    drop = all_ids[: n // 2 + 100]
    for st in (ivf, ref):
        st.delete(drop)
    q = emb[n // 2 + 100 :][:5]
    assert_same_results(ivf.query(q, n_results=10), ref.query(q, n_results=10))
    assert train_counter["n"] == 1  # remapped assignments still usable


def test_ivf_sidecar_survives_restart(
    tmp_path, train_counter, full_probe, monkeypatch
):
    d = 32
    emb = _corpus(600, d=d, seed=6)
    path = str(tmp_path / "idx")
    st = VectorStore(dim=d, engine="ivf", persist_dir=path)
    st.add(ids=_ids(512), embeddings=emb[:512])
    want = st.query(emb[:4], n_results=10)
    assert train_counter["n"] == 1
    st.save(path)
    # post-snapshot mutations ride the journal; the restarted store must
    # repair them in, still without retraining
    st.add(ids=_ids(88, base=512), embeddings=emb[512:])
    want2 = st.query(emb[:4], n_results=10)

    monkeypatch.setenv("IMATCH_INDEX_ENGINE", "ivf")
    train_counter["n"] = 0
    loaded = VectorStore.load(path)
    assert loaded.engine == "ivf"
    assert loaded._ivf_host is not None  # sidecar restored
    assert loaded.query(emb[:4], n_results=10) == want2
    assert train_counter["n"] == 0


def test_sharded_ivf_incremental_add(train_counter, full_probe):
    """ivf-sharded repair: shard ranges are capacity-stable between
    growths, so per-shard assignment of only the new rows suffices —
    no per-shard Lloyd reruns (8 trains = 1 per virtual device)."""
    d = 32
    emb = _corpus(1000, d=d, seed=8)
    ivf = VectorStore(dim=d, engine="ivf-sharded")
    ref = VectorStore(dim=d, engine="tilemax")
    for st in (ivf, ref):
        st.add(ids=_ids(900), embeddings=emb[:900])
    q = emb[:5]
    assert_same_results(ivf.query(q, n_results=10), ref.query(q, n_results=10))
    assert train_counter["n"] == 8  # one k-means per shard
    # +100 rows: stays inside the 1024-slot capacity -> per-shard repair
    for st in (ivf, ref):
        st.add(ids=_ids(100, base=900), embeddings=emb[900:])
    assert_same_results(ivf.query(q, n_results=10), ref.query(q, n_results=10))
    assert ivf.query(emb[950:951], n_results=1)["ids"][0][0] == _ids(
        1, base=950
    )[0]
    assert train_counter["n"] == 8  # repaired, not retrained


def test_sharded_ivf_capacity_growth_retrains(train_counter, full_probe):
    """Capacity doubling moves shard boundaries — the sharded host
    state is dropped and the next build retrains every shard."""
    d = 16
    emb = _corpus(1300, d=d, seed=9)
    ivf = VectorStore(dim=d, engine="ivf-sharded")
    ref = VectorStore(dim=d, engine="tilemax")
    for st in (ivf, ref):
        st.add(ids=_ids(1000), embeddings=emb[:1000])
    ivf.query(emb[:1], n_results=5)
    assert train_counter["n"] == 8
    for st in (ivf, ref):  # 1000 -> 1300 rows: capacity 1024 -> 2048
        st.add(ids=_ids(300, base=1000), embeddings=emb[1000:])
    q = emb[:5]
    assert_same_results(ivf.query(q, n_results=10), ref.query(q, n_results=10))
    assert train_counter["n"] == 16


def test_sharded_ivf_update_and_delete_repair(train_counter, full_probe):
    d = 32
    emb = _corpus(900, d=d, seed=10)
    ivf = VectorStore(dim=d, engine="ivf-sharded")
    ref = VectorStore(dim=d, engine="tilemax")
    for st in (ivf, ref):
        st.add(ids=_ids(900), embeddings=emb)
    ivf.query(emb[:1], n_results=5)
    assert train_counter["n"] == 8
    new_vec = -emb[11]
    for st in (ivf, ref):
        st.update(ids=[_ids(12)[11]], embeddings=[new_vec])
        st.delete([_ids(3)[2]])  # small delete: no compaction
    q = np.stack([new_vec, emb[5]])
    assert_same_results(ivf.query(q, n_results=10), ref.query(q, n_results=10))
    assert train_counter["n"] == 8


def test_corrupt_sidecar_falls_back_to_full_build(
    tmp_path, train_counter, full_probe, monkeypatch
):
    d = 16
    emb = _corpus(300, d=d, seed=7)
    path = str(tmp_path / "idx")
    st = VectorStore(dim=d, engine="ivf", persist_dir=path)
    st.add(ids=_ids(300), embeddings=emb)
    st.query(emb[:1], n_results=5)
    st.save(path)
    import json
    import os

    with open(os.path.join(path, "manifest.json")) as f:
        ivf_file = json.load(f)["ivf"]
    with open(os.path.join(path, ivf_file), "wb") as f:
        f.write(b"not a zipfile")
    monkeypatch.setenv("IMATCH_INDEX_ENGINE", "ivf")
    train_counter["n"] = 0
    loaded = VectorStore.load(path)
    assert loaded._ivf_host is None
    ref = VectorStore(dim=d, engine="tilemax")
    ref.add(ids=_ids(300), embeddings=emb)
    assert_same_results(
        loaded.query(emb[:3], n_results=10),
        ref.query(emb[:3], n_results=10),
    )
    assert train_counter["n"] == 1  # full rebuild, served fine


def test_sharded_sidecar_survives_restart(
    tmp_path, train_counter, full_probe, monkeypatch
):
    """Bulk-ingest -> save -> restart on the same mesh: every shard's
    trained state restores from the sidecar, journal-replayed rows
    repair in, zero k-means runs."""
    d = 32
    emb = _corpus(700, d=d, seed=11)
    path = str(tmp_path / "idx")
    st = VectorStore(dim=d, engine="ivf-sharded", persist_dir=path)
    st.add(ids=_ids(600), embeddings=emb[:600])
    st.query(emb[:1], n_results=5)
    assert train_counter["n"] == 8
    st.save(path)
    st.add(ids=_ids(100, base=600), embeddings=emb[600:])  # journaled
    want = st.query(emb[:4], n_results=10)

    monkeypatch.setenv("IMATCH_INDEX_ENGINE", "ivf-sharded")
    train_counter["n"] = 0
    loaded = VectorStore.load(path)
    assert loaded._ivf_host is not None
    assert loaded._ivf_host["kind"] == "ivf-sharded"
    assert loaded.query(emb[:4], n_results=10) == want
    assert train_counter["n"] == 0


def test_sharded_sidecar_skipped_with_tombstones(
    tmp_path, train_counter, full_probe, monkeypatch
):
    """Tombstones shift slot positions in the snapshot, which would
    invalidate shard-local assignments — the sidecar must not be
    written, and the restart retrains (correctly)."""
    d = 16
    emb = _corpus(400, d=d, seed=12)
    path = str(tmp_path / "idx")
    st = VectorStore(dim=d, engine="ivf-sharded", persist_dir=path)
    st.add(ids=_ids(400), embeddings=emb)
    st.query(emb[:1], n_results=5)
    st.delete([_ids(1)[0]])  # one tombstone, no compaction
    st.query(emb[:1], n_results=5)
    st.save(path)
    import json
    import os

    with open(os.path.join(path, "manifest.json")) as f:
        assert "ivf" not in json.load(f)
    monkeypatch.setenv("IMATCH_INDEX_ENGINE", "ivf-sharded")
    train_counter["n"] = 0
    loaded = VectorStore.load(path)
    ref = VectorStore(dim=d, engine="tilemax")
    alive = [i for i in _ids(400) if i != _ids(1)[0]]
    got = loaded.query(emb[:3], n_results=10)
    ref.add(
        ids=alive,
        embeddings=np.concatenate([emb[1:]], axis=0),
    )
    assert_same_results(got, ref.query(emb[:3], n_results=10))
    assert train_counter["n"] == 8  # full per-shard retrain


def test_stats_reports_ivf_state(train_counter, full_probe):
    d = 16
    emb = _corpus(600, d=d, seed=13)
    st = VectorStore(dim=d, engine="ivf")
    st.add(ids=_ids(512), embeddings=emb[:512])
    st.query(emb[:1], n_results=5)
    s = st.stats()
    assert s["engine"] == "ivf" and s["live"] == 512
    assert s["ivf"]["kind"] == "ivf" and s["ivf"]["last_mode"] == "train"
    assert s["ivf"]["built_live"] == 512 and s["ivf"]["clusters"] >= 1
    assert s["last_build"]["seconds"] >= 0
    st.add(ids=_ids(88, base=512), embeddings=emb[512:])
    st.query(emb[:1], n_results=5)
    s = st.stats()
    # the O(batch) patch absorbed the add without any rebuild
    # (index/patch.py); the trained clustering stays live
    assert s["patched_mutations"] == 1
    assert s["ivf"]["last_mode"] == "train"
    assert s["live"] == 600 and s["ivf"]["built_live"] == 512
    # forcing the patch off exercises the REPAIR rebuild the old
    # mutate-invalidates contract took (assign only the new rows)
    import os as _os

    _os.environ["IMATCH_INCREMENTAL"] = "0"
    try:
        st.add(ids=_ids(30, base=600), embeddings=_corpus(30, d=d, seed=15))
        st.query(emb[:1], n_results=5)
    finally:
        _os.environ.pop("IMATCH_INCREMENTAL", None)
    s = st.stats()
    assert s["ivf"]["last_mode"] == "repair"
    assert s["live"] == 630 and s["ivf"]["built_live"] == 512


def test_semantically_corrupt_sidecar_degrades_to_retrain(
    tmp_path, train_counter, full_probe, monkeypatch
):
    """A sidecar that LOADS fine but carries out-of-range assignments
    must not poison the serving path — load-time range validation
    rejects it (and the build-time try/except backstops anything that
    slips through)."""
    d = 16
    emb = _corpus(300, d=d, seed=14)
    path = str(tmp_path / "idx")
    st = VectorStore(dim=d, engine="ivf", persist_dir=path)
    st.add(ids=_ids(300), embeddings=emb)
    st.query(emb[:1], n_results=5)
    st.save(path)
    import json
    import os

    with open(os.path.join(path, "manifest.json")) as f:
        ivf_file = json.load(f)["ivf"]
    with np.load(os.path.join(path, ivf_file)) as z:
        payload = {k: z[k] for k in z.files}
    payload["assign"] = np.full_like(payload["assign"], 10_000_000)
    with open(os.path.join(path, ivf_file), "wb") as f:
        np.savez(f, **payload)

    monkeypatch.setenv("IMATCH_INDEX_ENGINE", "ivf")
    train_counter["n"] = 0
    loaded = VectorStore.load(path)
    assert loaded._ivf_host is None  # range validation rejected it
    ref = VectorStore(dim=d, engine="tilemax")
    ref.add(ids=_ids(300), embeddings=emb)
    assert_same_results(
        loaded.query(emb[:3], n_results=10),
        ref.query(emb[:3], n_results=10),
    )
    assert train_counter["n"] == 1


def test_built_live_survives_restart_without_ratchet(
    tmp_path, train_counter, full_probe, monkeypatch
):
    """built_live must persist as the live count at the LAST K-MEANS:
    restoring the snapshot count instead would ratchet the retrain
    threshold upward across save/restart cycles."""
    d = 16
    emb = _corpus(700, d=d, seed=15)
    path = str(tmp_path / "idx")
    st = VectorStore(dim=d, engine="ivf", persist_dir=path)
    st.add(ids=_ids(512), embeddings=emb[:512])
    st.query(emb[:1], n_results=5)  # train at 512
    st.add(ids=_ids(100, base=512), embeddings=emb[512:612])
    st.query(emb[:1], n_results=5)  # repair at 612
    assert train_counter["n"] == 1
    st.save(path)

    monkeypatch.setenv("IMATCH_INDEX_ENGINE", "ivf")
    train_counter["n"] = 0
    loaded = VectorStore.load(path)
    assert loaded._ivf_host["built_live"] == 512  # not the 612 snapshot
    # 512 * 1.3 = 665: adding to 688 live must RETRAIN, not repair
    loaded.add(ids=_ids(76, base=612), embeddings=emb[612:688])
    loaded.query(emb[:1], n_results=5)
    assert train_counter["n"] == 1
