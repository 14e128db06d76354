"""Incremental device-state patching (index/patch.py).

Mutations on a store with a prepared device state must be absorbed as
O(batch) scatters — NOT a full host copy + corpus re-upload — and the
patched state must answer queries exactly like a from-scratch rebuild
(the always-correct fallback). This is the TPU answer to hnswlib's
incremental insert (/root/reference/backend/app/main.py:735), which the
reference gets for free from chroma.

Oracles:
- exact engines (tilemax bf16/fp32/int8, pallas, sharded, tilemax-host):
  a FRESH store over the final content — results must be bit-identical;
- IVF engines: the same mutation sequence with IMATCH_INCREMENTAL=0
  (the repair-rebuild path shares centroids, so patch-vs-repair must be
  bit-identical; a fresh store would retrain different clusters).
"""

import threading

import numpy as np
import pytest

from imatch_tpu.index.store import VectorStore

D = 32


@pytest.fixture(autouse=True)
def _no_coalesce(monkeypatch):
    monkeypatch.delenv("IMATCH_COALESCE", raising=False)
    monkeypatch.delenv("IMATCH_INCREMENTAL", raising=False)
    monkeypatch.delenv("IMATCH_SCORE_DTYPE", raising=False)


def _rows(n, seed):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(n, D)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def _ids(pre, n, base=0):
    return [f"{pre}{i}" for i in range(base, base + n)]


def _assert_same(r1, r2):
    assert r1["ids"] == r2["ids"]
    d1 = np.array(sum(r1["distances"], []))
    d2 = np.array(sum(r2["distances"], []))
    assert np.allclose(d1, d2, atol=1e-5)


EXACT_ENGINES = [
    ("tilemax", "bf16"),
    ("tilemax", "fp32"),
    ("tilemax", "int8"),
    ("pallas", "bf16"),
    ("tilemax-host", "bf16"),
    ("sharded", "bf16"),
    ("sharded", "fp32"),
]


@pytest.mark.parametrize("engine,dtype", EXACT_ENGINES)
def test_patched_matches_fresh_rebuild(engine, dtype, monkeypatch):
    """add/delete/update after a device build patch in place and answer
    exactly like a fresh store over the final content."""
    monkeypatch.setenv("IMATCH_SCORE_DTYPE", dtype)
    q = _rows(5, 99)
    s = VectorStore(dim=D, engine=engine)
    s.add(_ids("a", 200), _rows(200, 0))
    s.query(q, n_results=10)  # force the device build
    s.add(_ids("b", 50), _rows(50, 1))
    s.delete(_ids("a", 7))
    s.update(_ids("a", 5, 10), embeddings=_rows(5, 2))
    r1 = s.query(q, n_results=25)

    st = s.stats()
    # appends + deletes always patch; embedding updates patch on the
    # pure-device engines and fall back on tilemax-host (a live host
    # row rewrite could tear under a lock-free rescore)
    expect_patched = 2 if engine == "tilemax-host" else 3
    assert st["patched_mutations"] == expect_patched
    assert st["device_ready"]

    f = VectorStore(dim=D, engine=engine)
    g = s.get(include=("metadatas", "embeddings"))
    f.add(g["ids"], g["embeddings"])
    _assert_same(r1, f.query(q, n_results=25))


@pytest.mark.parametrize("engine", ["ivf", "ivf-sharded"])
def test_ivf_patch_matches_repair_rebuild(engine, monkeypatch):
    """IVF appends/deletes patch member tables in place, bit-identical
    to the repair-rebuild path (same centroids, same pack discipline);
    embedding updates fall back to a repair rebuild."""
    q = _rows(5, 99)

    def run(incremental):
        monkeypatch.setenv("IMATCH_INCREMENTAL", incremental)
        s = VectorStore(dim=D, engine=engine)
        s.add(_ids("a", 200), _rows(200, 0))
        s.query(q, n_results=10)
        s.add(_ids("b", 50), _rows(50, 1))
        r_add = s.query(q, n_results=10)
        s.delete(_ids("a", 7))
        r_del = s.query(q, n_results=10)
        s.update(_ids("a", 5, 10), embeddings=_rows(5, 2))
        r_upd = s.query(q, n_results=25)
        return r_add, r_del, r_upd, s.stats()

    inc = run("1")
    ref = run("0")
    for r1, r2 in zip(inc[:3], ref[:3]):
        _assert_same(r1, r2)
    assert inc[3]["patched_mutations"] == 2  # append + delete
    assert ref[3]["patched_mutations"] == 0


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("IMATCH_INCREMENTAL", "0")
    s = VectorStore(dim=D, engine="tilemax")
    s.add(_ids("a", 10), _rows(10, 0))
    s.query(_rows(1, 9), n_results=3)
    s.add(_ids("b", 5), _rows(5, 1))
    st = s.stats()
    assert st["patched_mutations"] == 0
    assert not st["device_ready"]


def test_capacity_growth_falls_back():
    """An add that grows the capacity-padded buffer cannot patch (the
    device arrays are the wrong shape) — correctness must survive the
    rebuild."""
    s = VectorStore(dim=D, engine="tilemax")
    s.add(_ids("a", 1000), _rows(1000, 0))
    s.query(_rows(1, 9), n_results=3)
    s.add(_ids("b", 200), _rows(200, 1))  # 1200 > _MIN_CAP=1024
    assert s.stats()["patched_mutations"] == 0
    q = _rows(3, 99)
    f = VectorStore(dim=D, engine="tilemax")
    g = s.get(include=("embeddings",))
    f.add(g["ids"], g["embeddings"])
    _assert_same(s.query(q, n_results=10), f.query(q, n_results=10))


def test_compaction_falls_back():
    """Deleting past the tombstone threshold compacts (slots move) —
    the patch must be skipped, results stay right."""
    s = VectorStore(dim=D, engine="tilemax")
    s.add(_ids("a", 1200), _rows(1200, 0))
    s.query(_rows(1, 9), n_results=3)
    s.delete(_ids("a", 700))  # > half dead -> compaction
    assert s.count() == 500
    assert s.stats()["patched_mutations"] == 0
    q = _rows(3, 99)
    f = VectorStore(dim=D, engine="tilemax")
    g = s.get(include=("embeddings",))
    f.add(g["ids"], g["embeddings"])
    _assert_same(s.query(q, n_results=10), f.query(q, n_results=10))


def test_ivf_stale_growth_falls_back(monkeypatch):
    """Appends past the retrain threshold must NOT patch — the next
    build retrains k-means over the grown corpus."""
    monkeypatch.setenv("IMATCH_IVF_REBUILD_FRAC", "0.3")
    s = VectorStore(dim=D, engine="ivf")
    s.add(_ids("a", 100), _rows(100, 0))
    s.query(_rows(1, 9), n_results=3)
    s.add(_ids("b", 60), _rows(60, 1))  # 160 > 100 * 1.3
    st = s.stats()
    assert st["patched_mutations"] == 0
    assert not st["device_ready"]
    s.query(_rows(1, 9), n_results=3)
    assert s.stats()["ivf"]["last_mode"] == "train"


def test_ivf_member_overflow_falls_back(monkeypatch):
    """A cluster whose member list is full rejects the patch; the
    rebuild repacks with fresh slack. Slack is pinned to zero so the
    first append into the deepest cluster overflows deterministically."""
    import imatch_tpu.index.ivf as ivf_mod

    monkeypatch.setenv("IMATCH_IVF_REBUILD_FRAC", "10.0")  # never stale
    monkeypatch.setattr(ivf_mod, "member_slack", lambda m: 0)
    s = VectorStore(dim=D, engine="ivf")
    s.add(_ids("a", 64), _rows(64, 0))
    s.query(_rows(1, 9), n_results=3)
    # with zero slack every cluster is exactly full; any append overflows
    s.add(_ids("b", 8), _rows(8, 1))
    st = s.stats()
    assert st["patched_mutations"] == 0
    assert not st["device_ready"]
    r = s.query(_rows(8, 1)[:1], n_results=1)  # rebuild still serves
    assert r["ids"][0][0] == "b0"


def test_old_snapshot_survives_patched_append(monkeypatch):
    """A query snapshot captured BEFORE a mutation must keep answering
    from the pre-mutation state: the patch may not donate (overwrite)
    buffers an in-flight query holds, and the tilemax-host tier's
    shared host matrix must mask the new rows via its copied validity."""
    for engine in ("tilemax", "tilemax-host"):
        s = VectorStore(dim=D, engine=engine)
        s.add(_ids("a", 50), _rows(50, 0))
        s.query(_rows(1, 9), n_results=3)
        live, dc, ids_l, _, _ = s._snapshot_for_query()
        try:
            assert s._inflight == 1
            new = _rows(8, 1)
            s.add(_ids("b", 8), new)
            assert s.stats()["patched_mutations"] == 1
            # the captured state must NOT contain the new rows
            scores, idx = [
                np.asarray(x) for x in s._run_engine(new[:1], dc, 4)
            ]
            found = [ids_l[i] for i in idx[0] if 0 <= i < len(ids_l)]
            assert not any(f.startswith("b") for f in found), (engine, found)
        finally:
            s._release_snapshot(dc)
        # ...while the store itself serves them
        r = s.query(new[:1], n_results=1)
        assert r["ids"][0][0] == "b0"
        assert r["distances"][0][0] < 1e-5


def test_patched_store_persists(tmp_path):
    """Journal replay + snapshot round-trip agree with a patched store."""
    p = str(tmp_path / "store")
    s = VectorStore(dim=D, engine="tilemax", persist_dir=p)
    s.add(_ids("a", 30), _rows(30, 0))
    s.query(_rows(1, 9), n_results=3)
    s.add(_ids("b", 10), _rows(10, 1))
    s.delete(_ids("a", 3))
    assert s.stats()["patched_mutations"] == 2
    q = _rows(3, 99)
    want = s.query(q, n_results=10)
    r = VectorStore.load(p)
    _assert_same(want, r.query(q, n_results=10))
    s.save(p)
    r2 = VectorStore.load(p)
    _assert_same(want, r2.query(q, n_results=10))


def test_concurrent_writers_and_readers_with_patching():
    """Racing adds/deletes against queries with patching live: every
    result must be internally consistent (ids resolve, distances sorted)
    and the final state must match a fresh rebuild."""
    s = VectorStore(dim=D, engine="tilemax")
    s.add(_ids("seed", 64), _rows(64, 0))
    s.query(_rows(1, 9), n_results=3)
    errs = []
    stop = threading.Event()

    def writer():
        try:
            for i in range(12):
                s.add(_ids(f"w{i}_", 8), _rows(8, 100 + i))
                if i % 3 == 2:
                    s.delete([f"w{i}_0"])
        except Exception as e:  # pragma: no cover
            errs.append(e)
        finally:
            stop.set()

    def reader():
        q = _rows(2, 999)
        try:
            while not stop.is_set():
                r = s.query(q, n_results=5)
                for row in r["distances"]:
                    assert row == sorted(row)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(2)
    ]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert not errs
    q = _rows(3, 99)
    f = VectorStore(dim=D, engine="tilemax")
    g = s.get(include=("embeddings",))
    f.add(g["ids"], g["embeddings"])
    _assert_same(s.query(q, n_results=10), f.query(q, n_results=10))
