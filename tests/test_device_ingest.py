"""Device-resident ingest: store.add() with a jax.Array.

Embeddings coming straight off the model tower are scattered
device-to-device into the capacity-padded index buffers and never cross
the host link on the hot path (index/patch.py `_rows_f32`); the host
fp32 mirror and the journal entries are DEFERRED behind an async d2h
copy and completed at the next drain point (store._drain_pending). The
reference cannot have this path at all — hnswlib inserts are
intrinsically host-resident (/root/reference/backend/app/main.py:735).

Oracle for every engine: the SAME operation sequence with numpy
embeddings — the device path shares the patch/prepare kernels
bit-for-bit, so results must be identical. The drain tests pin the
deferred-consistency contract: every reader of the host mirror (get
with embeddings, save, update/delete, rebuilds) sees the drained rows,
and the journal always records operations in call order.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from imatch_tpu.index.store import VectorStore

D = 32


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv("IMATCH_COALESCE", raising=False)
    monkeypatch.delenv("IMATCH_INCREMENTAL", raising=False)
    monkeypatch.delenv("IMATCH_SCORE_DTYPE", raising=False)
    monkeypatch.delenv("IMATCH_PENDING_MAX", raising=False)


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


ENGINES = [
    ("tilemax", "bf16"),
    ("tilemax", "fp32"),
    ("tilemax", "int8"),
    ("pallas", "bf16"),
    ("tilemax-host", "bf16"),
    ("sharded", "bf16"),
    ("ivf", "bf16"),
    ("ivf-sharded", "bf16"),
]


@pytest.mark.parametrize("engine,dtype", ENGINES)
def test_device_add_matches_host_add(engine, dtype, monkeypatch):
    """Same op sequence, jax.Array vs numpy embeddings — bit-identical
    answers on every engine (shared patch/prepare kernels)."""
    monkeypatch.setenv("IMATCH_SCORE_DTYPE", dtype)
    q = _rows(5, 99)

    def run(to_dev):
        conv = (lambda a: jnp.asarray(a)) if to_dev else (lambda a: a)
        s = VectorStore(dim=D, engine=engine)
        s.add(_ids("a", 200), conv(_rows(200, 0)))
        s.query(q, n_results=10)  # force the device build
        s.add(_ids("b", 50), conv(_rows(50, 1)))  # patched append
        return s, s.query(q, n_results=25)

    s_dev, r_dev = run(True)
    s_host, r_host = run(False)
    _assert_same(r_dev, r_host)
    assert s_dev.count() == s_host.count() == 250
    # the warm append patched instead of rebuilding, exactly like host
    assert (
        s_dev.stats()["patched_mutations"]
        == s_host.stats()["patched_mutations"]
    )


def test_device_add_before_any_build():
    """A device add on a cold store defers cleanly: the first query
    drains the pending rows into the host mirror and builds from it."""
    s = VectorStore(dim=D, engine="tilemax")
    s.add(_ids("a", 64), jnp.asarray(_rows(64, 0)))
    assert s.stats()["pending_host_syncs"] == 1
    q = _rows(2, 9)
    f = VectorStore(dim=D, engine="tilemax")
    f.add(_ids("a", 64), _rows(64, 0))
    _assert_same(s.query(q, n_results=10), f.query(q, n_results=10))
    assert s.stats()["pending_host_syncs"] == 0


def test_capacity_growth_with_pending_rows():
    """A device add that grows the padded buffer falls back to a
    rebuild; the rebuild must see the deferred rows (drain happens
    before the host-mirror copy)."""
    s = VectorStore(dim=D, engine="tilemax")
    s.add(_ids("a", 1000), _rows(1000, 0))
    s.query(_rows(1, 9), n_results=3)
    s.add(_ids("b", 200), jnp.asarray(_rows(200, 1)))  # 1200 > cap 1024
    assert s.stats()["patched_mutations"] == 0
    q = _rows(3, 99)
    f = VectorStore(dim=D, engine="tilemax")
    f.add(_ids("a", 1000), _rows(1000, 0))
    f.add(_ids("b", 200), _rows(200, 1))
    _assert_same(s.query(q, n_results=10), f.query(q, n_results=10))


def test_get_embeddings_drains():
    s = VectorStore(dim=D, engine="tilemax")
    rows = _rows(16, 0)
    s.add(_ids("a", 16), jnp.asarray(rows))
    g = s.get(include=("embeddings",))
    got = {i: e for i, e in zip(g["ids"], g["embeddings"])}
    np.testing.assert_allclose(got["a3"], rows[3], rtol=1e-6)
    assert s.stats()["pending_host_syncs"] == 0


def test_update_of_pending_slot_not_clobbered():
    """update() on a row whose device add is still pending must win —
    the deferred host fill may not overwrite it afterwards."""
    s = VectorStore(dim=D, engine="tilemax")
    s.add(_ids("a", 8), jnp.asarray(_rows(8, 0)))
    new = _rows(1, 7)
    s.update(["a2"], embeddings=new)
    g = s.get(ids=["a2"], include=("embeddings",))
    np.testing.assert_allclose(g["embeddings"][0], new[0], rtol=1e-6)


def _journal_ops(path):
    with open(os.path.join(path, "journal.jsonl"), encoding="utf-8") as f:
        return [json.loads(line) for line in f]


def test_journal_order_preserved(tmp_path):
    """A host-side op after device adds drains first: the journal lists
    operations in call order, so replay reconstructs the same state."""
    p = str(tmp_path / "s")
    s = VectorStore(dim=D, engine="tilemax", persist_dir=p)
    s.add(_ids("a", 8), jnp.asarray(_rows(8, 0)))
    s.add(_ids("b", 4), jnp.asarray(_rows(4, 1)))
    assert s.stats()["pending_host_syncs"] == 2
    s.delete(["a1"])  # journaled op -> drains the two pending adds first
    ops = _journal_ops(p)
    kinds = [(o["op"], o["id"]) for o in ops]
    assert kinds[:8] == [("add", f"a{i}") for i in range(8)]
    assert kinds[8:12] == [("add", f"b{i}") for i in range(4)]
    assert kinds[12] == ("delete", "a1")

    r = VectorStore.load(p)
    assert r.count() == 11
    q = _rows(2, 9)
    _assert_same(s.query(q, n_results=5), r.query(q, n_results=5))


def test_flush_writes_journal(tmp_path):
    """Durability window: pending rows are NOT in the journal until a
    drain point; flush() closes the window explicitly."""
    p = str(tmp_path / "s")
    s = VectorStore(dim=D, engine="tilemax", persist_dir=p)
    s.add(_ids("a", 8), jnp.asarray(_rows(8, 0)))
    assert not os.path.exists(os.path.join(p, "journal.jsonl"))
    s.flush()
    assert len(_journal_ops(p)) == 8
    assert s.stats()["pending_host_syncs"] == 0


def test_save_drains_and_restores(tmp_path):
    p = str(tmp_path / "s")
    s = VectorStore(dim=D, engine="tilemax", persist_dir=p)
    s.add(_ids("a", 32), jnp.asarray(_rows(32, 0)))
    s.save(p)
    r = VectorStore.load(p)
    assert r.count() == 32
    q = _rows(2, 9)
    _assert_same(s.query(q, n_results=5), r.query(q, n_results=5))


def test_pending_cap_bounds_backlog(monkeypatch):
    monkeypatch.setenv("IMATCH_PENDING_MAX", "3")
    s = VectorStore(dim=D, engine="tilemax")
    for i in range(7):
        s.add(_ids(f"g{i}_", 4), jnp.asarray(_rows(4, i)))
    # every 3rd add drains the backlog: never more than the cap
    assert s.stats()["pending_host_syncs"] < 3
    assert s.count() == 28


def test_sharded_patch_accepts_single_device_committed_rows():
    """A batch COMMITTED to one device (the normal output of an
    unsharded jit'd model) must still patch the mesh-sharded index —
    patch.py replicates it over the index's mesh instead of letting the
    jit raise 'incompatible devices' and degrade every add to a full
    rebuild."""
    import jax

    q = _rows(5, 99)
    s = VectorStore(dim=D, engine="sharded")
    s.add(_ids("a", 200), _rows(200, 0))
    s.query(q, n_results=10)  # force the mesh-sharded build
    rows = _rows(50, 1)
    s.add(_ids("b", 50), jax.device_put(jnp.asarray(rows), jax.devices()[0]))
    assert s.stats()["patched_mutations"] == 1
    f = VectorStore(dim=D, engine="sharded")
    f.add(_ids("a", 200), _rows(200, 0))
    f.add(_ids("b", 50), rows)
    _assert_same(s.query(q, n_results=25), f.query(q, n_results=25))


class _FlakyRows:
    """Raises on the first d2h materialization, then behaves."""

    def __init__(self, arr, fails=1):
        self.arr = np.asarray(arr, np.float32)
        self.fails = fails

    def __array__(self, dtype=None, copy=None):
        if self.fails:
            self.fails -= 1
            raise RuntimeError("simulated d2h failure")
        return self.arr.astype(dtype or np.float32)


def test_drain_failure_keeps_batches_pending(tmp_path):
    """A failed d2h mid-drain must leave the unprocessed batches queued
    for the next drain point — not silently dropped with live ids whose
    mirror rows are zeros and whose journal entries never land."""
    p = str(tmp_path / "s")
    s = VectorStore(dim=D, engine="tilemax", persist_dir=p)
    r0, r1 = _rows(8, 0), _rows(4, 1)
    s.add(_ids("a", 8), jnp.asarray(r0))
    s.add(_ids("b", 4), jnp.asarray(r1))
    assert s.stats()["pending_host_syncs"] == 2
    base, k, rows_dev, ids, mds, docs = s._pending[0]
    s._pending[0] = (base, k, _FlakyRows(rows_dev), ids, mds, docs)
    with pytest.raises(RuntimeError, match="simulated"):
        s.flush()
    # nothing dropped: both batches still pending, retry succeeds
    assert s.stats()["pending_host_syncs"] == 2
    s.flush()
    assert s.stats()["pending_host_syncs"] == 0
    assert len(_journal_ops(p)) == 12
    g = s.get(include=("embeddings",))
    got = {i: e for i, e in zip(g["ids"], g["embeddings"])}
    np.testing.assert_allclose(got["b2"], r1[2], rtol=1e-6)


def test_device_add_validation():
    s = VectorStore(dim=D, engine="tilemax")
    s.add(_ids("a", 4), jnp.asarray(_rows(4, 0)))
    with pytest.raises(ValueError, match="duplicate"):
        s.add(["a1"], jnp.asarray(_rows(1, 1)))
    with pytest.raises(ValueError, match="dim"):
        s.add(["z0"], jnp.asarray(np.zeros((1, D + 1), np.float32)))
    with pytest.raises(ValueError):
        s.add(["z1", "z2"], jnp.asarray(_rows(1, 1)))  # count mismatch
