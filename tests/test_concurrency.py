"""Concurrency stress: interleaved uploads, searches, metadata updates and
filter backfill against one live server — the thread-safety the reference
gets only by running a single worker (SURVEY.md §5 'race detection:
none... unguarded')."""

import asyncio
import socket
import threading
import time

import numpy as np
import pytest
from PIL import Image

from imatch_tpu.client import ImageMatchClient
from imatch_tpu.models.clip.configs import TINY
from imatch_tpu.pipeline.embedder import ClipEmbedder
from imatch_tpu.pipeline.state import AppState
from imatch_tpu.serving.app import create_app
from imatch_tpu.serving.server import serve_async


class SlowFakeCaptioner:
    """Deterministic, with a small sleep to widen race windows."""

    available = True

    def encode_image(self, image_np):
        time.sleep(0.002)
        return {"feat": np.asarray(image_np, np.float32).mean(axis=(0, 1))}

    def caption(self, encoded):
        return {"caption": "an image"}

    def query(self, encoded, question):
        time.sleep(0.002)
        return {"answer": "Yes"}


@pytest.fixture()
def live(tmp_path):
    state = AppState(
        root=str(tmp_path),
        embedder=ClipEmbedder(config=TINY),
        captioner=SlowFakeCaptioner(),
    )
    app = create_app(state)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        task = loop.create_task(serve_async(app, "127.0.0.1", port))
        try:
            loop.run_forever()
        finally:
            task.cancel()

    threading.Thread(target=run, daemon=True).start()
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), 0.2):
                break
        except OSError:
            time.sleep(0.05)
    yield ImageMatchClient(f"http://127.0.0.1:{port}", timeout=120), state
    loop.call_soon_threadsafe(loop.stop)


def _png(tmp_path, i):
    rng = np.random.default_rng(i)
    p = tmp_path / f"img_{i}.png"
    Image.fromarray(
        rng.integers(0, 256, (24 + i % 5, 32, 3), np.uint8)
    ).save(p)
    return str(p)


def test_interleaved_operations(live, tmp_path):
    client, state = live
    n = 12
    paths = [_png(tmp_path, i) for i in range(n)]
    errors = []
    uploaded_ids = []
    id_lock = threading.Lock()

    def uploader(lo, hi):
        try:
            for i in range(lo, hi):
                r = client.upload(paths[i])
                with id_lock:
                    uploaded_ids.append(r["metadata"]["id"])
        except Exception as e:
            errors.append(("upload", e))

    def searcher():
        try:
            for _ in range(10):
                client.search_text("anything", limit=5)
        except Exception as e:
            errors.append(("search", e))

    def filterer():
        try:
            client.add_filter("is it a thing")
            client.wait_for_filter("is it a thing", poll_s=0.05, timeout_s=60)
        except Exception as e:
            errors.append(("filter", e))

    def editor():
        try:
            for _ in range(10):
                with id_lock:
                    ids = list(uploaded_ids)
                if ids:
                    client.update_metadata(ids[0], "concurrent edit")
                time.sleep(0.01)
        except Exception as e:
            errors.append(("edit", e))

    threads = [
        threading.Thread(target=uploader, args=(0, n // 2)),
        threading.Thread(target=uploader, args=(n // 2, n)),
        threading.Thread(target=searcher),
        threading.Thread(target=filterer),
        threading.Thread(target=editor),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "worker hung"
    assert not errors, errors

    # invariants after the storm
    images = client.images()
    assert len(images) == len(set(uploaded_ids)) == n
    assert state.store.count() == n
    # every image got the backfilled filter or the ingest-time application
    p = client.filter_progress("is it a thing")
    assert p["status"] == "completed"
    hits = client.search_text("", filters=["is it a thing"], limit=0)
    # all images answered Yes (fake captioner) through one path or another
    assert len(hits) >= 1


def test_concurrent_searches_pipeline_not_serialize():
    """After the lock-free query fix, N parallel searches must overlap:
    aggregate wall time ~ one query, not N x serial (regression pin for
    VectorStore.query holding the lock across the device call)."""
    from imatch_tpu.index.store import VectorStore

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((256, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store = VectorStore()
    store.add(ids=[f"i{i}" for i in range(256)], embeddings=emb)
    store.query([emb[0]], n_results=4)  # compile + build device state

    orig = store._run_engine
    delay = 0.15

    def slow_engine(q, dc, k):
        time.sleep(delay)  # stands in for device latency
        return orig(q, dc, k)

    store._run_engine = slow_engine
    n = 8
    errors = []

    def one(i):
        try:
            r = store.query([emb[i]], n_results=4)
            assert r["ids"][0][0] == f"i{i}"
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(n)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    wall = time.perf_counter() - t0
    assert not errors, errors
    # serialized would be >= n*delay = 1.2s; pipelined ~ delay + overhead
    assert wall < n * delay / 2, f"searches serialized: {wall:.2f}s"


def test_batch_queries_race_writers():
    """Batched (Q,d) queries racing adds/deletes must stay well-formed:
    exactly Q rows per call, every returned id alive in the captured
    snapshot, no exceptions — the lock-free snapshot contract extended
    to the Q-padded engines behind /api/search/batch."""
    from imatch_tpu.index.store import VectorStore

    rng = np.random.default_rng(7)
    base = rng.standard_normal((128, 32)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    store = VectorStore()
    store.add(ids=[f"i{i}" for i in range(128)], embeddings=base)
    store.query(base[:3], n_results=4)  # compile the batched shape

    stop = threading.Event()
    errors = []

    def writer():
        wrng = np.random.default_rng(100)  # generators are not thread-safe
        try:
            j = 0
            while not stop.is_set():
                extra = wrng.standard_normal((4, 32)).astype(np.float32)
                extra /= np.linalg.norm(extra, axis=1, keepdims=True)
                store.add(
                    ids=[f"w{j}_{k}" for k in range(4)], embeddings=extra
                )
                store.delete([f"w{j}_0"])
                j += 1
        except Exception as e:
            errors.append(("writer", e))

    def batch_reader():
        rrng = np.random.default_rng(threading.get_ident() % 2**31)
        try:
            for _ in range(25):
                q = base[rrng.integers(0, 128, size=3)]
                r = store.query(q, n_results=5)
                assert len(r["ids"]) == 3
                for row in r["ids"]:
                    assert 0 < len(row) <= 5
        except Exception as e:
            errors.append(("reader", e))

    w = threading.Thread(target=writer)
    readers = [threading.Thread(target=batch_reader) for _ in range(3)]
    w.start()
    for t in readers:
        t.start()
    for t in readers:
        t.join(timeout=60)
        assert not t.is_alive(), "batch reader hung"
    stop.set()
    w.join(timeout=30)
    assert not w.is_alive(), "writer hung"
    assert not errors, errors


def test_coalescer_batches_and_matches_direct():
    """Coalescing on: concurrent single-row queries must (a) return
    exactly what the direct path returns and (b) actually share engine
    dispatches under load (fewer engine calls than requests)."""
    from imatch_tpu.index.store import VectorStore

    rng = np.random.default_rng(11)
    emb = rng.standard_normal((200, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    direct = VectorStore()
    direct.add(ids=[f"i{i}" for i in range(200)], embeddings=emb)
    expected = [
        direct.query(emb[i], n_results=4)["ids"][0] for i in range(32)
    ]

    store = VectorStore(coalesce=True)
    assert store.coalescing
    store.add(ids=[f"i{i}" for i in range(200)], embeddings=emb)
    store.query(emb[0], n_results=4)  # compile + spin up the worker

    calls = []
    orig = store._run_engine

    def counting_engine(q, dc, k):
        calls.append(int(q.shape[0]))
        time.sleep(0.03)  # widen the window so batches actually form
        return orig(q, dc, k)

    store._run_engine = counting_engine
    results = [None] * 32
    errors = []

    def one(i):
        try:
            results[i] = store.query(emb[i], n_results=4)["ids"][0]
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors
    assert results == expected
    assert sum(calls) >= 32  # padding may inflate row counts
    assert len(calls) < 32, f"no coalescing happened: {calls}"


def test_coalescer_propagates_engine_errors():
    """A failing engine must raise in every waiting caller, not strand
    futures or kill the worker for later requests."""
    from imatch_tpu.index.store import VectorStore

    rng = np.random.default_rng(13)
    emb = rng.standard_normal((64, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store = VectorStore(coalesce=True)
    store.add(ids=[f"i{i}" for i in range(64)], embeddings=emb)
    store.query(emb[0], n_results=3)  # healthy first

    orig = store._run_engine
    boom = RuntimeError("engine down")

    def failing(q, dc, k):
        raise boom

    store._run_engine = failing
    with pytest.raises(RuntimeError, match="engine down"):
        store.query(emb[1], n_results=3)
    store._run_engine = orig  # worker must still be alive afterwards
    assert store.query(emb[2], n_results=3)["ids"][0][0] == "i2"


def test_coalescer_gate_and_lifecycle(monkeypatch):
    """IMATCH_COALESCE is accelerator-gated: on a CPU backend the env
    var alone must NOT enable coalescing (batched host scoring is
    FLOP-bound, docs/DESIGN.md), while the explicit constructor arg and
    set_coalescing always win; close() rejects late submits."""
    from imatch_tpu.index.store import VectorStore

    monkeypatch.setenv("IMATCH_COALESCE", "1")
    assert not VectorStore().coalescing  # tests run on the CPU backend
    store = VectorStore(coalesce=True)
    assert store.coalescing
    emb = np.eye(4, dtype=np.float32)
    store.add(ids=["a", "b", "c", "d"], embeddings=emb)
    assert store.query(emb[1], n_results=1)["ids"][0] == ["b"]
    store.set_coalescing(False)
    assert not store.coalescing
    # direct path still serves
    assert store.query(emb[2], n_results=1)["ids"][0] == ["c"]


def test_coalescer_mixed_limits_grouped_correctly():
    """Requests with different n_results in one drained batch land in
    separate (k, include) groups (dispatched in parallel) and each gets
    results for ITS k — group splitting must never cross-wire rows."""
    from imatch_tpu.index.store import VectorStore

    rng = np.random.default_rng(17)
    emb = rng.standard_normal((100, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    store = VectorStore(coalesce=True)
    store.add(ids=[f"i{i}" for i in range(100)], embeddings=emb)
    store.query(emb[0], n_results=3)  # spin up + compile one shape

    orig = store._run_engine

    def slow_engine(q, dc, k):
        time.sleep(0.02)  # let mixed-k batches form
        return orig(q, dc, k)

    store._run_engine = slow_engine
    out = {}
    errors = []

    def one(i, k):
        try:
            r = store.query(emb[i], n_results=k)
            out[(i, k)] = r["ids"][0]
        except Exception as e:
            errors.append(e)

    jobs = [(i, k) for i in range(12) for k in (3, 7)]
    threads = [threading.Thread(target=one, args=j) for j in jobs]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors
    store.set_coalescing(False)
    for i, k in jobs:
        row = out[(i, k)]
        assert len(row) == k and row[0] == f"i{i}", (i, k, row)
        assert row == store.query(emb[i], n_results=k)["ids"][0]


def test_ivf_repair_races_writers(monkeypatch):
    """The IVF host state (centroids + assignment table) is captured,
    repaired OUTSIDE the store lock, and installed under a generation
    check — concurrent writers must never corrupt it. Hammer an ivf
    store with interleaved adds/updates/deletes and queries, then pin
    final exactness at full probe against tilemax."""
    import threading

    import numpy as np

    from imatch_tpu.index.store import VectorStore

    monkeypatch.setenv("IMATCH_IVF_NPROBE", "1000000")
    d = 16
    rng = np.random.default_rng(77)

    def vec(i):
        r = np.random.default_rng(i)
        v = r.standard_normal(d).astype(np.float32)
        return v / np.linalg.norm(v)

    store = VectorStore(dim=d, engine="ivf")
    base = np.stack([vec(i) for i in range(400)])
    store.add(ids=[f"b{i:04d}" for i in range(400)], embeddings=base)
    store.query(base[:1], n_results=5)  # initial train

    errors = []
    stop = threading.Event()

    def writer(tid):
        try:
            for i in range(40):
                store.add(
                    ids=[f"w{tid}_{i:03d}"],
                    embeddings=[vec(10_000 + tid * 100 + i)],
                )
                if i % 7 == 3:
                    store.update(
                        ids=[f"w{tid}_{i - 1:03d}"],
                        embeddings=[vec(20_000 + tid * 100 + i)],
                    )
                if i % 11 == 5:
                    store.delete([f"w{tid}_{i - 2:03d}"])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def reader():
        try:
            while not stop.is_set():
                store.query(base[:2], n_results=10)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    writers = [threading.Thread(target=writer, args=(t,)) for t in range(3)]
    readers = [threading.Thread(target=reader) for _ in range(2)]
    for t in readers + writers:
        t.start()
    for t in writers:
        t.join()
    stop.set()
    for t in readers:
        t.join()
    assert not errors, errors

    # final state must be exact vs a tilemax store built from get()
    snap = store.get(include=["embeddings", "metadatas"])
    ref = VectorStore(dim=d, engine="tilemax")
    ref.add(ids=snap["ids"], embeddings=snap["embeddings"])
    q = np.stack([vec(i + 500) for i in range(4)])
    got = store.query(q, n_results=10)
    want = ref.query(q, n_results=10)
    assert got["ids"] == want["ids"]


def test_coalescer_close_races_submitters():
    """submit() and close() are synchronized: every submit either
    completes, or raises CoalescerClosed — never blocks forever on a
    stranded future."""
    import threading

    import numpy as np

    from imatch_tpu.index.store import VectorStore
    from imatch_tpu.runtime.coalesce import CoalescerClosed

    for _ in range(10):
        store = VectorStore(dim=8, engine="tilemax", coalesce=True)
        emb = np.eye(8, dtype=np.float32)
        store.add(ids=[f"r{i}" for i in range(8)], embeddings=emb)
        outcomes = []

        def hammer():
            try:
                r = store.query(emb[:1], n_results=2)
                outcomes.append(("ok", r["ids"][0][0]))
            except Exception as e:  # noqa: BLE001
                outcomes.append(("err", type(e).__name__))

        ts = [threading.Thread(target=hammer) for _ in range(6)]
        for t in ts[:3]:
            t.start()
        store.set_coalescing(False)
        for t in ts[3:]:
            t.start()
        for t in ts:
            t.join(timeout=30)
            assert not t.is_alive(), "stranded submitter"
        # the store.query fallback converts CoalescerClosed into a
        # direct dispatch, so every request succeeds
        assert all(o[0] == "ok" and o[1] == "r0" for o in outcomes), outcomes


def test_discarded_store_with_coalescer_is_collected():
    """A store dropped WITHOUT set_coalescing(False) must still be
    garbage-collectable: the worker holds its dispatch target weakly
    and a finalizer closes the coalescer when the store dies."""
    import gc
    import time
    import weakref

    import numpy as np

    from imatch_tpu.index.store import VectorStore

    store = VectorStore(dim=8, engine="tilemax", coalesce=True)
    store.add(ids=["a"], embeddings=np.eye(8, dtype=np.float32)[:1])
    store.query(np.eye(8, dtype=np.float32)[:1], n_results=1)  # start worker
    ref = weakref.ref(store)
    del store
    for _ in range(20):
        gc.collect()
        if ref() is None:
            break
        time.sleep(0.05)
    assert ref() is None, "coalescer worker pinned the discarded store"
