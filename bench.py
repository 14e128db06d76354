"""Headline benchmark: embed+index ingest throughput (images/sec/chip).

BASELINE.json north star: >=5,000 images/sec/chip, CLIP ViT-B/32, TPU
v5e. Three measurement tiers:

1. **Device ingest** (the headline metric): raw decoded uint8 frames ->
   device preprocess (MXU resample + normalize) -> ViT-B/32 tower in
   bf16 -> fp32 embeddings on host. The ceiling the host path must feed.
2. **End-to-end folder ingest** ("e2e_ingest_imgs_per_sec"): JPEG bytes
   -> native C++ decode pool -> pHash (device buckets + host fallback)
   -> device preprocess+embed -> processed-PNG saves (thread pool) ->
   store.add — the REAL /api/upload-folder pipeline (captioner off),
   reference anchor /root/reference/backend/app/main.py:613-746,
   1124-1188. Per-stage breakdown in extras.
3. **Search latency** over a 1M x 512 corpus: store-level
   ``VectorStore.query`` single-query round-trips (the <10 ms p50
   target surface), amortized per-query device time from a pipelined
   batch, and HTTP-level GET /api/search/text p50 against a live
   server (text tower + index matmul chained on device = one blocking
   transfer per request).

Timing note: this environment's axon tunnel gives block_until_ready
dispatch-only semantics and a ~20-25 ms host round-trip floor, so every
measurement materializes results to numpy (the pipeline does that
anyway); single-query round-trip numbers include one tunnel RTT.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}
"""

from __future__ import annotations

import io
import json
import os
import tempfile
import time

os.environ.setdefault("IMATCH_WARMUP", "0")
os.environ.setdefault("IMATCH_CAPTIONER", "null")
os.environ.setdefault("IMATCH_JOURNAL_FSYNC", "0")

import jax


def _accelerator_alive(timeout_s: float) -> bool:
    """Probe the accelerator in a SUBPROCESS with a hard timeout. The
    axon tunnel has had multi-hour outages during which backend init
    hangs forever in-process (no exception to catch) — a bench that
    hangs is worse than a CPU-fallback bench. Must run BEFORE anything
    creates a jnp value: even importing imatch_tpu modules materializes
    module-level constants, which initializes the backend. The probe
    exits cleanly on success so it never wedges the single-client
    tunnel lease."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


_PROBE_S = float(os.environ.get("IMATCH_BENCH_PROBE_TIMEOUT", "120"))
if not _accelerator_alive(_PROBE_S):
    import sys

    print(
        f"[bench] accelerator probe failed within {_PROBE_S:.0f}s "
        "(tunnel down?) — falling back to CPU so the bench still "
        "reports a line",
        file=sys.stderr,
        flush=True,
    )
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from imatch_tpu.index.search import prepare_device_corpus, tilemax_topk
from imatch_tpu.index.store import VectorStore
from imatch_tpu.models.clip import get_config, init_params
from imatch_tpu.models.clip.model import encode_image
from imatch_tpu.ops.resize import resize_crop_matrices
from imatch_tpu.utils.metrics import METRICS

BASELINE_IMGS_PER_SEC = 5000.0


def bench_ingest(on_tpu: bool, quant: bool = False):
    """Headline metric: embedded + INDEXED (BASELINE.md's north star) —
    each batch's embeddings are fetched and inserted into a live
    VectorStore while the device runs the next batches (the fetch +
    host-side add overlap the compute stream, exactly like the real
    pipelined ingest path). With ``quant=True`` the tower runs the
    opt-in W8A8 int8 path (IMATCH_EMBED_QUANT=int8,
    models/clip/quant.py) — reported as an extras tier."""
    cfg = get_config("vit-b32")
    params = init_params(jax.random.key(0), cfg)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 512 if on_tpu else 16
    src = 256  # typical decoded size; resample 256 -> 224 on device

    a_v, a_h = resize_crop_matrices(src, src, 224)
    a_v, a_h = jnp.asarray(a_v), jnp.asarray(a_h)

    from imatch_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

    mean = jnp.asarray(CLIP_MEAN * 255.0)
    std_inv = jnp.asarray(1.0 / (CLIP_STD * 255.0))

    if quant:
        from imatch_tpu.models.clip.quant import (
            encode_image_w8a8,
            quantize_vision_tower,
        )

        qvision = jax.block_until_ready(
            quantize_vision_tower(params["vision"])
        )

    @jax.jit
    def ingest_step(params, frames_u8):
        if quant:
            params, qv = params
        x = frames_u8.astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        x = jnp.einsum("xw,bhwc->bhxc", a_h, x, precision=hi)
        x = jnp.einsum("yh,bhxc->byxc", a_v, x, precision=hi)
        x = (x - mean) * std_inv
        if quant:
            return encode_image_w8a8(params, qv, x, cfg)
        return encode_image(params, x, cfg, dtype=dtype)

    if quant:
        params = (params, qvision)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, src, src, 3), dtype=np.uint8)
    )
    np.asarray(ingest_step(params, frames))  # warmup / compile

    iters = 20 if on_tpu else 3
    store = VectorStore(dim=cfg.projection_dim)
    ids_all = [
        [f"b{it:03d}_{i:04d}" for i in range(batch)] for it in range(iters)
    ]
    t0 = time.perf_counter()
    outs = [ingest_step(params, frames) for _ in range(iters)]
    # one bulk materialization (one link round-trip for all batches —
    # per-batch np.asarray would pay ~25 ms tunnel RTT per iteration in
    # this environment; on real PCIe hardware either form is free), then
    # the host-side index inserts, all inside the timed wall.
    outs = jax.device_get(outs)
    for it, o in enumerate(outs):
        store.add(ids=ids_all[it], embeddings=o)
    dt = time.perf_counter() - t0
    assert store.count() == batch * iters
    return batch * iters / dt


def bench_rtt_noop(on_tpu: bool):
    """p50 of the smallest possible device round-trip (jitted x+1 on one
    float, scalar fetch): the environment's hard floor for any
    synchronous single-query latency number. If search p50 minus device
    compute time ~= this, the <10 ms BASELINE target is gated by the
    link, not the engine."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((1,), jnp.float32)
    np.asarray(f(x))  # compile
    reps = 50 if on_tpu else 10
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))
        times.append(time.perf_counter() - t0)
    return round(float(np.median(times)) * 1e3, 3)


def bench_link_bandwidth():
    """Host<->device link MB/s, both directions. In this environment
    the link is a tunnel whose bandwidth varies RUN TO RUN (measured
    27-60 MB/s down on different days); the headline ingest fetches
    ~20 MB of embeddings and the e2e tier uploads ~0.8 GB of frames
    inside their timed walls, so recording the link rate alongside
    makes cross-round comparisons interpretable. On real PCIe
    (~16 GB/s) both transfers are negligible."""
    x = jax.block_until_ready(jnp.ones((5_000_000,), jnp.float32))  # 20MB
    np.asarray(x[:8])
    t0 = time.perf_counter()
    np.asarray(x)
    down = 20.0 / (time.perf_counter() - t0)
    big = np.ones((10_000_000,), np.float32)  # 40 MB
    jax.block_until_ready(jnp.asarray(big[:8]))
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(big))
    up = 40.0 / (time.perf_counter() - t0)
    return round(down, 1), round(up, 1)


def bench_search_pipelined(store: VectorStore, on_tpu: bool, depth: int = 8):
    """Depth-N concurrent clients against the same store: per-request
    latency stays at the round-trip floor, but throughput scales with
    depth because queries pipeline on the device (lock-free snapshots,
    dispatch outside the store lock). QPS >> 1/p50 proves the p50 floor
    is waiting, not engine occupancy."""
    import threading

    q = store._emb[:1]
    store.query(q, n_results=10)  # warm
    total = 96 if on_tpu else 12
    per = total // depth
    times = []
    tlock = threading.Lock()

    def worker():
        mine = []
        for _ in range(per):
            t0 = time.perf_counter()
            store.query(q, n_results=10)
            mine.append(time.perf_counter() - t0)
        with tlock:
            times.extend(mine)

    threads = [threading.Thread(target=worker) for _ in range(depth)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    qps = depth * per / dt
    return round(qps, 1), round(float(np.median(times)) * 1e3, 3)


def bench_search_coalesced(store: VectorStore, on_tpu: bool, depth: int = 8):
    """Same depth-N client storm with IMATCH_COALESCE=1: concurrent
    singles share one engine dispatch (runtime/coalesce.py), so the
    device runs ~depth fewer programs per second for the same QPS —
    the saturated-serving operating point (throughput profile)."""
    store.set_coalescing(True)
    try:
        # pre-compile the Q buckets coalesced batches can land on —
        # otherwise the first batch of each size pays its XLA compile
        # inside the timed window
        store.warm(n_results_list=(10,), q_counts=(1, 2, 4, 8))
        store.query(store._emb[:1], n_results=10)  # spin up the worker
        return bench_search_pipelined(store, on_tpu, depth=depth)
    finally:
        store.set_coalescing(False)


def _make_jpegs(n: int, src: int, seed: int = 1):
    """Random RGB frames as JPEG bytes (what an upload actually carries)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    out = []
    # low-frequency content so JPEG size is realistic, not noise-worst-case
    for i in range(n):
        base = rng.integers(0, 256, (16, 16, 3), np.uint8)
        im = Image.fromarray(base).resize((src, src), Image.Resampling.BILINEAR)
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=90)
        out.append(buf.getvalue())
    return out


def bench_e2e_ingest(embedder, on_tpu: bool):
    """The real folder-ingest chain, measured from encoded bytes to
    store.add, with the per-stage breakdown."""
    from PIL import Image

    from imatch_tpu.pipeline.ingest import process_batch
    from imatch_tpu.pipeline.captioner import NullCaptioner
    from imatch_tpu.pipeline.state import AppState
    from imatch_tpu.runtime.loader import default_loader

    n = 2048 if on_tpu else 24
    src = 256
    blobs = _make_jpegs(n, src)
    loader = default_loader()

    with tempfile.TemporaryDirectory() as root:
        state = AppState(
            root=root,
            embedder=embedder,
            captioner=NullCaptioner(),
            autoload=False,
        )
        # warm the compiled paths (phash geometry, preprocess, tower
        # chunks) with a disjoint set so the timed run hits no compiles
        # DIFFERENT seed than the timed blobs: same-seed frames would be
        # content-phash duplicates and the timed run would dedup-skip
        # them, measuring a short-circuited pipeline
        warm = _make_jpegs(min(n, 512), src, seed=7)
        imgs = [loader.wait(loader.submit_bytes(b)) for b in warm]
        process_batch(state, imgs, [f"w{i}.jpg" for i in range(len(imgs))])

        METRICS.reset()
        t0 = time.perf_counter()
        tickets = [loader.submit_bytes(b) for b in blobs]
        with METRICS.timer("ingest.decode"):
            # raw loader arrays straight through (no PIL round-trip) —
            # the same form the serving upload-folder path uses
            images = [loader.wait(t) for t in tickets]
        names = [f"bench_{i}.jpg" for i in range(n)]
        results = process_batch(state, images, names, raw_bytes=blobs)
        dt = time.perf_counter() - t0

        ok = sum(1 for r in results if r["status"] == "success")
        snap = METRICS.snapshot()["timings"]
        stages = {
            k.split(".", 1)[1]: round(v["total_s"] * 1e3, 1)
            for k, v in snap.items()
            if k.startswith("ingest.") or k == "embed.image"
        }
        stages["embed"] = stages.pop("image", stages.get("embed", 0.0))
        return ok / dt, round(dt * 1e3, 1), stages


def _make_big_store(n: int, d: int) -> VectorStore:
    """1M-row store, guts assembled directly (row-wise add of 1M vectors
    is host-copy bound and not what we're measuring)."""
    corpus = jax.random.normal(jax.random.key(1), (n, d), jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=-1, keepdims=True)
    host = np.asarray(corpus)
    store = VectorStore(dim=d)
    store._emb = host
    store._alive = np.ones((n,), bool)
    store._ids = [f"v{i:07d}" for i in range(n)]
    store._meta = [None] * n
    store._docs = [None] * n
    store._slot = {s: i for i, s in enumerate(store._ids)}
    store._n = n
    return store


def bench_search(store: VectorStore, on_tpu: bool):
    n = store.count()
    k = 10
    q = store._emb[:1]
    store.warm((k,))
    store.query(q, n_results=k)  # warm the full query path

    reps = 30 if on_tpu else 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        store.query(q, n_results=k)
        times.append(time.perf_counter() - t0)
    store_p50 = float(np.median(times)) * 1e3

    # per-query device time from a pipelined run on the raw engine
    _, dc = store._device_state()
    outs = [tilemax_topk(jnp.asarray(q), dc, k=16) for _ in range(3)]
    jax.device_get(outs[-1])
    t0 = time.perf_counter()
    outs = [tilemax_topk(jnp.asarray(q), dc, k=16) for _ in range(20)]
    jax.device_get(outs[-1])
    dev_ms = (time.perf_counter() - t0) * 1e3 / 20
    return n, round(store_p50, 3), round(dev_ms, 3)


def bench_http_search(embedder, store: VectorStore, on_tpu: bool):
    """p50 of real GET /api/search/text requests against a live server
    backed by the 1M-row store."""
    import asyncio
    import socket
    import threading
    import urllib.request

    from imatch_tpu.pipeline.captioner import NullCaptioner
    from imatch_tpu.pipeline.state import AppState
    from imatch_tpu.serving.app import create_app
    from imatch_tpu.serving.server import serve_async

    with tempfile.TemporaryDirectory() as root:
        state = AppState(
            root=root,
            embedder=embedder,
            captioner=NullCaptioner(),
            autoload=False,
        )
        state.store = store
        app = create_app(state, root=root)
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        loop = asyncio.new_event_loop()

        def run():
            asyncio.set_event_loop(loop)
            loop.create_task(serve_async(app, "127.0.0.1", port))
            loop.run_forever()

        threading.Thread(target=run, daemon=True).start()
        url = f"http://127.0.0.1:{port}/api/search/text?query=red%20drill&limit=10"
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                urllib.request.urlopen(url, timeout=60).read()
                break
            except OSError:
                time.sleep(0.2)
        for _ in range(3):  # warm text tower + chained query path
            urllib.request.urlopen(url, timeout=600).read()
        reps = 30 if on_tpu else 5
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            body = urllib.request.urlopen(url, timeout=600).read()
            times.append(time.perf_counter() - t0)
        assert json.loads(body)["results"], "search returned nothing"

        # batched endpoint: 16 queries in ONE request = one text-tower
        # dispatch + one index dispatch + one transfer. Per-query cost
        # amortizes the round-trip floor — the way the <10 ms/query
        # target is met on links where a single request can't beat RTT.
        # Fail-soft: a problem here must not cost the headline numbers.
        batch_p50 = per_q = None
        try:
            bq = 16
            payload = json.dumps(
                {"queries": [f"photo number {i} of a drill" for i in range(bq)],
                 "limit": 10}
            ).encode()
            breq = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/search/batch",
                data=payload,
                headers={"Content-Type": "application/json"},
            )
            for _ in range(3):
                urllib.request.urlopen(breq, timeout=600).read()
            btimes = []
            for _ in range(reps):
                t0 = time.perf_counter()
                bbody = urllib.request.urlopen(breq, timeout=600).read()
                btimes.append(time.perf_counter() - t0)
            rows = json.loads(bbody)["results"]
            assert len(rows) == bq and rows[0], "batch search returned nothing"
            batch_p50 = round(float(np.median(btimes)) * 1e3, 3)
            per_q = round(batch_p50 / bq, 3)
        except Exception as e:  # pragma: no cover - diagnostics only
            import sys

            print(f"[bench] batch-search tier failed: {e}", file=sys.stderr)
        loop.call_soon_threadsafe(loop.stop)
        return round(float(np.median(times)) * 1e3, 3), batch_p50, per_q


def bench_ivf_incremental(on_tpu: bool):
    """ANN-tier rebuild cost per ingest batch: repair (assign only the
    new rows against existing centroids, round-3) vs the old full
    k-means. Fail-soft: the bench must never die on an optional tier."""
    import time

    try:
        rows = 400_000 if on_tpu else 30_000
        d = 512
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((rows, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = emb[:8]
        store = VectorStore(dim=d, engine="ivf")
        store.add(ids=[f"r{i:08d}" for i in range(rows)], embeddings=emb)
        t0 = time.perf_counter()
        store.query(q, n_results=10)
        build_s = time.perf_counter() - t0
        batch = emb[:2048] * -1.0
        store.add(
            ids=[f"x{i:05d}" for i in range(2048)], embeddings=batch
        )
        t0 = time.perf_counter()
        store.query(q, n_results=10)
        repair_s = time.perf_counter() - t0
        os.environ["IMATCH_IVF_REBUILD_FRAC"] = "0"
        store.add(ids=["y0"], embeddings=emb[:1])
        t0 = time.perf_counter()
        store.query(q, n_results=10)
        retrain_s = time.perf_counter() - t0
        os.environ.pop("IMATCH_IVF_REBUILD_FRAC", None)
        return {
            "ivf_rows": rows,
            "ivf_initial_build_s": round(build_s, 3),
            "ivf_repair_rebuild_s": round(repair_s, 3),
            "ivf_full_retrain_s": round(retrain_s, 3),
            "ivf_repair_speedup": round(retrain_s / max(repair_s, 1e-9), 1),
        }
    except Exception as e:
        return {"ivf_incremental_error": str(e)[:200]}


def main():
    import sys

    from imatch_tpu.pipeline.embedder import ClipEmbedder

    def mark(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    on_tpu = jax.default_backend() == "tpu"
    mark("link bandwidth…")
    link_down, link_up = bench_link_bandwidth()
    mark(f"link {link_down}/{link_up} MB/s; headline ingest (embed+index)…")
    imgs_per_sec = bench_ingest(on_tpu)

    # opt-in W8A8 tier (IMATCH_EMBED_QUANT=int8): measured alongside the
    # bf16 headline so the throughput-profile operating point is a
    # recorded number, not a claim (TPU only — int8 means nothing on the
    # CPU fallback).
    int8_imgs_per_sec = None
    if on_tpu:
        mark(f"headline {imgs_per_sec:.0f} img/s; int8 (W8A8) tier…")
        int8_imgs_per_sec = bench_ingest(on_tpu, quant=True)

    mark(f"headline {imgs_per_sec:.0f} img/s; e2e folder ingest…")
    embedder = ClipEmbedder(config="vit-b32")
    e2e_rate, e2e_ms, stages = bench_e2e_ingest(embedder, on_tpu)

    mark(f"e2e {e2e_rate:.1f} img/s; building 1M store…")
    store = _make_big_store(1_000_000 if on_tpu else 50_000, 512)
    n_vec, store_p50, dev_ms = bench_search(store, on_tpu)
    mark(f"search p50 {store_p50} ms; rtt + pipelined…")
    rtt_ms = bench_rtt_noop(on_tpu)
    qps_pipelined, p50_pipelined = bench_search_pipelined(store, on_tpu)
    qps_coal, p50_coal = bench_search_coalesced(store, on_tpu)
    mark(f"rtt {rtt_ms} ms, qps {qps_pipelined} ({qps_coal} coalesced); http…")
    http_p50, http_batch_p50, http_batch_per_q = bench_http_search(
        embedder, store, on_tpu
    )
    del store  # free the 1M corpus before the IVF tier builds its own
    mark("incremental IVF tier…")
    ivf_stats = bench_ivf_incremental(on_tpu)
    mark(f"ivf {ivf_stats}")

    print(
        json.dumps(
            {
                "metric": "ingest_throughput_vit_b32",
                "value": round(imgs_per_sec, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
                "extras": {
                    "backend": jax.default_backend(),
                    **(
                        {"ingest_int8_imgs_per_sec": round(int8_imgs_per_sec, 1)}
                        if int8_imgs_per_sec is not None
                        else {}
                    ),
                    "e2e_ingest_imgs_per_sec": round(e2e_rate, 1),
                    "e2e_ingest_wall_ms": e2e_ms,
                    "e2e_stage_ms": stages,
                    "search_p50_store_ms": store_p50,
                    "search_p50_http_ms": http_p50,
                    "search_http_batch16_p50_ms": http_batch_p50,
                    "search_http_batch16_per_query_ms": http_batch_per_q,
                    "search_per_query_device_ms": dev_ms,
                    "search_rtt_noop_p50_ms": rtt_ms,
                    "search_qps_pipelined_depth8": qps_pipelined,
                    "search_p50_pipelined_ms": p50_pipelined,
                    "search_qps_coalesced_depth8": qps_coal,
                    "search_p50_coalesced_ms": p50_coal,
                    "search_corpus_rows": n_vec,
                    "search_dim": 512,
                    "link_down_mb_s": link_down,
                    "link_up_mb_s": link_up,
                    **ivf_stats,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
