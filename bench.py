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

Prints the headline JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}
repeatedly: once right after the headline tier, then re-printed (as a
strict superset — same metric/value, richer extras) after each further
tier, so an external kill at ANY point past the first few minutes still
leaves a parsable capture on stdout (BENCH_r04 was rc=124/parsed=null;
never again). A driver that takes the first line or the last line gets
a valid record either way. Optional tiers are budgeted by per-tier cost
estimates against IMATCH_BENCH_DEADLINE_S and hard-capped in daemon
threads (harness logic: budget_ok / run_capped_tier, unit-tested in
tests/test_bench_harness.py).
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
if os.environ.get("IMATCH_BENCH_FORCE_CPU") == "1":
    # unit tests import this module for the harness helpers: skip the
    # probe subprocess entirely (it would grab the single-client TPU
    # tunnel lease — or stall up to the probe timeout on a hung tunnel)
    # and pin the CPU backend
    jax.config.update("jax_platforms", "cpu")
elif not _accelerator_alive(_PROBE_S):
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


def vit_flops_per_image(cfg) -> float:
    """Matmul FLOPs for one ViT image-tower forward (2*M*N*K per
    matmul): patch embed, per-layer QKV/proj/attention/MLP, final
    projection. Used to report MFU next to the headline img/s —
    BASELINE.md judges the number against the chip's peak, not just
    the 5k img/s bar."""
    v = cfg.vision
    t = (v.image_size // v.patch_size) ** 2 + 1  # tokens incl. cls
    d = v.hidden_size
    f_patch = 2 * t * (v.patch_size**2 * 3) * d
    f_attn = 2 * t * d * (3 * d) + 2 * t * d * d  # qkv + out proj
    f_scores = 2 * t * t * d * 2  # QK^T + attn@V
    f_mlp = 2 * 2 * t * d * (d * v.mlp_ratio)
    f_proj = 2 * d * cfg.projection_dim  # pooled token only
    return float(
        f_patch + v.num_layers * (f_attn + f_scores + f_mlp) + f_proj
    )


# public bf16/int8 peaks for the chip the brief targets; override when
# benching other hardware (IMATCH_PEAK_TFLOPS / IMATCH_PEAK_TOPS_INT8)
V5E_PEAK_BF16 = float(os.environ.get("IMATCH_PEAK_TFLOPS", "197")) * 1e12
V5E_PEAK_INT8 = float(os.environ.get("IMATCH_PEAK_TOPS_INT8", "394")) * 1e12


def bench_ingest(
    on_tpu: bool,
    quant: bool = False,
    batch: int | None = None,
    device_adds: bool = False,
):
    """Headline metric: embedded + INDEXED (BASELINE.md's north star) —
    each batch's embeddings are fetched and inserted into a live
    VectorStore while the device runs the next batches (the fetch +
    host-side add overlap the compute stream, exactly like the real
    pipelined ingest path). With ``quant=True`` the tower runs the
    opt-in W8A8 int8 path (IMATCH_EMBED_QUANT=int8,
    models/clip/quant.py) — reported as an extras tier. ``batch``
    overrides the device chunk size (the B=512/1024/2048 knee sweep).

    With ``device_adds=True`` (the device-resident ingest tier) the
    tower's output is store.add()'ed AS A DEVICE ARRAY: the rows
    scatter device-to-device into the capacity-reserved index buffers
    (index/patch.py) and the host mirror + journal are deferred behind
    an async d2h copy — zero host round-trips per batch on the hot
    path. The timed wall still ends at a materialized top-k answer
    over the full ingested corpus, so the number is embed + index +
    queryable, not embed + fire-and-forget."""
    cfg = get_config("vit-b32")
    params = init_params(jax.random.key(0), cfg)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if batch is None:
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
        from imatch_tpu.ops.preprocess import _resample_precision

        hi = _resample_precision()  # IMATCH_RESIZE_PRECISION, like prod
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
    ids_all = [
        [f"b{it:03d}_{i:04d}" for i in range(batch)] for it in range(iters)
    ]
    if device_adds:
        # reserve capacity up front (the reference sizes hnswlib the
        # same way) so every timed add is an O(batch) device patch —
        # no mid-loop capacity rebuild
        store = VectorStore(
            dim=cfg.projection_dim, capacity=batch * (iters + 2)
        )
        qnp = np.asarray(
            jax.device_get(ingest_step(params, frames))[:1], np.float32
        )
        # warmups OUTSIDE the wall: first add (pre-build, host fill),
        # first query (engine compile + full-capacity corpus upload),
        # second add (compiles the patch-scatter kernels)
        store.add([f"w0_{i}" for i in range(batch)], ingest_step(params, frames))
        store.query(qnp, n_results=10)
        store.add([f"w1_{i}" for i in range(batch)], ingest_step(params, frames))
        t0 = time.perf_counter()
        for it in range(iters):
            store.add(ids=ids_all[it], embeddings=ingest_step(params, frames))
        # the query forces every pending patch; its materialized top-k
        # closes the wall
        store.query(qnp, n_results=10)
        dt = time.perf_counter() - t0
        assert store.count() == batch * (iters + 2)
        assert store.stats()["patched_mutations"] >= iters
        return batch * iters / dt
    store = VectorStore(dim=cfg.projection_dim)
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
    per = max(1, total // depth)
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


def _stage_story(snap, wall_ms, n, src, link_up_mb_s):
    """Per-stage breakdown that reads as the pipeline (round-3 review:
    'stream: 9500, embed: 0' told no story). Top-level stages are
    sequential; ``dedup_overlapped_ms`` runs INSIDE the device stream
    (its time is included in the stream stage, shown for visibility);
    ``upload_at_link_rate_ms`` is the raw frames' bytes divided by the
    measured host->device rate — on this tunnel it explains most of the
    stream stage, on real PCIe it vanishes."""

    def t(key):
        v = snap.get(key)
        return round(v["total_s"] * 1e3, 1) if v else 0.0

    stream, dup = t("ingest.stream"), t("ingest.dup")
    stages = {
        "decode_jpeg_ms": t("ingest.decode"),
        "to_arrays_ms": t("ingest.to_array"),
        "device_upload_dispatch_fetch_ms": round(stream, 1),
        "dedup_overlapped_ms": dup,
        "png_save_ms": t("ingest.save"),
        "png_save_wait_ms": t("ingest.save_wait"),
        "index_add_ms": t("ingest.add"),
    }
    # non-fused-path stages (segmentation on / host fallback): only
    # shown when they actually ran
    for key, label in (
        ("ingest.phash", "host_phash_ms"),
        ("ingest.segment", "segment_ms"),
        ("ingest.embed", "embed_ms"),
    ):
        if t(key):
            stages[label] = t(key)
    seq = (
        stages["decode_jpeg_ms"]
        + stages["to_arrays_ms"]
        + stream
        + stages["png_save_ms"]
        + stages["png_save_wait_ms"]
        + stages["index_add_ms"]
    )
    stages["wall_other_ms"] = round(max(wall_ms - seq, 0.0), 1)
    stages["n_images"] = n  # main() derives the upload-bound rate from this
    upload_mb = n * src * src * 3 / 1e6
    stages["upload_frames_mb"] = round(upload_mb, 1)
    if link_up_mb_s:
        stages["upload_at_link_rate_ms"] = round(
            upload_mb / link_up_mb_s * 1e3, 1
        )
    return stages


def bench_e2e_ingest(embedder, on_tpu: bool, link_up_mb_s: float = 0.0):
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
        stages = _stage_story(snap, dt * 1e3, n, src, link_up_mb_s)
        return ok / dt, round(dt * 1e3, 1), stages


def _make_big_store(n: int, d: int, slack: int = 65536) -> VectorStore:
    """1M-row store, guts assembled directly (row-wise add of 1M vectors
    is host-copy bound and not what we're measuring). ``slack`` unused
    capacity rows let post-build mutations exercise the O(batch) patch
    path instead of a capacity-growth rebuild (index/patch.py) — the
    same padding a normally-grown store would carry."""
    corpus = jax.random.normal(jax.random.key(1), (n, d), jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=-1, keepdims=True)
    host = np.zeros((n + slack, d), np.float32)
    host[:n] = np.asarray(corpus)
    store = VectorStore(dim=d)
    store._emb = host
    store._alive = np.zeros((n + slack,), bool)
    store._alive[:n] = True
    store._ids = [f"v{i:07d}" for i in range(n)]
    store._meta = [None] * n
    store._docs = [None] * n
    store._slot = {s: i for i, s in enumerate(store._ids)}
    store._n = n
    return store


def bench_mutation_latency(store: VectorStore, on_tpu: bool):
    """Post-mutation first-query latency at corpus scale — the VERDICT
    round-3 architectural gap: an invalidating mutation made the next
    query re-copy and re-upload the ENTIRE corpus (~3 GB at 1M x 512);
    the incremental patch (index/patch.py) makes it O(batch). The
    full-rebuild comparison point costs ~108 s at 1M x 512 (measured in
    r03/r04; it is the link-bound corpus re-upload) and is now gated
    behind IMATCH_BENCH_FULL=1 — the patched path is the product, the
    rebuild number is historical (VERDICT r4 next-steps #3). Fail-soft:
    never costs the headline."""
    try:
        batch = 2048
        d = store.dim
        rng = np.random.default_rng(7)
        q = store._emb[:1]
        store.query(q, n_results=10)  # device state hot

        def mutate_and_time(prefix):
            rows = rng.standard_normal((batch, d)).astype(np.float32)
            rows /= np.linalg.norm(rows, axis=1, keepdims=True)
            ids = [f"{prefix}{i:05d}" for i in range(batch)]
            t0 = time.perf_counter()
            store.add(ids=ids, embeddings=rows)
            add_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            store.query(q, n_results=10)
            return add_s, time.perf_counter() - t0

        add_p, first_q_patched = mutate_and_time("mp")
        out = {
            "mutation_batch_rows": batch,
            "mutation_add_patched_ms": round(add_p * 1e3, 1),
            "mutation_first_query_patched_ms": round(first_q_patched * 1e3, 1),
        }
        if os.environ.get("IMATCH_BENCH_FULL") == "1":
            os.environ["IMATCH_INCREMENTAL"] = "0"
            try:
                _, first_q_rebuild = mutate_and_time("mr")
            finally:
                os.environ.pop("IMATCH_INCREMENTAL", None)
            out["mutation_first_query_rebuild_ms"] = round(
                first_q_rebuild * 1e3, 1
            )
        else:
            out["mutation_rebuild_gated"] = (
                "IMATCH_BENCH_FULL=1; 108030 ms at 1Mx512 in BENCH_r04 tail"
            )
        out["mutation_patched_count"] = store.stats()["patched_mutations"]
        return out
    except Exception as e:  # pragma: no cover - diagnostics only
        return {"mutation_tier_error": str(e)[:200]}


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
    qd = jnp.asarray(q)
    outs = [tilemax_topk(qd, dc, k=16) for _ in range(3)]
    ids_bf16 = np.asarray(jax.device_get(outs[-1][1]))
    t0 = time.perf_counter()
    outs = [tilemax_topk(qd, dc, k=16) for _ in range(20)]
    jax.device_get(outs[-1])
    dev_ms = (time.perf_counter() - t0) * 1e3 / 20

    # int8-scoring tier (IMATCH_SCORE_DTYPE=int8): half the phase-1 HBM
    # bytes of bf16. Built device-to-device from the resident fp32
    # exact matrix — no host upload of the corpus. Fidelity cross-check
    # rides along: the fp32 rescore should give the same ids as bf16
    # phase 1 on this probe. Fail-soft: never costs the search tier.
    dev8_ms = int8_match = None
    try:
        dc8 = prepare_device_corpus(
            dc.exact, dc.valid, tile_n=dc.tile_n, score_dtype=jnp.int8
        )
        outs = [tilemax_topk(qd, dc8, k=16) for _ in range(3)]
        ids_int8 = np.asarray(jax.device_get(outs[-1][1]))
        t0 = time.perf_counter()
        outs = [tilemax_topk(qd, dc8, k=16) for _ in range(20)]
        jax.device_get(outs[-1])
        dev8_ms = round((time.perf_counter() - t0) * 1e3 / 20, 3)
        int8_match = bool((ids_bf16 == ids_int8).all())
        del dc8, outs
    except Exception as e:  # HBM pressure / engine mismatch: record, move on
        int8_match = f"skipped: {e}"
    return n, round(store_p50, 3), round(dev_ms, 3), dev8_ms, int8_match


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
        started = threading.Event()

        def run():
            asyncio.set_event_loop(loop)
            loop.create_task(serve_async(app, "127.0.0.1", port))
            started.set()
            loop.run_forever()

        server_thread = threading.Thread(target=run, daemon=True)
        server_thread.start()
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
        # drain the loop before stopping it: cancel + await the server
        # task (and any in-flight connection handlers) so the shutdown
        # leaves no "Task was destroyed but it is pending!" noise in the
        # bench tail (round-3 review item)
        started.wait(5)

        async def _drain():
            pending = asyncio.all_tasks() - {asyncio.current_task()}
            for t in pending:
                t.cancel()
            await asyncio.gather(*pending, return_exceptions=True)

        try:
            asyncio.run_coroutine_threadsafe(_drain(), loop).result(
                timeout=10
            )
        except Exception:
            pass
        loop.call_soon_threadsafe(loop.stop)
        server_thread.join(timeout=10)
        loop.close()
        return round(float(np.median(times)) * 1e3, 3), batch_p50, per_q


def bench_ivf_incremental(on_tpu: bool):
    """ANN-tier mutation cost per ingest batch, decomposed so the
    numbers reconcile with DESIGN.md (round-3's ivf tier timed the
    first post-mutation query, which bundled XLA compiles and the full
    corpus re-upload into 'repair' — the recorded 156 s contradicted
    the design table). Tiers, all on the same store:

    - cold build (train + pack + upload + compiles) and a warm rebuild
      of the SAME state (pack + upload only — the pure re-upload cost
      every invalidating mutation used to pay);
    - patched mutation (default path): add 2048 rows -> O(batch)
      member-table scatter, first query after;
    - repair rebuild (IMATCH_INCREMENTAL=0): assign only the new rows
      + repack + re-upload;
    - repair COMPUTE, measured DIRECTLY (assign 2048 rows against the
      existing centroids + the full member-table repack — the repair
      path's non-upload work, store.py "fresh"-row assign +
      ivf.pack_members). The r03/r04 subtraction metric
      (repair minus warm re-upload) is GONE: its two phases sampled the
      tunnel minutes apart and the 2x day-to-day rate swing once drove
      it negative (-21.95 s in BENCH_r04 — physically impossible;
      VERDICT r4 weak #3). The direct measurement is the methodology.
    - full k-means retrain (IMATCH_IVF_REBUILD_FRAC=0) — gated behind
      IMATCH_BENCH_FULL=1 (157 s at 400k in r04; the patched-vs-repair
      ratio below carries the same story at a fraction of the cost).

    Default rows 150k (was 400k): every phase here is link-rate-bound
    (pack + upload of the member table), so the numbers scale ~linearly
    with rows and the 400k tier was costing ~530 s of a finite driver
    budget to re-prove a known slope. 1M-row records live in DESIGN.md;
    IMATCH_BENCH_IVF_ROWS still does one-off scale runs.

    Fail-soft: the bench must never die on an optional tier."""
    try:
        rows = int(
            os.environ.get(
                "IMATCH_BENCH_IVF_ROWS", "150000" if on_tpu else "30000"
            )
        )
        d = 512
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((rows, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = emb[:8]
        store = VectorStore(dim=d, engine="ivf")
        store.add(ids=[f"r{i:08d}" for i in range(rows)], embeddings=emb)
        t0 = time.perf_counter()
        store.query(q, n_results=10)
        build_cold_s = time.perf_counter() - t0

        def invalidate_and_time():
            # drop ONLY the device state: next query re-packs and
            # re-uploads the unchanged host corpus (no repair work, no
            # mutation) — the isolated re-upload term
            with store._lock:
                store._device = None
                store._gen += 1
            t0 = time.perf_counter()
            store.query(q, n_results=10)
            return time.perf_counter() - t0

        reupload_s = invalidate_and_time()

        # direct, link-independent repair-compute: assign the batch
        # against the EXISTING centroids (one streamed device argmax,
        # the FAISS add discipline) + repack the full member table on
        # host — exactly the work the repair path adds over a plain
        # re-upload (store.py `assign_rows(emb_copy[fresh], ...)` +
        # the pack inside _build_device)
        from imatch_tpu.index.ivf import assign_rows, pack_members

        with store._lock:
            h = store._ivf_host
            cents = np.asarray(h["cents"])
            assign_full = h["assign"][: store._n].copy()
            ok_full = np.asarray(store._alive[: store._n]).copy()
        probe_batch = rng.standard_normal((2048, d)).astype(np.float32)
        probe_batch /= np.linalg.norm(probe_batch, axis=1, keepdims=True)
        t0 = time.perf_counter()
        assign_rows(probe_batch, cents)
        pack_members(assign_full, ok_full, cents.shape[0])
        repair_compute_s = time.perf_counter() - t0

        def add_and_time(prefix):
            batch = rng.standard_normal((2048, d)).astype(np.float32)
            batch /= np.linalg.norm(batch, axis=1, keepdims=True)
            store.add(
                ids=[f"{prefix}{i:05d}" for i in range(2048)],
                embeddings=batch,
            )
            t0 = time.perf_counter()
            store.query(q, n_results=10)
            return time.perf_counter() - t0

        patched_s = add_and_time("p")
        os.environ["IMATCH_INCREMENTAL"] = "0"
        try:
            repair_s = add_and_time("x")
            retrain_s = None
            if os.environ.get("IMATCH_BENCH_FULL") == "1":
                os.environ["IMATCH_IVF_REBUILD_FRAC"] = "0"
                retrain_s = add_and_time("y")
        finally:
            os.environ.pop("IMATCH_IVF_REBUILD_FRAC", None)
            os.environ.pop("IMATCH_INCREMENTAL", None)
        out = {
            "ivf_rows": rows,
            "ivf_build_cold_s": round(build_cold_s, 3),
            "ivf_reupload_only_s": round(reupload_s, 3),
            "ivf_mutation_patched_s": round(patched_s, 4),
            "ivf_repair_rebuild_s": round(repair_s, 3),
            "ivf_repair_compute_s": round(repair_compute_s, 3),
            "ivf_patch_vs_repair_speedup": round(
                repair_s / max(patched_s, 1e-9), 1
            ),
        }
        if retrain_s is not None:
            out["ivf_full_retrain_s"] = round(retrain_s, 3)
            out["ivf_patch_vs_retrain_speedup"] = round(
                retrain_s / max(patched_s, 1e-9), 1
            )
        return out
    except Exception as e:
        return {"ivf_incremental_error": str(e)[:200]}


def bench_baseline_multimodal(embedder, on_tpu: bool):
    """BASELINE config #2: multimodal weighted image+text search on a
    10k-image index (/root/reference/backend/app/main.py:829-867) —
    the composed pipeline (image tower + text tower + device blend +
    index matmul), not its unit pieces. Fail-soft."""
    try:
        from PIL import Image

        from imatch_tpu.pipeline.captioner import NullCaptioner
        from imatch_tpu.pipeline.search import search_multimodal
        from imatch_tpu.pipeline.state import AppState

        n = 10_000 if on_tpu else 2_000
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((n, 512)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        with tempfile.TemporaryDirectory() as root:
            state = AppState(
                root=root,
                embedder=embedder,
                captioner=NullCaptioner(),
                autoload=False,
            )
            state.store.add(
                ids=[f"m{i:05d}" for i in range(n)], embeddings=emb
            )
            img = Image.fromarray(
                rng.integers(0, 256, (256, 256, 3), np.uint8)
            )
            for _ in range(3):  # warm both towers + blend + query path
                search_multimodal(state, img, "a red power drill", 0.5, 10)
            reps = 20 if on_tpu else 4
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                r = search_multimodal(
                    state, img, "a red power drill", 0.5, 10
                )
                times.append(time.perf_counter() - t0)
            assert len(r) == 10
            return {
                "baseline2_multimodal_rows": n,
                "baseline2_multimodal_p50_ms": round(
                    float(np.median(times)) * 1e3, 2
                ),
            }
    except Exception as e:  # pragma: no cover - diagnostics only
        return {"baseline2_error": str(e)[:200]}


def b3_budget_s(on_tpu: bool) -> float:
    """Config #3's wall-clock budget — ONE definition, read both by the
    tier itself and by main()'s have_time estimate / hard cap (a drifted
    duplicate default would desync the estimate from the spend)."""
    return float(
        os.environ.get("IMATCH_BENCH_B3_BUDGET_S", "150" if on_tpu else "30")
    )


def bench_baseline_batch_upload(embedder, on_tpu: bool):
    """BASELINE config #3: the composed batch-upload pipeline — fused
    preprocess + pHash duplicate detection + LIVE filter scoring (a
    saved filter VQA-scores every fresh image during ingest, the
    reference's main.py:707-731 + 1124-1188 chain) with captions on
    (tiny-md geometry; real-weights quality is gated in WEIGHTS.md).

    Bounded by WALL-CLOCK, not by N (VERDICT r4 next-steps #3 — the
    fixed-8192 form is where the r04 driver kill landed): streams
    chunks of 1024 (25% injected duplicates each) through the real
    process_batch until IMATCH_BENCH_B3_BUDGET_S (default 150 s of
    measured work) is spent, then reports the rate over what ran. The
    stages are streaming and corpus-size-independent, so the rate is
    the same number a 100k run would give. Fail-soft."""
    try:
        from imatch_tpu.models.moondream.runtime import MoondreamJax
        from imatch_tpu.pipeline.ingest import process_batch
        from imatch_tpu.pipeline.state import AppState
        from imatch_tpu.runtime.loader import default_loader

        budget_s = b3_budget_s(on_tpu)
        chunk = 1024 if on_tpu else 24
        max_chunks = 8
        src = 256
        loader = default_loader()
        with tempfile.TemporaryDirectory() as root:
            state = AppState(
                root=root,
                embedder=embedder,
                captioner=MoondreamJax(config="tiny-md"),
                autoload=False,
            )
            state.save_filters(["is it red"])  # scored live during ingest
            warm = _make_jpegs(min(chunk, 256), src, seed=12)
            imgs = [loader.wait(loader.submit_bytes(b)) for b in warm]
            process_batch(
                state, imgs, [f"w{i}.jpg" for i in range(len(imgs))]
            )
            total = ok = skipped = 0
            spent = 0.0
            for c in range(max_chunks):
                blobs = _make_jpegs(chunk, src, seed=100 + c)
                blobs = blobs + blobs[: chunk // 4]  # 25% dups for dedup path
                t0 = time.perf_counter()
                tickets = [loader.submit_bytes(b) for b in blobs]
                images = [loader.wait(t) for t in tickets]
                results = process_batch(
                    state,
                    images,
                    [f"b3_{c}_{i}.jpg" for i in range(len(blobs))],
                    raw_bytes=blobs,
                )
                spent += time.perf_counter() - t0
                total += len(blobs)
                ok += sum(1 for r in results if r["status"] == "success")
                skipped += sum(
                    1 for r in results if r["status"] == "skipped"
                )
                if spent >= budget_s:
                    break
        return {
            "baseline3_images": total,
            "baseline3_imgs_per_sec": round(total / spent, 1),
            "baseline3_successful": ok,
            "baseline3_dup_skipped": skipped,
            "baseline3_budget_s": budget_s,
        }
    except Exception as e:  # pragma: no cover - diagnostics only
        return {"baseline3_error": str(e)[:200]}


def bench_baseline_rembg_l14(on_tpu: bool):
    """BASELINE config #4: U²-Net segmentation + ViT-L/14 embed fused
    upload path (/root/reference/backend/app/main.py:654-661 +
    utils.py:73-80) — background removal per image, then the L/14
    tower, through the real process_batch. Fail-soft."""
    try:
        from imatch_tpu.models.u2net.runtime import U2NetSegmenter
        from imatch_tpu.pipeline.captioner import NullCaptioner
        from imatch_tpu.pipeline.embedder import ClipEmbedder
        from imatch_tpu.pipeline.ingest import process_batch
        from imatch_tpu.pipeline.state import AppState
        from imatch_tpu.runtime.loader import default_loader

        n = 256 if on_tpu else 6
        src = 256
        blobs = _make_jpegs(n, src, seed=21)
        loader = default_loader()
        with tempfile.TemporaryDirectory() as root:
            state = AppState(
                root=root,
                embedder=ClipEmbedder(config="vit-l14"),
                captioner=NullCaptioner(),
                segmenter=U2NetSegmenter(),
                autoload=False,
            )
            warm = _make_jpegs(min(n, 64), src, seed=22)
            imgs = [loader.wait(loader.submit_bytes(b)) for b in warm]
            process_batch(
                state,
                imgs,
                [f"w{i}.jpg" for i in range(len(imgs))],
                remove_bg=True,
            )
            t0 = time.perf_counter()
            tickets = [loader.submit_bytes(b) for b in blobs]
            images = [loader.wait(t) for t in tickets]
            results = process_batch(
                state,
                images,
                [f"b4_{i}.jpg" for i in range(n)],
                raw_bytes=blobs,
                remove_bg=True,
            )
            dt = time.perf_counter() - t0
        ok = sum(1 for r in results if r["status"] == "success")
        return {
            "baseline4_images": n,
            "baseline4_rembg_l14_imgs_per_sec": round(ok / dt, 1),
        }
    except Exception as e:  # pragma: no cover - diagnostics only
        return {"baseline4_error": str(e)[:200]}


def budget_ok(left_s: float, est_s: float, margin_s: float = 60.0) -> bool:
    """True if a tier estimated to cost ``est_s`` fits in the remaining
    ``left_s`` with margin. The r04 lesson: `left > 0` lets a tier that
    STARTS in budget run unbounded; the check must price the tier."""
    return left_s > est_s + margin_s


def run_capped_tier(fn, cap_s: float, skip_key: str, abandoned: dict,
                    name: str = "", log=None):
    """Run an optional tier under a hard wall-clock cap in a daemon
    thread. Returns the tier's dict; on timeout returns
    ``{skip_key: "timeout: ..."}`` and sets ``abandoned["flag"]`` — the
    stuck thread may still hold the device, so every LATER capped tier
    short-circuits to a skip record. Exceptions inside the tier become
    ``{skip_key: "error: ..."}``; the bench must never die on an
    optional tier."""
    import threading

    if abandoned.get("flag"):
        return {skip_key: "skipped: a prior tier timed out"}
    box = {}

    def target():
        try:
            box["out"] = fn()
        except BaseException as e:  # noqa: BLE001 — never kill the bench
            box["out"] = {skip_key: f"error: {e}"[:200]}

    th = threading.Thread(target=target, daemon=True, name=f"tier-{name}")
    th.start()
    th.join(cap_s)
    if th.is_alive():
        abandoned["flag"] = True
        if log:
            log(f"{name} hit its {cap_s:.0f}s hard cap — abandoned")
        return {skip_key: f"timeout: exceeded {cap_s:.0f}s hard cap"}
    out = box.get("out")
    if not isinstance(out, dict):  # None / non-dict: keep extras.update safe
        return {skip_key: f"error: tier returned {type(out).__name__}"}
    return out


def main():
    import sys

    from imatch_tpu.pipeline.embedder import ClipEmbedder

    on_tpu = jax.default_backend() == "tpu"
    t_start = time.perf_counter()

    def mark(msg):
        el = time.perf_counter() - t_start
        print(f"[bench] t+{el:.0f}s {msg}", file=sys.stderr, flush=True)

    # Wall-clock budget (BENCH_r04 post-mortem: rc=124, parsed=null —
    # the external kill landed before the old `left > 0` deadline check
    # could help, because a tier that STARTS in budget runs unbounded).
    # Three defenses, per VERDICT r5 item #1:
    #   (a) the headline JSON line is printed EARLY (right after the
    #       core tiers) and re-printed enriched after each optional
    #       tier — a kill at any point after ~the first few minutes
    #       still leaves a parsable capture on stdout;
    #   (b) have_time() takes a per-tier cost ESTIMATE and requires
    #       left > estimate + margin, instead of left > 0;
    #   (c) every optional tier runs under a hard wall-clock cap in a
    #       daemon thread — a tier that blows its estimate is abandoned
    #       (recorded as <tier>_skipped: "timeout") and, since the
    #       stuck thread may still hold the device, all remaining
    #       optional tiers are skipped and the final line prints.
    # Default deadline 2100 s: r04 proved 3300 s never fires before the
    # driver's own kill; the cheapened tier list (rebuild + retrain
    # gated behind IMATCH_BENCH_FULL=1, IVF at 150k rows, config #3
    # wall-bounded) targets ~1300-1600 s total on a median-link day.
    deadline_s = float(os.environ.get("IMATCH_BENCH_DEADLINE_S", "2100"))
    extras = {"backend": jax.default_backend()}
    emitted = {"n": 0}

    def emit(value_imgs_per_sec):
        """Print the full headline JSON line with everything measured so
        far. Called repeatedly; each print is a complete, parsable
        superset of the previous one, so whichever line the driver
        takes (first or last) is valid."""
        emitted["n"] += 1
        print(
            json.dumps(
                {
                    "metric": "ingest_throughput_vit_b32",
                    "value": round(value_imgs_per_sec, 1),
                    "unit": "images/sec/chip",
                    "vs_baseline": round(
                        value_imgs_per_sec / BASELINE_IMGS_PER_SEC, 3
                    ),
                    "extras": extras,
                }
            ),
            flush=True,
        )

    def have_time(tier: str, est_s: float) -> bool:
        left = deadline_s - (time.perf_counter() - t_start)
        if budget_ok(left, est_s):
            return True
        mark(
            f"budget: {left:.0f}s left < {est_s:.0f}s estimate + 60s "
            f"margin — skipping {tier}"
        )
        return False

    abandoned = {"flag": False}

    def run_capped(name: str, fn, cap_s: float, skip_key: str):
        return run_capped_tier(fn, cap_s, skip_key, abandoned, name, mark)

    mark("link bandwidth…")
    link_down, link_up = bench_link_bandwidth()
    extras["link_down_mb_s"] = link_down
    extras["link_up_mb_s"] = link_up
    mark(f"link {link_down}/{link_up} MB/s; headline ingest (embed+index)…")
    imgs_per_sec = bench_ingest(on_tpu)
    flops_img = vit_flops_per_image(get_config("vit-b32"))
    extras["vit_b32_gflops_per_image"] = round(flops_img / 1e9, 2)
    if on_tpu:
        # MFU: headline img/s x ViT-B/32 matmul FLOPs vs chip peak — the
        # scale the brief actually judges throughput on
        extras["mfu_pct_bf16"] = round(
            100.0 * flops_img * imgs_per_sec / V5E_PEAK_BF16, 2
        )
    emit(imgs_per_sec)  # first parsable capture — never again parsed=null

    # device-resident ingest tier: embeddings never leave the device —
    # d2d scatter into the capacity-reserved index (store.add with a
    # jax.Array, index/patch.py), host mirror deferred async. The
    # default headline pays a full d2h fetch + h2d re-upload per corpus
    # through this tunnel; on-device adds are the architecture's real
    # ingest ceiling.
    try:
        dev_rate = bench_ingest(on_tpu, device_adds=True)
        extras["ingest_device_resident_imgs_per_sec"] = round(dev_rate, 1)
        if on_tpu:
            extras["mfu_pct_bf16_device_resident"] = round(
                100.0 * flops_img * dev_rate / V5E_PEAK_BF16, 2
            )
        mark(f"device-resident ingest {dev_rate:.0f} img/s")
        if on_tpu:
            # the two opt-in throughput-profile tiers composed: W8A8
            # tower + d2d index insert (best recorded ingest number)
            dev8_rate = bench_ingest(on_tpu, quant=True, device_adds=True)
            extras["ingest_device_resident_int8_imgs_per_sec"] = round(
                dev8_rate, 1
            )
            extras["mfu_pct_int8_device_resident"] = round(
                100.0 * flops_img * dev8_rate / V5E_PEAK_INT8, 2
            )
            mark(f"device-resident W8A8 {dev8_rate:.0f} img/s")
    except Exception as e:  # pragma: no cover - fail-soft tier
        mark(f"device-resident ingest tier failed: {e}")

    # opt-in W8A8 tier (IMATCH_EMBED_QUANT=int8): measured alongside the
    # bf16 headline so the throughput-profile operating point is a
    # recorded number, not a claim (TPU only — int8 means nothing on the
    # CPU fallback).
    if on_tpu:
        mark(f"headline {imgs_per_sec:.0f} img/s; int8 (W8A8) tier…")
        int8_rate = bench_ingest(on_tpu, quant=True)
        extras["ingest_int8_imgs_per_sec"] = round(int8_rate, 1)
        extras["mfu_pct_int8"] = round(
            100.0 * flops_img * int8_rate / V5E_PEAK_INT8, 2
        )
        # chunk-size knee: is the default B=512 leaving MXU on the table?
        chunk_sweep = {"512": round(imgs_per_sec, 1)}
        for b in (1024, 2048):
            mark(f"chunk sweep B={b}…")
            try:
                chunk_sweep[str(b)] = round(bench_ingest(on_tpu, batch=b), 1)
            except Exception as e:  # pragma: no cover
                chunk_sweep[str(b)] = f"error: {e}"[:80]
        extras["ingest_chunk_sweep_imgs_per_sec"] = chunk_sweep
    emit(imgs_per_sec)

    # e2e tier. Its wall is dominated by the raw-frame h2d upload on
    # this tunnel (r03 stage story: stream 9.5 s of 10.5 s), and the
    # tunnel rate drifts minute to minute — so the link is RE-PROBED at
    # the tier and the upload-bound ceiling it implies is emitted next
    # to the measured rate (VERDICT r5 item #2: the r04 79.3-vs-221.8
    # collapse needs an in-artifact attribution).
    mark("e2e folder ingest…")
    embedder = ClipEmbedder(config="vit-b32")
    _, e2e_link_up = bench_link_bandwidth()
    e2e_rate, e2e_ms, stages = bench_e2e_ingest(
        embedder, on_tpu, link_up_mb_s=e2e_link_up
    )
    extras["e2e_ingest_imgs_per_sec"] = round(e2e_rate, 1)
    extras["e2e_ingest_wall_ms"] = e2e_ms
    extras["e2e_stage_ms"] = stages
    extras["e2e_link_up_mb_s_at_tier"] = e2e_link_up
    if e2e_link_up and stages.get("upload_frames_mb"):
        bound = (
            e2e_link_up / stages["upload_frames_mb"] * stages["n_images"]
        )
        extras["e2e_upload_bound_imgs_per_sec"] = round(bound, 1)
        extras["e2e_vs_upload_bound"] = round(e2e_rate / bound, 3)

    mark(f"e2e {e2e_rate:.1f} img/s; building 1M store…")
    store = _make_big_store(1_000_000 if on_tpu else 50_000, 512)
    n_vec, store_p50, dev_ms, dev8_ms, int8_match = bench_search(
        store, on_tpu
    )
    extras["search_corpus_rows"] = n_vec
    extras["search_dim"] = 512
    extras["search_p50_store_ms"] = store_p50
    extras["search_per_query_device_ms"] = dev_ms
    extras["search_per_query_device_int8_ms"] = dev8_ms
    extras["search_int8_ids_match_bf16"] = int8_match
    mark(f"search p50 {store_p50} ms; rtt + pipelined…")
    rtt_ms = bench_rtt_noop(on_tpu)
    extras["search_rtt_noop_p50_ms"] = rtt_ms
    # the BASELINE <10 ms row, answerable from this artifact alone:
    # p50 minus the measured empty-round-trip floor = the engine's
    # contribution to single-query latency on this link (VERDICT r5
    # item #4; BASELINE.md:16)
    extras["search_p50_minus_rtt_ms"] = round(store_p50 - rtt_ms, 3)
    qps_pipelined, p50_pipelined = bench_search_pipelined(store, on_tpu)
    extras["search_qps_pipelined_depth8"] = qps_pipelined
    extras["search_p50_pipelined_ms"] = p50_pipelined
    qps_coal, p50_coal = bench_search_coalesced(store, on_tpu)
    extras["search_qps_coalesced_depth8"] = qps_coal
    extras["search_p50_coalesced_ms"] = p50_coal
    if on_tpu:
        # the coalescer decision point (round-3 review): does sharing
        # one dispatch ever beat pipelining on this backend? Compare at
        # a saturating depth too, not just 8.
        qp32, pp32 = bench_search_pipelined(store, on_tpu, depth=32)
        qc32, pc32 = bench_search_coalesced(store, on_tpu, depth=32)
        extras["search_qps_pipelined_depth32"] = qp32
        extras["search_p50_pipelined_depth32_ms"] = pp32
        extras["search_qps_coalesced_depth32"] = qc32
        extras["search_p50_coalesced_depth32_ms"] = pc32
    mark(f"rtt {rtt_ms} ms, qps {qps_pipelined} ({qps_coal} coalesced); http…")
    http_p50, http_batch_p50, http_batch_per_q = bench_http_search(
        embedder, store, on_tpu
    )
    extras["search_p50_http_ms"] = http_p50
    extras["search_p50_http_minus_rtt_ms"] = (
        round(http_p50 - rtt_ms, 3) if http_p50 is not None else None
    )
    extras["search_http_batch16_p50_ms"] = http_batch_p50
    extras["search_http_batch16_per_query_ms"] = http_batch_per_q
    emit(imgs_per_sec)  # core tiers complete

    # ---- optional proof tiers: budgeted by estimate, hard-capped ----
    full = os.environ.get("IMATCH_BENCH_FULL") == "1"
    est_mut, cap_mut = (180, 420) if full else (30, 180)
    if have_time("mutation tier", est_mut):
        mark("mutation-latency tier (patched mutation)…")
        extras.update(
            run_capped(
                "mutation",
                lambda: bench_mutation_latency(store, on_tpu),
                cap_mut,
                "mutation_skipped",
            )
        )
        mark(
            "mutation "
            + str({k: v for k, v in extras.items() if k.startswith("mutation")})
        )
    else:
        extras["mutation_skipped"] = "budget"
    del store  # free the 1M corpus before the IVF tier builds its own
    emit(imgs_per_sec)

    est_ivf, cap_ivf = (420, 900) if full else (240, 540)
    if have_time("ivf tier", est_ivf):
        mark("incremental IVF tier…")
        extras.update(
            run_capped(
                "ivf",
                lambda: bench_ivf_incremental(on_tpu),
                cap_ivf,
                "ivf_skipped",
            )
        )
        mark(
            "ivf "
            + str({k: v for k, v in extras.items() if k.startswith("ivf")})
        )
    else:
        extras["ivf_skipped"] = "budget"
    emit(imgs_per_sec)

    if have_time("baseline #2", 90):
        mark("BASELINE config #2 (multimodal 10k)…")
        extras.update(
            run_capped(
                "baseline2",
                lambda: bench_baseline_multimodal(embedder, on_tpu),
                300,
                "baseline2_skipped",
            )
        )
    else:
        extras["baseline2_skipped"] = "budget"
    emit(imgs_per_sec)

    b3_budget = b3_budget_s(on_tpu)
    if have_time("baseline #3", b3_budget + 120):
        mark("BASELINE config #3 (batch upload + dedup + filters)…")
        extras.update(
            run_capped(
                "baseline3",
                lambda: bench_baseline_batch_upload(embedder, on_tpu),
                b3_budget + 300,
                "baseline3_skipped",
            )
        )
    else:
        extras["baseline3_skipped"] = "budget"
    emit(imgs_per_sec)

    if have_time("baseline #4", 180):
        mark("BASELINE config #4 (U²-Net + ViT-L/14 upload)…")
        extras.update(
            run_capped(
                "baseline4",
                lambda: bench_baseline_rembg_l14(on_tpu),
                480,
                "baseline4_skipped",
            )
        )
    else:
        extras["baseline4_skipped"] = "budget"

    extras["bench_wall_s"] = round(time.perf_counter() - t_start, 1)
    emit(imgs_per_sec)  # final, fully enriched line
    mark(f"done in {extras['bench_wall_s']}s ({emitted['n']} emissions)")
    if abandoned["flag"]:
        # a hard-capped tier was abandoned with its daemon thread still
        # inside a device call; normal interpreter teardown then aborts
        # in pthread cleanup ("FATAL: exception not rethrown", rc=134 —
        # observed on a degraded-link night when baseline #2 hit its
        # cap). Everything is printed and flushed; exit without
        # teardown so the driver sees rc=0 next to the parsable output.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


if __name__ == "__main__":
    main()
