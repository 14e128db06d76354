"""BASELINE config #5 as ONE benchmark: VLM captioning concurrent with
sharded top-k search on the same mesh.

The reference never co-hosts these: captions go to the Moondream cloud
API and search is an hnswlib call (/root/reference/backend/app/main.py:
600,761). On TPU both live on the same chips, so the number that matters
is throughput under CO-RESIDENCY: a captioning stream (the ingest/filter
backfill workload) and a search stream (the serving workload) contending
for the same device queue.

Measures, on a corpus sharded over every local device
(IMATCH_INDEX_ENGINE=sharded through the real VectorStore):
  1. solo search:   p50 + depth-4 pipelined QPS
  2. solo caption:  decode tok/s at batch B
  3. mixed:         both streams for T seconds -> each rate + search p50
                    degradation

Usage: python scripts/bench_serve_mix.py [md_config] [rows]
CPU correctness run: JAX_PLATFORMS=cpu with the virtual 8-device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), tiny-md + small
corpus; TPU perf run: moondream2 + 1M rows.
"""

import functools
import json
import os
import sys
import threading
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "IMATCH_XLA_CACHE", os.path.expanduser("~/.cache/imatch_tpu/xla")
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("IMATCH_WARMUP", "0")

from imatch_tpu.index.store import VectorStore
from imatch_tpu.models.moondream.configs import get_md_config
from imatch_tpu.models.moondream.generate import greedy_generate, prefill
from imatch_tpu.models.moondream.model import (
    init_md_params,
    pack_text_layers,
)


def build_store(rows: int, dim: int) -> VectorStore:
    corpus = jax.random.normal(jax.random.key(1), (rows, dim), jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=-1, keepdims=True)
    host = np.asarray(corpus)
    store = VectorStore(dim=dim, engine="sharded")
    store._emb = host
    store._alive = np.ones((rows,), bool)
    store._ids = [f"v{i:07d}" for i in range(rows)]
    store._meta = [None] * rows
    store._docs = [None] * rows
    store._slot = {s: i for i, s in enumerate(store._ids)}
    store._n = rows
    return store


def make_captioner(cfg_name: str, batch: int, max_new: int):
    """Returns run_once(seg): seg=0 -> ONE monolithic dispatch
    (prefill + full decode scan); seg>0 -> the serving discipline
    (runtime._generate_segmented): bounded decode segments with
    GATE.checkpoint() yield points and depth-~1 drain between them."""
    from imatch_tpu.models.moondream.generate import (
        finish_gen,
        gen_segment,
        init_gen_state,
    )
    from imatch_tpu.runtime.scheduler import GATE

    cfg = get_md_config(cfg_name)
    params = init_md_params(jax.random.key(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    params = pack_text_layers(params)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    @functools.partial(jax.jit, static_argnames=("max_new",))
    def gen(params, feats, tokens, max_new):
        logits, cache, pos = prefill(
            params, cfg, feats, tokens, dtype=dt, max_new=max_new
        )
        return greedy_generate(
            params, cfg, logits, cache, pos, max_new=max_new, dtype=dt
        )

    @functools.partial(jax.jit, static_argnames=("max_new",))
    def gen_prefill(params, feats, tokens, max_new):
        logits, cache, pos = prefill(
            params, cfg, feats, tokens, dtype=dt, max_new=max_new
        )
        return init_gen_state(cfg, logits, cache, pos, max_new=max_new)

    # donated carry + separate scalar tick, mirroring the runtime's
    # _gen_segment: HBM holds ~one cache, and the drain fetch touches
    # an output buffer, never the donated state
    @functools.partial(
        jax.jit, static_argnames=("steps", "max_new"), donate_argnums=(1,)
    )
    def gen_seg(params, state, steps, max_new):
        nxt = gen_segment(
            params, cfg, state, steps=steps, max_new=max_new, dtype=dt
        )
        return nxt, nxt.i

    p, d = cfg.vision.num_patches, cfg.text.hidden_size
    feats = jax.random.normal(jax.random.key(2), (batch, p, d), jnp.float32)
    tokens = jnp.tile(
        jnp.arange(12, dtype=jnp.int32)[None] % cfg.text.vocab_size,
        (batch, 1),
    )

    def run_once(seg: int = 0):
        if seg <= 0:
            r = gen(params, feats, tokens, max_new)
            return batch * int(np.asarray(r.lengths).max())
        state = gen_prefill(params, feats, tokens, max_new)
        prev_tick = None
        for _ in range(-(-max_new // seg)):
            GATE.checkpoint()
            state, tick = gen_seg(params, state, seg, max_new)
            if prev_tick is not None:
                np.asarray(prev_tick)  # drain to depth ~1 (overlapped)
            prev_tick = tick
        r = finish_gen(state, eos=cfg.text.eos_token_id, max_new=max_new)
        return batch * int(np.asarray(r.lengths).max())

    return run_once


def search_stats(store, q, reps):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        store.query(q, n_results=10)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else (
        "moondream2" if on_tpu else "tiny-md"
    )
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else (
        1_000_000 if on_tpu else 20_000
    )
    dim = 512
    batch = 8 if on_tpu else 2
    max_new = 24 if on_tpu else 6
    mix_seconds = 20.0 if on_tpu else 6.0

    seg = int(os.environ.get("IMATCH_MD_SEG", "8"))

    store = build_store(rows, dim)
    n_dev = len(jax.devices())
    q = store._emb[:1]
    store.query(q, n_results=10)  # build + compile
    caption_once = make_captioner(cfg_name, batch, max_new)
    caption_once()  # compile monolithic
    caption_once(seg)  # compile prefill + segment

    # --- solo tiers
    solo_p50 = search_stats(store, q, 30 if on_tpu else 8)
    t0 = time.perf_counter()
    toks = sum(caption_once() for _ in range(3))
    solo_tok_s = toks / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    toks = sum(caption_once(seg) for _ in range(3))
    solo_seg_tok_s = toks / (time.perf_counter() - t0)

    def run_mixed(cap_seg: int):
        """Caption stream + search stream contending for the device."""
        stop = threading.Event()
        out = {"cap_tokens": 0, "search_times": []}

        def cap_worker():
            while not stop.is_set():
                out["cap_tokens"] += caption_once(cap_seg)

        def search_worker():
            while not stop.is_set():
                t0 = time.perf_counter()
                store.query(q, n_results=10)
                out["search_times"].append(time.perf_counter() - t0)

        threads = [
            threading.Thread(target=cap_worker),
            threading.Thread(target=search_worker),
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(mix_seconds)
        stop.set()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        st = out["search_times"]
        return {
            "caption_tok_s": round(out["cap_tokens"] / wall, 1),
            "search_p50_ms": round(
                float(np.median(st)) * 1e3 if st else float("nan"), 3
            ),
            "search_qps": round(len(st) / wall, 1),
        }

    mono = run_mixed(0)
    gated = run_mixed(seg)

    print(
        json.dumps(
            {
                "metric": "serve_mix_caption_plus_sharded_search",
                "backend": jax.default_backend(),
                "devices": n_dev,
                "md_config": cfg_name,
                "corpus_rows": rows,
                "dim": dim,
                "caption_batch": batch,
                "decode_seg": seg,
                "solo_caption_tok_s": round(solo_tok_s, 1),
                "solo_caption_seg_tok_s": round(solo_seg_tok_s, 1),
                "solo_search_p50_ms": round(solo_p50, 3),
                "mixed_monolithic": mono,
                "mixed_segmented_gated": gated,
                "monolithic_p50_inflation": round(
                    mono["search_p50_ms"] / max(solo_p50, 1e-9), 2
                ),
                "segmented_p50_inflation": round(
                    gated["search_p50_ms"] / max(solo_p50, 1e-9), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
