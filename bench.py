"""Headline benchmark: embed+index ingest throughput (images/sec/chip).

BASELINE.json north star: >=5,000 images/sec/chip, CLIP ViT-B/32, TPU
v5e. The measured pipeline is the real ingest hot path
(pipeline/ingest.py semantics, batched): raw decoded uint8 frames ->
device preprocess (MXU resample + normalize, ops/preprocess.py) ->
ViT-B/32 image tower in bf16 -> L2-normalized fp32 embeddings landing on
host (as the index insert does). Also reports top-k search latency over
a 1M-vector corpus (the <10 ms p50 target) in "extras".

Timing note: this environment's axon tunnel gives block_until_ready
dispatch-only semantics and a ~20 ms host round-trip floor, so every
measurement materializes results to numpy (the pipeline does that
anyway) and the search latency is derived from a pipelined multi-query
batch to amortize the tunnel RPC out of per-query device time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from imatch_tpu.index.search import prepare_device_corpus, tilemax_topk
from imatch_tpu.models.clip import get_config, init_params
from imatch_tpu.models.clip.model import encode_image
from imatch_tpu.ops.resize import resize_crop_matrices

BASELINE_IMGS_PER_SEC = 5000.0


def bench_ingest(on_tpu: bool):
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

    @jax.jit
    def ingest_step(params, frames_u8):
        x = frames_u8.astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        x = jnp.einsum("xw,bhwc->bhxc", a_h, x, precision=hi)
        x = jnp.einsum("yh,bhxc->byxc", a_v, x, precision=hi)
        x = (x - mean) * std_inv
        return encode_image(params, x, cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, src, src, 3), dtype=np.uint8)
    )
    np.asarray(ingest_step(params, frames))  # warmup / compile

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    emb = None
    for _ in range(iters):
        emb = ingest_step(params, frames)
    np.asarray(emb)  # device executes in order: last done => all done
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_search(on_tpu: bool):
    n = 1_000_000 if on_tpu else 50_000
    d, k = 512, 10
    corpus = jax.random.normal(jax.random.key(1), (n, d), jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=-1, keepdims=True)
    dc = prepare_device_corpus(corpus, jnp.ones((n,), bool))
    q = corpus[:1]
    np.asarray(tilemax_topk(q, dc, k=k))  # warmup / compile
    # Median of single-query round-trips (includes tunnel RPC overhead)...
    times = []
    reps = 30 if on_tpu else 5
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(tilemax_topk(q, dc, k=k))
        times.append(time.perf_counter() - t0)
    rt_p50 = float(np.median(times)) * 1e3
    # ...and per-query device time from a pipelined run of 20 queries.
    t0 = time.perf_counter()
    outs = [tilemax_topk(q, dc, k=k) for _ in range(20)]
    np.asarray(outs[-1][0])
    dev_ms = (time.perf_counter() - t0) * 1e3 / 20
    return n, round(rt_p50, 3), round(dev_ms, 3)


def main():
    on_tpu = jax.default_backend() == "tpu"
    imgs_per_sec = bench_ingest(on_tpu)
    n_vec, rt_p50, dev_ms = bench_search(on_tpu)
    print(
        json.dumps(
            {
                "metric": "ingest_throughput_vit_b32",
                "value": round(imgs_per_sec, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
                "extras": {
                    "backend": jax.default_backend(),
                    "search_p50_roundtrip_ms": rt_p50,
                    "search_per_query_device_ms": dev_ms,
                    "search_corpus_rows": n_vec,
                    "search_dim": 512,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
