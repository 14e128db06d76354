"""Experiment: resample-matmul precision in the fused ingest step.

Motivation: the two PIL-parity resampling einsums in preprocess_core
run at Precision.HIGHEST (fp32, ~6 bf16 MXU passes) to keep resized
pixels within 1 uint8 level of CLIPProcessor's bicubic
(/root/reference/utils.py:76). At B=512/src=256 that is ~90 GFLOP per
batch — ~5.4 TFLOP-equivalent of bf16 time against the tower's
4.5 TFLOP — a plausible ~10% of the fused step. IMATCH_RESIZE_PRECISION
(ops/preprocess.py) now exposes highest | high | default; this script
measures what each buys and what it costs in embedding agreement.

Method: the full fused ingest shape (preprocess_core -> ViT-B/32
encode) at B=512, chained dispatch + scalar fetch (axon-tunnel-safe).
Embedding agreement = cosine between the HIGHEST output and each
cheaper setting on the same frames — measured with random-init weights,
which is indicative only: the real blessing needs real checkpoints +
the drill-ranking gate, same as the int8 tiers (WEIGHTS.md §5).

Decision rule: >=5% throughput at cosine >=0.9999 (random-init) ->
document as a measured opt-in in README/DESIGN (NOT profile-default
until blessed); below that, record the dead end in DESIGN.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from imatch_tpu.models.clip.configs import get_config
from imatch_tpu.models.clip.model import encode_image, init_params
from imatch_tpu.ops import preprocess
from imatch_tpu.ops.resize import resize_crop_matrices


def build_step(precision_name: str, cfg, dtype):
    os.environ["IMATCH_RESIZE_PRECISION"] = precision_name
    # fresh closure per setting: preprocess_core reads the env at trace
    # time, so each jit must trace under its own value
    a_v, a_h = resize_crop_matrices(256, 256, cfg.vision.image_size)
    a_v, a_h = jnp.asarray(a_v), jnp.asarray(a_h)

    @jax.jit
    def step(params, frames_u8):
        x = preprocess.preprocess_core(frames_u8, a_v, a_h, dtype=dtype)
        return encode_image(params, x, cfg, dtype=dtype)

    return step


def main():
    on_tpu = jax.default_backend() != "cpu"
    cfg = get_config("vit-b32")
    params = init_params(jax.random.key(0), cfg)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    b = 512 if on_tpu else 8
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 240, (b, 256, 256, 3), dtype=np.uint8))

    iters = 20 if on_tpu else 2
    out = {"batch": b, "iters": iters, "backend": jax.default_backend()}
    ref_emb = None
    for name in ("highest", "high", "default"):
        step = build_step(name, cfg, dtype)
        e = jax.block_until_ready(step(params, frames))  # compile
        if ref_emb is None:
            ref_emb = np.asarray(e, np.float32)
            cos = 1.0
        else:
            cur = np.asarray(e, np.float32)
            num = (ref_emb * cur).sum(axis=1)
            den = np.linalg.norm(ref_emb, axis=1) * np.linalg.norm(cur, axis=1)
            cos = float(np.min(num / den))
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = step(params, frames)
        np.asarray(r.ravel()[0])  # one scalar fetch after the chain
        dt = time.perf_counter() - t0
        out[name] = {
            "imgs_per_sec": round(b * iters / dt, 1),
            "min_cosine_vs_highest": round(cos, 6),
        }
    out["speedup_default_vs_highest"] = round(
        out["default"]["imgs_per_sec"] / out["highest"]["imgs_per_sec"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
