"""Experiment: W8A8 (int8 weights + dynamic per-token int8 activations)
ViT encoder vs the shipped bf16 path, full-model geometry.

Motivation: DESIGN.md "CLIP encode ceiling" — the towers are
compute-bound at the bf16 MXU roofline, and the v5e MXU rates int8 at
2x bf16. A micro-bench of one MLP-shaped matmul (scripts/exp_int8_mxu.py)
shows the primitive is faster (int8 1.36x) but isolated dynamic
quantization cancels it (1.02x) — the question is whether XLA fuses the
quant/dequant passes into the surrounding ops inside the real scanned
encoder, where the activation is already being produced by a fused
layernorm epilogue.

Measures ViT-B/32 encode at B=512 (the ingest batch) and ViT-L/14 at
B=32, bf16 vs W8A8, chained dispatch + one scalar fetch (the
axon-tunnel-safe pattern: each iteration's input depends on the
previous output, so nothing can dedup or overlap).

Decision rule: >=1.25x at B/32 -> wire as the opt-in
IMATCH_EMBED_QUANT=int8 tier (blessing gated on real weights like the
VLM int8 modes, WEIGHTS.md par. 5); below that, record the dead end in
DESIGN.md next to the whole-layer-fusion ledger.
"""

from __future__ import annotations

import json
import os
import sys
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

from imatch_tpu.models.clip import get_config, init_params
from imatch_tpu.models.clip.model import encode_image
from imatch_tpu.models.clip.quant import (
    encode_image_w8a8,
    quantize_vision_tower,
)

ITERS = 20


def time_encode(fn, weights, pixels):
    """Chained timing: iteration i's input is perturbed by a scalar
    derived from iteration i-1's output, inside ONE jitted scan — the
    tunnel cannot dedup or reorder; one scalar crosses back.

    `weights` MUST be a jit argument, not a closure capture: closed-over
    device arrays become HLO literals, and a ViT tower's ~350 MB of
    literal weights overflows the remote-compile tunnel's request-body
    limit (observed HTTP 413)."""

    @jax.jit
    def loop(weights, pixels):
        def step(c, _):
            out = fn(weights, pixels + c)
            return out[0, 0].astype(pixels.dtype) * 0, None

        c, _ = jax.lax.scan(
            step, jnp.zeros((), pixels.dtype), None, length=ITERS
        )
        return c

    np.asarray(loop(weights, pixels))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(loop(weights, pixels))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend()}
    for name, batch in (("vit-b32", 512), ("vit-l14", 32)):
        cfg = get_config(name)
        params = init_params(jax.random.key(0), cfg)
        qvision = quantize_vision_tower(params["vision"])
        pixels = jnp.asarray(
            rng.standard_normal(
                (batch, cfg.vision.image_size, cfg.vision.image_size, 3)
            ),
            jnp.float32,
        )

        t_bf16 = time_encode(
            lambda p, px, c=cfg: encode_image(p, px, c, dtype=jnp.bfloat16),
            params,
            pixels,
        )
        t_int8 = time_encode(
            lambda w, px, c=cfg: encode_image_w8a8(w[0], w[1], px, c),
            (params, qvision),
            pixels,
        )
        # fidelity on random init (real-weights blessing is gated, but a
        # catastrophic numeric bug shows up even here)
        e_ref = np.asarray(
            jax.jit(
                lambda p, px: encode_image(p, px, cfg, dtype=jnp.float32)
            )(params, pixels[:8])
        )
        e_q = np.asarray(
            jax.jit(
                lambda p, qv, px: encode_image_w8a8(p, qv, px, cfg)
            )(params, qvision, pixels[:8])
        )
        cos = float(np.mean(np.sum(e_ref * e_q, axis=-1)))
        results[name] = {
            "batch": batch,
            "bf16_ms": round(t_bf16 * 1e3, 2),
            "bf16_img_s": round(batch / t_bf16, 0),
            "w8a8_ms": round(t_int8 * 1e3, 2),
            "w8a8_img_s": round(batch / t_int8, 0),
            "speedup": round(t_bf16 / t_int8, 3),
            "cosine_vs_fp32": round(cos, 5),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
