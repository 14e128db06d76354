"""Experiment: does XLA lower int8 x int8 -> int32 dots to the v5e MXU
at ViT tower shapes, and what end-to-end speedup would a W8A8 tower see?

The v5e MXU rates int8 at 2x bf16 (394 vs 197 T*OPS). If XLA maps an
int8 dot_general with preferred_element_type=int32 onto it, a
dynamically-quantized (per-row activations, per-out-channel weights)
ViT tower could nearly double the compute-bound embed throughput
(docs/DESIGN.md "CLIP encode ceiling": towers are at the bf16 MXU
roofline). This script measures the primitive, not the model:

  1. bf16 x bf16 -> fp32 matmul at ViT-B/32 MLP shape (the FLOPs bulk)
  2. int8 x int8 -> int32 same shape
  3. (2) plus the dynamic activation quantize + output dequant ops a
     real W8A8 layer pays

Run on the TPU; prints one JSON line. Decision rule: if (3) < 0.75 x
(1), build the W8A8 tower tier; else record the dead end in DESIGN.md.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    # ViT-B/32 encoder bulk at B=512: tokens = 512*50 = 25600 rows.
    m, d, f = 25600, 768, 3072
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    w32 = jnp.asarray(rng.standard_normal((d, f)), jnp.float32)

    xb = x32.astype(jnp.bfloat16)
    wb = w32.astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16(a, b):
        return jnp.einsum(
            "md,df->mf", a, b, preferred_element_type=jnp.float32
        )

    # Pre-quantized ints: the pure MXU primitive rate.
    xi = jnp.clip(jnp.round(x32 * 10), -127, 127).astype(jnp.int8)
    wi = jnp.clip(jnp.round(w32 * 10), -127, 127).astype(jnp.int8)

    @jax.jit
    def mm_int8(a, b):
        return jax.lax.dot_general(
            a,
            b,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    # Full W8A8 layer cost: dynamic per-row activation quant (bf16 in),
    # int8 dot, dequant to bf16 out. Weight scales are precomputed.
    wscale = (jnp.max(jnp.abs(w32), axis=0) / 127.0).astype(jnp.float32)

    @jax.jit
    def mm_w8a8(a_bf16, b_i8, b_scale):
        amax = jnp.max(jnp.abs(a_bf16).astype(jnp.float32), axis=1)
        ascale = jnp.where(amax > 0, amax / 127.0, 1.0)
        ai = jnp.clip(
            jnp.round(a_bf16.astype(jnp.float32) / ascale[:, None]),
            -127,
            127,
        ).astype(jnp.int8)
        s = jax.lax.dot_general(
            ai, b_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            s.astype(jnp.float32) * ascale[:, None] * b_scale[None, :]
        ).astype(jnp.bfloat16)

    t_bf16 = timeit(mm_bf16, xb, wb)
    t_int8 = timeit(mm_int8, xi, wi)
    t_w8a8 = timeit(mm_w8a8, xb, wi, wscale)

    flops = 2 * m * d * f
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "shape": [m, d, f],
                "bf16_ms": round(t_bf16 * 1e3, 3),
                "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
                "int8_ms": round(t_int8 * 1e3, 3),
                "int8_tops": round(flops / t_int8 / 1e12, 1),
                "w8a8_ms": round(t_w8a8 * 1e3, 3),
                "int8_vs_bf16": round(t_bf16 / t_int8, 2),
                "w8a8_vs_bf16": round(t_bf16 / t_w8a8, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
