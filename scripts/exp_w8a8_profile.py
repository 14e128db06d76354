"""Experiment: where does the W8A8 tier's int8 headroom go?

Measured (BENCH r4 full run): bf16 ingest 9.4k img/s at 42% of bf16
peak, W8A8 10.1k img/s at only ~22% of int8 peak — the tier realizes
~1.07x of a nominal 2x MXU rating. Hypotheses, each isolated below on
the ViT-B/32 tower (B=512, preprocess excluded so the tower is the
only moving part):

  A. XLA's int8 dot_general at the tower's shapes never reaches the
     394-TOPS rating -> per-shape matmul microbench, bf16 vs int8.
  B. The 4 dynamic-activation quantize passes per layer (fp32 amax
     reduce + rescale + int8 write; models/clip/quant.py) cost HBM
     round-trips comparable to the matmul savings -> variant with the
     amax reduce replaced by a fixed-scale cast (same shapes/dtypes,
     wrong numerics — timing only).
  C. The fp32 dequant epilogue (int32 -> fp32 * ascale * wscale)
     doubles the activation write traffic vs bf16 -> visible as the
     gap left after A and B are accounted.

Method: chained dispatch + one-scalar fetch (axon-tunnel-safe, same as
bench.py). Variants re-jit fresh closures; the fake-quant variants
monkeypatch models/clip/quant's module-level _quant_rows/_qdot hooks
(timing-only surgery — numerics are deliberately wrong there, never
ship it). Output: one JSON line; fold conclusions into DESIGN.md.
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
from imatch_tpu.models.clip import quant as clipquant


def timed(fn, args, iters):
    r = jax.block_until_ready(fn(*args))  # compile
    # warm the FETCH path untimed: on the axon tunnel the first d2h for
    # a given (shape, dtype) stalls 80-440 s (measured 2026-08-19 —
    # block_until_ready does not force full remote execution; the first
    # fetch does). Without this the first timed variant eats the stall
    # and reads 100-700x slow.
    np.asarray(r.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r.ravel()[0])
    return time.perf_counter() - t0, r


def matmul_microbench(n, d, mlp, iters):
    """bf16 vs int8 dot at the tower's three dense shapes."""
    shapes = [(n, d, d), (n, d, mlp), (n, mlp, d)]
    rng = np.random.default_rng(0)
    out = {}
    for m, k, f in shapes:
        flops = 2 * m * k * f * iters
        xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((k, f)), jnp.bfloat16)
        fb = jax.jit(
            lambda x, w: jax.lax.dot(
                x, w, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
        )
        dt, _ = timed(fb, (xb, wb), iters)
        xi = jnp.asarray(
            rng.integers(-127, 128, (m, k), dtype=np.int8)
        )
        wi = jnp.asarray(
            rng.integers(-127, 128, (k, f), dtype=np.int8)
        )
        fi = jax.jit(
            lambda x, w: jax.lax.dot(
                x, w, preferred_element_type=jnp.int32
            )
        )
        dti, _ = timed(fi, (xi, wi), iters)
        # int8 with the shipped dequant epilogue (fp32 scale multiply
        # then bf16 cast) — the realistic per-dot cost incl. epilogue
        sc = jnp.ones((m, 1), jnp.float32)
        ws = jnp.ones((f,), jnp.float32)
        fq = jax.jit(
            lambda x, w, a, s: (
                jax.lax.dot(x, w, preferred_element_type=jnp.int32).astype(
                    jnp.float32
                )
                * a
                * s
            ).astype(jnp.bfloat16)
        )
        dtq, _ = timed(fq, (xi, wi, sc, ws), iters)
        out[f"{m}x{k}x{f}"] = {
            "bf16_tops": round(flops / dt / 1e12, 1),
            "int8_tops": round(flops / dti / 1e12, 1),
            "int8_dequant_tops": round(flops / dtq / 1e12, 1),
            "int8_vs_bf16": round(dt / dti, 2),
            "int8_dequant_vs_bf16": round(dt / dtq, 2),
        }
    return out


def main():
    on_tpu = jax.default_backend() != "cpu"
    cfg = get_config("vit-b32")
    params = init_params(jax.random.key(0), cfg)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    b = 512 if on_tpu else 8
    iters = 20 if on_tpu else 2
    rng = np.random.default_rng(0)
    # preprocessed pixels, normalized-ish: tower-only timing
    pix = jnp.asarray(
        rng.standard_normal((b, 224, 224, 3)).astype(np.float32)
    )
    out = {"batch": b, "iters": iters, "backend": jax.default_backend()}

    gflops_img = 8.82  # ViT-B/32 fwd, bench.py vit_b32_gflops_per_image

    def record(name, fn, args):
        dt, _ = timed(fn, args, iters)
        ips = b * iters / dt
        out[name] = {
            "imgs_per_sec": round(ips, 1),
            "tower_tflops": round(ips * gflops_img / 1e3, 1),
        }

    # -- baseline bf16 tower
    f_bf16 = jax.jit(lambda p, x: encode_image(p, x, cfg, dtype=dtype))
    record("bf16", f_bf16, (params, pix))

    # -- shipped W8A8
    qv = jax.block_until_ready(
        clipquant.quantize_vision_tower(params["vision"])
    )
    f_q = jax.jit(
        lambda p, q, x: clipquant.encode_image_w8a8(p, q, x, cfg, dtype=dtype)
    )
    record("w8a8", f_q, (params, qv, pix))

    # -- B: amax reduce replaced by fixed-scale cast (numerics WRONG,
    #    shapes/dtypes identical — isolates the quantize-pass cost)
    real_quant = clipquant._quant_rows

    def fake_quant(x):
        x32 = x.astype(jnp.float32)
        xi = jnp.clip(x32, -127, 127).astype(jnp.int8)
        return xi, jnp.ones(x.shape[:-1] + (1,), jnp.float32)

    clipquant._quant_rows = fake_quant
    try:
        f_nq = jax.jit(
            lambda p, q, x: clipquant.encode_image_w8a8(
                p, q, x, cfg, dtype=dtype
            )
        )
        record("w8a8_fixed_scale_quant", f_nq, (params, qv, pix))
    finally:
        clipquant._quant_rows = real_quant

    # -- weights-only int8: dequant weight inside, bf16 dot (isolates
    #    whether int8 MATMULS are the win, vs weight-HBM savings)
    real_qdot = clipquant._qdot

    def wo_qdot(xi, ascale, w, bias, out_dtype):
        wf = (w["q"].astype(jnp.float32) * w["s"]).astype(jnp.bfloat16)
        xb = (xi.astype(jnp.float32) * ascale).astype(jnp.bfloat16)
        y = jnp.matmul(xb, wf, preferred_element_type=jnp.float32).astype(
            out_dtype
        )
        return y + bias.astype(out_dtype) if bias is not None else y

    clipquant._qdot = wo_qdot
    try:
        f_wo = jax.jit(
            lambda p, q, x: clipquant.encode_image_w8a8(
                p, q, x, cfg, dtype=dtype
            )
        )
        record("int8_weights_bf16_dots", f_wo, (params, qv, pix))
    finally:
        clipquant._qdot = real_qdot

    # -- A: raw matmul ceilings at the tower's shapes
    n_tokens = b * (cfg.vision.num_patches + 1)
    out["matmul_microbench"] = matmul_microbench(
        n_tokens,
        cfg.vision.hidden_size,
        cfg.vision.mlp_size,
        iters if on_tpu else 1,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
