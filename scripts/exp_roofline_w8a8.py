"""Round-5 experiment: the W8A8 roofline — is the remaining int8 gap
structural?

VERDICT r4 item #6: int8 MFU sits at ~22% of the 394-TOPS int8 rating
while bf16 reaches ~41% of its 197-TFLOPS rating; int8 buys only
~1.07-1.12x end to end. Round 4 isolated the *software* costs (dynamic
quantize ~15%, Pallas fusion a measured dead end, weights-only int8 a
loss). This experiment derives the *hardware* ceiling from first
principles so DESIGN.md can state whether the gap is recoverable:

  1. Effective HBM stream bandwidth (device-side copy-reduce of a
     tensor far bigger than VMEM) — the denominator of every
     fetch-bound story.
  2. Effective matmul rate, bf16 vs int8, at EXACTLY the six
     contraction shapes the ViT-B/32 tower runs at B=512 (tokens
     N=B*50=25600): qkv [N,768]x[768,2304]-as-3, attn-out
     [N,768]x[768,768], mlp-in [N,768]x[768,3072], mlp-out
     [N,3072]x[3072,768] — plus a huge square control
     [8192,8192]x[8192,8192] where the MXU rating should actually
     show up if the lowering can deliver it.
  3. Bytes-per-image ledger for the W8A8 tower: int8 weight fetch +
     activation traffic incl. the quantize pass's extra read/write and
     the int32->fp32 dequant epilogue, per image at B=512.
  4. The derived ceiling: img/s = 1 / max(compute_s, fetch_s) per
     image, compared against the measured tower-only rate.

Run one at a time on the real chip (axon single-client):
    python scripts/exp_roofline_w8a8.py
Output: one JSON line; conclusions go to DESIGN.md "W8A8 roofline".
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# v5e chip ratings (public spec)
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
PEAK_HBM = 819e9  # bytes/s


def timed(fn, args, iters):
    r = jax.block_until_ready(fn(*args))  # compile
    np.asarray(r.ravel()[0])  # warm the tunnel fetch path (see exp_w8a8_profile)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r.ravel()[0])
    return time.perf_counter() - t0


def hbm_stream_gb_s():
    """Device-side stream rate: read a 1 GiB bf16 tensor, write its
    scaled copy, reduce. ~2 bytes read + 2 written per element => the
    measured rate is bytes-touched / wall."""
    n = 512 * 1024 * 1024  # elements, bf16 => 1 GiB
    x = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def stream(v):
        return (v * jnp.bfloat16(1.0001)).sum(dtype=jnp.float32)

    iters = 8
    dt = timed(stream, (x,), iters)
    bytes_touched = iters * n * (2 + 2)  # read + write of the scaled copy
    # XLA may fuse the scale into the reduce and skip the write; report
    # both interpretations so the table can carry the honest range.
    return {
        "stream_gb_s_rw": round(bytes_touched / dt / 1e9, 1),
        "stream_gb_s_read_only": round(iters * n * 2 / dt / 1e9, 1),
    }


def matmul_rate(m, k, n, dtype, iters=20):
    """Effective contraction rate at one shape. int8 contracts to int32
    (the W8A8 inner form); bf16 accumulates fp32 (the shipped form)."""
    key = jax.random.key(0)
    if dtype == "int8":
        a = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        b = jax.random.randint(key, (k, n), -127, 127, jnp.int8)

        @jax.jit
        def dot(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).sum(dtype=jnp.int32)

    else:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)

        @jax.jit
        def dot(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).sum(dtype=jnp.float32)

    dt = timed(dot, (a, b), iters)
    flops = 2.0 * m * k * n * iters
    return flops / dt


def main():
    out = {"backend": jax.default_backend()}

    out.update(hbm_stream_gb_s())
    print(f"[roofline] hbm {out}", file=sys.stderr, flush=True)

    # the tower's contraction shapes at B=512 (tokens N = 512*50)
    ntok = 512 * 50
    shapes = {
        "qkv_25600x768x2304": (ntok, 768, 2304),
        "attnout_25600x768x768": (ntok, 768, 768),
        "mlpin_25600x768x3072": (ntok, 768, 3072),
        "mlpout_25600x3072x768": (ntok, 3072, 768),
        "control_8192^3": (8192, 8192, 8192),
    }
    rates = {}
    for name, (m, k, n) in shapes.items():
        bf = matmul_rate(m, k, n, "bf16")
        i8 = matmul_rate(m, k, n, "int8")
        rates[name] = {
            "bf16_tflops": round(bf / 1e12, 1),
            "bf16_pct_peak": round(100 * bf / PEAK_BF16, 1),
            "int8_tops": round(i8 / 1e12, 1),
            "int8_pct_peak": round(100 * i8 / PEAK_INT8, 1),
            "int8_vs_bf16": round(i8 / bf, 2),
        }
        print(f"[roofline] {name}: {rates[name]}", file=sys.stderr, flush=True)
    out["matmul"] = rates

    # bytes-per-image ledger for the W8A8 tower at B=512 (ViT-B/32:
    # d=768, 12 layers, 50 tokens/img, mlp 3072). Weight bytes amortize
    # over the batch; activation bytes are per image.
    d, layers, tok, mlp = 768, 12, 50, 3072
    w_per_layer = d * 3 * d + d * d + d * mlp + mlp * d  # int8 bytes
    w_bytes = layers * w_per_layer + 3 * 32 * 32 * d  # + patch stem (bf16ish)
    act_per_img = 0
    for _ in range(layers):
        # per contraction: read act (int8) + write out (fp32 dequant),
        # plus the quantize passes: read fp32 in + write int8. The
        # shipped layer (models/clip/quant.py body()) quantizes FOUR
        # times — ln1 out (width d, feeds q/k/v), attn-out o (d),
        # ln2 out (d), and the mlp hidden y (width mlp=3072) — an
        # earlier version of this ledger modeled only two d-wide passes
        # and undercounted activation traffic ~26%
        for (ki, ni) in ((d, 3 * d), (d, d), (d, mlp), (mlp, d)):
            act_per_img += tok * ki * 1  # int8 act read
            act_per_img += tok * ni * 4  # fp32 dequant write
        act_per_img += 3 * (tok * d * 5) + tok * mlp * 5  # 4 quant passes
        act_per_img += tok * d * 4 * 4  # LN/residual traffic (fp32-ish)
    bytes_img = w_bytes / 512 + act_per_img
    out["ledger"] = {
        "weight_bytes_int8": w_bytes,
        "weight_bytes_per_img_at_B512": round(w_bytes / 512),
        "act_bytes_per_img": act_per_img,
        "total_bytes_per_img": round(bytes_img),
    }

    flops_img = 2.0 * layers * tok * (d * 3 * d + d * d + d * mlp + mlp * d)
    # use the MEASURED effective rates, not the rating — per-shape
    # weighted time (each contraction at ITS measured rate, including
    # the slowest one, attn-out; a min() over a subset of shapes both
    # excluded the slowest shape and charged every FLOP at one rate)
    shape_flops = {
        "qkv_25600x768x2304": 2.0 * tok * d * 3 * d,
        "attnout_25600x768x768": 2.0 * tok * d * d,
        "mlpin_25600x768x3072": 2.0 * tok * d * mlp,
        "mlpout_25600x3072x768": 2.0 * tok * mlp * d,
    }
    compute_s = layers * sum(
        f / (rates[k]["int8_tops"] * 1e12) for k, f in shape_flops.items()
    )
    eff_hbm = out["stream_gb_s_rw"] * 1e9
    fetch_s = bytes_img / eff_hbm
    out["derived"] = {
        "flops_per_img_g": round(flops_img / 1e9, 2),
        "compute_bound_img_s": round(1 / compute_s),
        "fetch_bound_img_s": round(1 / fetch_s),
        "ceiling_img_s": round(1 / max(compute_s, fetch_s)),
        "binding": "fetch" if fetch_s > compute_s else "compute",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
