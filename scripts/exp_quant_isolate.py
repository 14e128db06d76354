"""Isolate WHY the fused Pallas quantize slows the W8A8 tower 2x.

exp_quant_kernel.py measured: standalone Pallas quant beats the XLA
composition (157 vs 98 GB/s effective), but swapping it into the
tower HALVES throughput (5.5k vs 11k img/s). Variants here bisect:

  xla          — baseline (IMATCH_QUANT_KERNEL=xla everywhere)
  pl_ln        — Pallas only at the two LN->quant sites per layer
  pl_quant     — Pallas only at the two plain-quant sites (attn-out, mlp-act)
  pl_all       — repro of the full swap
  mlp_only     — standalone kernels at the MLP activation shape
                 (25600 x 3072), the biggest quantize in the tower

Timing-only surgery via the module-level _quant_rows/_ln_quant hooks
(same technique as exp_w8a8_profile.py). One JSON line out.

OUTCOME (TPU v5e, 2026-08-19, after kernel tuning — reciprocal
multiply, 8 MB blocks — and removing the call-site .astype(f32)
materialization): xla 10,972 / pl_ln 9,811 / pl_quant 7,976 /
pl_all 7,349 img/s. Every Pallas variant loses; the standalone GB/s
microbenches swing 3x run-to-run (tunnel dispatch noise) and are not
evidence. Conclusion recorded in DESIGN.md "Fused Pallas quantize:
measured dead end"; default stays XLA.
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
from imatch_tpu.models.clip.model import init_params
from imatch_tpu.models.clip import quant as clipquant
from imatch_tpu.ops.pallas.quantize import (
    ln_quant_rows_pallas,
    quant_rows_pallas,
)
from imatch_tpu.ops.quant import quant_rows_int8_xla


def timed(fn, args, iters):
    r = jax.block_until_ready(fn(*args))
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    return time.perf_counter() - t0


def _ln_quant_xla(x, p, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return quant_rows_int8_xla(y * p["scale"] + p["bias"])


def _ln_quant_pl(x, p, eps):
    return ln_quant_rows_pallas(x, p["scale"], p["bias"], eps=eps)


def main():
    cfg = get_config("vit-b32")
    params = init_params(jax.random.key(0), cfg)
    dtype = jnp.bfloat16
    b, iters = 512, 20
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.standard_normal((b, 224, 224, 3)).astype(np.float32))
    qv = jax.block_until_ready(
        clipquant.quantize_vision_tower(params["vision"])
    )
    out = {"backend": jax.default_backend(), "batch": b, "iters": iters}

    variants = {
        "xla": (quant_rows_int8_xla, _ln_quant_xla),
        "pl_ln": (quant_rows_int8_xla, _ln_quant_pl),
        "pl_quant": (quant_rows_pallas, _ln_quant_xla),
        "pl_all": (quant_rows_pallas, _ln_quant_pl),
    }
    for name, (qr, lq) in variants.items():
        clipquant._quant_rows = qr
        clipquant._ln_quant = lq
        f = jax.jit(
            lambda p, q, x: clipquant.encode_image_w8a8(
                p, q, x, cfg, dtype=dtype
            )
        )
        dt = timed(f, (params, qv, pix), iters)
        out[name] = round(b * iters / dt, 1)

    # standalone at the MLP activation shape, bf16 in (as in-tower)
    rows, d = 25600, cfg.vision.mlp_size
    xb = jnp.asarray(rng.standard_normal((rows, d)), jnp.bfloat16)
    gb = rows * d * 2 * iters / 1e9
    dt = timed(jax.jit(quant_rows_int8_xla), (xb,), iters)
    out["mlp_xla_gbps"] = round(gb / dt, 1)
    dt = timed(lambda v: quant_rows_pallas(v), (xb,), iters)
    out["mlp_pallas_gbps"] = round(gb / dt, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
