"""Experiment: does the fused Pallas dynamic-quantize recover the ~15%
the XLA quantize passes cost the W8A8 tower?

exp_w8a8_profile.py (DESIGN.md "Where the int8 headroom goes") showed
the dynamic per-row quantize — amax reduce + rescale/cast as separate
XLA HBM passes — costs ~15% of the quantized ViT-B/32 tower's wall.
ops/pallas/quantize.py folds each quantize into one pass (and fuses the
LayerNorm in front at the two LN->quant sites per layer). This script
A/Bs, on the real device:

  1. kernel microbench — quant_rows XLA vs Pallas, ln->quant
     composition vs fused, at the tower's activation shape;
  2. the full W8A8 tower — IMATCH_QUANT_KERNEL=xla vs pallas (the env
     is read at trace time, so each variant re-jits a fresh closure).

Output: one JSON line. OUTCOME (2026-08-19): the fused kernel LOSES
in-tower (see exp_quant_isolate.py for the bisect and DESIGN.md
"Fused Pallas quantize: measured dead end"); the default stays XLA
and IMATCH_QUANT_KERNEL=pallas is experiment-only.
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


def timed(fn, args, iters):
    r = jax.block_until_ready(fn(*args))  # compile
    # warm the FETCH path untimed (axon tunnel: first d2h per
    # (shape, dtype) can stall for minutes; see exp_w8a8_profile.py)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    return time.perf_counter() - t0


def kernel_microbench(rows, d, iters):
    from imatch_tpu.ops.pallas.quantize import (
        ln_quant_rows_pallas,
        quant_rows_pallas,
    )
    from imatch_tpu.ops.quant import quant_rows_int8_xla

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((d,)) + 1.0, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    gb = rows * d * 4 / 1e9  # fp32 input bytes, the stream lower bound

    out = {}
    f_x = jax.jit(quant_rows_int8_xla)
    dt = timed(f_x, (x,), iters)
    out["quant_xla_gbps"] = round(gb * iters / dt, 1)
    dt = timed(lambda v: quant_rows_pallas(v), (x,), iters)
    out["quant_pallas_gbps"] = round(gb * iters / dt, 1)

    def ln_then_quant(v):
        v32 = v.astype(jnp.float32)
        mean = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.var(v32, axis=-1, keepdims=True)
        y = (v32 - mean) * jax.lax.rsqrt(var + 1e-5) * g + bb
        return quant_rows_int8_xla(y)

    dt = timed(jax.jit(ln_then_quant), (x,), iters)
    out["lnquant_xla_gbps"] = round(gb * iters / dt, 1)
    dt = timed(lambda v: ln_quant_rows_pallas(v, g, bb), (x,), iters)
    out["lnquant_pallas_gbps"] = round(gb * iters / dt, 1)
    return out


def main():
    on_tpu = jax.default_backend() != "cpu"
    cfg = get_config("vit-b32")
    params = init_params(jax.random.key(0), cfg)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    b = 512 if on_tpu else 8
    iters = 20 if on_tpu else 2
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.standard_normal((b, 224, 224, 3)).astype(np.float32))
    out = {"batch": b, "iters": iters, "backend": jax.default_backend()}

    n_tokens = b * (cfg.vision.num_patches + 1)
    # interpreter-mode Pallas (the CPU smoke path) is ~1000x compiled
    # speed — keep the smoke tiny, measure for real only on TPU
    mb_rows = min(n_tokens, 25600) if on_tpu else 256
    out["kernel_microbench"] = kernel_microbench(
        mb_rows, cfg.vision.hidden_size, iters * 5 if on_tpu else 2
    )

    qv = jax.block_until_ready(
        clipquant.quantize_vision_tower(params["vision"])
    )
    gflops_img = 8.82
    for mode in ("xla", "pallas"):
        os.environ["IMATCH_QUANT_KERNEL"] = mode
        f = jax.jit(
            lambda p, q, x: clipquant.encode_image_w8a8(
                p, q, x, cfg, dtype=dtype
            )
        )
        dt = timed(f, (params, qv, pix), iters)
        ips = b * iters / dt
        out[f"w8a8_{mode}"] = {
            "imgs_per_sec": round(ips, 1),
            "tower_tflops": round(ips * gflops_img / 1e3, 1),
        }
    os.environ.pop("IMATCH_QUANT_KERNEL", None)
    out["speedup"] = round(
        out["w8a8_pallas"]["imgs_per_sec"] / out["w8a8_xla"]["imgs_per_sec"],
        3,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
