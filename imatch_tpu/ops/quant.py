"""Shared W8A8 int8 primitives (MXU int8 is rated 2x bf16 on v5e).

One implementation of the dynamic-activation x static-weight recipe
serves both towers that use it — the CLIP vision encoder
(models/clip/quant.py, IMATCH_EMBED_QUANT=int8) and the Moondream
decoder prefill (models/moondream/model.py, IMATCH_MD_ACT=int8) — so a
future change to rounding or zero-scale handling cannot silently
diverge them. Quantized-weight dicts are ``{"q": int8 (..., in, out),
"s": fp32 (..., 1?, out)}`` as produced by quantize_weight_int8 /
moondream's quantize_int8.

The reference has no quantized path anywhere (its CLIP/VLM forwards
are fp32 torch, /root/reference/utils.py:59-102); these tiers are
beyond-parity capability.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    """Whether the dynamic activation quantize runs as the fused Pallas
    kernel (ops/pallas/quantize.py) instead of the XLA composition.
    Read at TRACE time: IMATCH_QUANT_KERNEL=pallas|xla (default xla).
    The kernel is a MEASURED LOSS inside the W8A8 towers — XLA fuses
    the amax/rescale into its neighbors and recomputes the LN instead
    of spilling fp32, which an opaque custom call cannot match (9,811
    vs 10,972 img/s at the best variant; scripts/exp_quant_isolate.py,
    DESIGN.md "Fused Pallas quantize: measured dead end") — so pallas
    is opt-in for experimentation only. Changing the env after a tower
    has jitted does not retrace it."""
    return os.environ.get("IMATCH_QUANT_KERNEL", "xla") == "pallas"


def quantize_weight_int8(w: jax.Array) -> dict:
    """Per-out-channel symmetric int8 for a stacked (L, D, F) or flat
    (D, F) weight: scale over the contraction axis (-2). Returns
    {"q": int8 same shape, "s": fp32 with the contraction axis
    squeezed out} — e.g. (L, D, F) -> s (L, F); (D, F) -> s (F,)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": jnp.squeeze(scale, axis=-2)}


def quant_rows_int8_xla(x: jax.Array):
    """The plain-XLA dynamic quantize: amax reduce + rescale/cast as
    separate ops (two HBM passes over x once XLA schedules them).
    Kept callable directly for tests and kernel A/B benches."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    xi = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return xi, scale


def quant_rows_int8(x: jax.Array):
    """Dynamic per-token symmetric int8 from an activation (any float
    dtype). Returns (int8 values, fp32 per-row scale with keepdims).
    Runs the XLA composition unless IMATCH_QUANT_KERNEL=pallas opts
    into the (measured-slower in-tower) fused kernel; numerics agree
    to 1 LSB either way (pinned in tests/test_quant_kernel.py)."""
    if _use_pallas():
        from imatch_tpu.ops.pallas.quantize import quant_rows_pallas

        return quant_rows_pallas(x)
    return quant_rows_int8_xla(x)


def ln_quant_rows_int8(x: jax.Array, p: dict, eps: float):
    """fp32 LayerNorm (params {"scale","bias"}) -> dynamic int8
    quantize, the chain feeding every W8A8 dense stack. Default is the
    XLA composition (which XLA fuses/recomputes better than the opaque
    kernel — see _use_pallas); IMATCH_QUANT_KERNEL=pallas swaps in the
    single-pass fused kernel."""
    if _use_pallas():
        from imatch_tpu.ops.pallas.quantize import ln_quant_rows_pallas

        return ln_quant_rows_pallas(x, p["scale"], p["bias"], eps=eps)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return quant_rows_int8_xla(y * p["scale"] + p["bias"])


def qdot_int8(xi: jax.Array, ascale: jax.Array, w: dict, b, out_dtype):
    """int8 x int8 -> int32 contraction over xi's last axis, dequant
    fused into the fp32 accumulator scale (+ optional bias)."""
    y = jax.lax.dot_general(
        xi,
        w["q"],
        (((xi.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * ascale * w["s"]).astype(out_dtype)
    if b is not None:
        y = y + b.astype(out_dtype)
    return y
