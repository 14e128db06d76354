"""Fused dynamic int8 row-quantization as Pallas TPU kernels.

The W8A8 tiers (CLIP vision tower, Moondream prefill) quantize an
activation per token right before every int8 contraction. Under XLA
that dynamic quantize lowers to TWO HBM passes over the fp32
activations — an amax reduce, then a rescale+cast — and the round-4
decomposition measured it at ~15% of the quantized tower's wall
(docs/DESIGN.md "Where the int8 headroom goes"). These kernels read
the activation once: amax lives in VMEM, the int8 values and the
per-row fp32 scale come out in the same pass.

Two entry points, numerically identical to the XLA compositions they
replace (ops/quant.py:quant_rows_int8 and the LayerNorm->quant chain
in models/clip/quant.py):

- quant_rows_pallas(x)             : amax -> scale -> round/clip cast
- ln_quant_rows_pallas(x, g, b)    : fp32 LayerNorm fused in front, so
  the LN output never round-trips through HBM at all (the two LN->quant
  sites per encoder layer are the dominant quantize traffic).

The reference has no quantized path anywhere (its towers are fp32
torch, /root/reference/utils.py:59-102); this is part of the
beyond-parity W8A8 tier. Kernels run compiled on TPU and in Pallas
interpreter mode on CPU (the test path), same convention as
flash_attention.py.

MEASURED OUTCOME (TPU v5e, 2026-08-19, scripts/exp_quant_isolate.py;
DESIGN.md "Fused Pallas quantize: measured dead end"): the kernels
LOSE inside the tower — best variant 9,811 img/s vs 10,972 for the
XLA composition. XLA never pays the two passes the fusion was meant
to save: it fuses the amax reduce into the producer and RECOMPUTES
the cheap LN/epilogue in the rescale pass instead of spilling fp32,
and an opaque custom call forfeits both tricks plus cross-op
scheduling inside the scan. Shipped as opt-in only
(IMATCH_QUANT_KERNEL=pallas); the default path stays XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_rows(d: int) -> int:
    """Row-block size: ~8 MB of fp32 in VMEM (plus the int8 out and a
    bf16 input block it comfortably double-buffers in 16 MB), multiple
    of 32 so the int8 output block satisfies its (32, 128) min tile."""
    if d <= 1024:
        return 2048
    if d <= 4096:
        return 512
    return 128


def _quantize(y):
    """The shared epilogue — same numerics as quant_rows_int8 except
    the rescale runs as a reciprocal multiply (127/amax) instead of an
    elementwise divide: fp32 div on the VPU is ~10x a mul and Mosaic
    does not strength-reduce it, which left the kernel compute-bound
    below HBM rate (scripts/exp_quant_isolate.py). Codes agree with
    the divide form to 1 LSB on rounding boundaries."""
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    nonzero = amax > 0
    scale = jnp.where(nonzero, amax / 127.0, 1.0)
    inv = jnp.where(nonzero, 127.0 / amax, 1.0)
    q = jnp.clip(jnp.round(y * inv), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_kernel(x_ref, q_ref, s_ref):
    y = x_ref[:].astype(jnp.float32)
    q, scale = _quantize(y)
    q_ref[:] = q
    s_ref[:] = scale


def _ln_quant_kernel(x_ref, g_ref, b_ref, q_ref, s_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    q, scale = _quantize(y)
    q_ref[:] = q
    s_ref[:] = scale


def _run(kernel, x, extras, interpret):
    """Flatten to (R, D), pad R to the row block, launch, unpad."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    r = xf.shape[0]
    br = min(_block_rows(d), max(32, -(-r // 32) * 32))
    r_pad = -(-r // br) * br
    if r_pad != r:
        xf = jnp.pad(xf, ((0, r_pad - r), (0, 0)))
    in_specs = [
        pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in extras
    ]
    q, s = pl.pallas_call(
        kernel,
        grid=(r_pad // br,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, d), jnp.int8),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(xf, *extras)
    if r_pad != r:
        q, s = q[:r], s[:r]
    return q.reshape(*lead, d), s.reshape(*lead, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_rows_pallas(x: jax.Array, *, interpret: bool | None = None):
    """Dynamic per-row symmetric int8 of x (..., D) in ONE pass over x.
    Returns (int8 (..., D), fp32 scale (..., 1)) — same contract as
    ops/quant.py:quant_rows_int8."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _run(_quant_kernel, x, (), interpret)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ln_quant_rows_pallas(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float = 1e-5,
    interpret: bool | None = None,
):
    """fp32 LayerNorm over the last axis fused with the dynamic int8
    quantize: x crosses HBM once, the normalized fp32 values never do.
    Matches models/clip/quant.py:_layer_norm_f32 -> quant_rows_int8."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = x.shape[-1]
    kernel = functools.partial(_ln_quant_kernel, eps=eps)
    extras = (gamma.reshape(1, d), beta.reshape(1, d))
    return _run(kernel, x, extras, interpret)
