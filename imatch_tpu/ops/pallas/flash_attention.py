"""Blockwise flash attention (forward) as a Pallas TPU kernel.

Replaces the reference's ATen attention inside CLIPModel
(/root/reference/utils.py:77,97). Online-softmax over key blocks: running
row max / normalizer / accumulator in VMEM, one pass over K/V — O(S) VMEM
instead of the (S, S) logits matrix, and the exp/max/accumulate epilogue
fused with the QK^T and PV matmuls on the MXU.

CLIP's sequences (50-257) fit VMEM outright, so the win here is fusion,
not memory; the same kernel scales unchanged to long-context towers
(SURVEY.md §5), which is why it is blockwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale, causal, block_q, block_k, seq_len
):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    d = q.shape[-1]
    nkb = k_ref.shape[1] // block_k

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        kpos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = kpos < seq_len
        if causal:
            qpos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            valid = jnp.logical_and(valid, kpos <= qpos)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p,
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nkb, body, (m0, l0, acc0))
    # Fully-masked rows (q padding) have l == 0; emit 0, sliced off outside.
    o_ref[0] = jnp.where(l > 0, acc / jnp.maximum(l, 1e-30), 0.0).astype(
        o_ref.dtype
    )


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def flash_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """(B, H, S, Dh) scaled-dot-product attention, flash style."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, s, d = q.shape
    scale = d**-0.5
    import math

    bq = min(block_q, max(8, s))
    bk = min(block_k, max(8, s))
    # pad to a multiple of BOTH block sizes: padding to max(bq, bk)
    # alone leaves trailing q-blocks uncovered when bq doesn't divide
    # s_pad (uninitialized output rows for the tail queries)
    step = math.lcm(bq, bk)
    s_pad = -(-s // step) * step
    nqb = s_pad // bq

    def fold(x):
        x = x.reshape(b * h, s, d)
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        return x

    qf, kf, vf = fold(q), fold(k), fold(v)
    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        causal=causal,
        block_q=bq,
        block_k=bk,
        seq_len=s,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, nqb),
        in_specs=[
            pl.BlockSpec(
                (1, bq, d), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s_pad, d), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s_pad, d), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :s, :].reshape(b, h, s, d)
