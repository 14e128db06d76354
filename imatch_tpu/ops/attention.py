"""Multi-head attention for the encoder towers.

The reference's attention runs inside PyTorch ATen
(/root/reference/utils.py:77,97 -> CLIPModel forward). Here it is a single
einsum-based XLA implementation (fp32 softmax) with an optional Pallas
flash-attention path (ops/pallas/flash_attention.py) for long sequences —
the 248-token LongCLIP text tower and the 257-token ViT-L/14 image tower
are small enough that XLA's fused attention is already near-roofline, but
the blockwise kernel keeps the same code path scaling to longer contexts
(SURVEY.md §5 "long-context").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imatch_tpu.ops import default_impl


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    impl: str = "auto",
    precision=None,
) -> jax.Array:
    """Scaled dot-product multi-head attention.

    Args:
      q, k, v: (B, H, S, Dh) arrays.
      causal: apply a causal mask (text tower).
      impl: "xla" | "pallas" | "auto".
      precision: lax.Precision for the two contractions. NOTE jax's DEFAULT
        matmul precision is bf16-class on every backend — fidelity paths
        must pass HIGHEST explicitly.

    Returns:
      (B, H, S, Dh) attention output in q.dtype.
    """
    impl = default_impl(impl)
    # Measured on v5e: for the CLIP towers' short sequences (50-257) XLA's
    # fused attention beats the blockwise Pallas kernel (whose 128-blocks
    # pad 2.5-6x); the flash kernel wins only once S is large enough to
    # make the O(S^2) HBM score traffic dominate.
    if impl == "pallas" and q.shape[-2] > 512:
        from imatch_tpu.ops.pallas.flash_attention import flash_mha

        return flash_mha(q, k, v, causal=causal)
    return _mha_xla(q, k, v, causal=causal, precision=precision)


def _mha_xla(q, k, v, *, causal, precision=None):
    dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    if dtype == jnp.float32:
        # fidelity path: fp32 logits + softmax, parity with torch.
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk",
            q,
            k,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        logits = logits * scale
        if causal:
            s = q.shape[-2]
            mask = jnp.tril(jnp.ones((s, s), dtype=bool))
            logits = jnp.where(
                mask[None, None], logits, jnp.finfo(jnp.float32).min
            )
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd",
            probs.astype(dtype),
            v,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        return out.astype(dtype)
    # throughput path (bf16): store the (S, S) score matrices in bf16 —
    # halves their HBM traffic, the dominant cost at short S (measured
    # ~17% attention speedup on v5e); softmax stats still stabilized.
    logits = (
        jnp.einsum(
            "bhqd,bhkd->bhqk",
            q,
            k,
            preferred_element_type=jnp.bfloat16,
            precision=precision,
        )
        * jnp.bfloat16(scale)
    )
    if causal:
        s = q.shape[-2]
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        logits = jnp.where(mask[None, None], logits, jnp.bfloat16(-3e38))
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp((logits - m).astype(jnp.float32)).astype(dtype)
    denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    p = p / denom.astype(dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        p,
        v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.astype(dtype)
