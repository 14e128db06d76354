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
    if impl == "pallas":
        from imatch_tpu.ops.pallas.flash_attention import flash_mha

        return flash_mha(q, k, v, causal=causal)
    return _mha_xla(q, k, v, causal=causal, precision=precision)


def _mha_xla(q, k, v, *, causal, precision=None):
    dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    # fp32 logits + softmax for numerical parity with the torch reference.
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
        logits = jnp.where(mask[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.astype(dtype)
