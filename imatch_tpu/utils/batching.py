"""Shared device-batching policy: pow2 buckets + repeat-last-row padding.

Static-shape XLA means every distinct batch size is a separate compiled
program; the framework's convention everywhere (ClipEmbedder chunking,
the VLM batch paths) is: split work into chunks of at most ``cap`` rows,
pad each chunk up to the next power of two (and to a multiple of the dp
mesh where sharding applies) by repeating the last row, and slice the
padding back off the results. That bounds compile variants to
~log2(cap) per path with <=2x padding waste.
"""

from __future__ import annotations

import numpy as np


def pow2_bucket(n: int, cap: int, multiple: int = 1) -> int:
    """Padded size for an ``n``-row chunk: next power of two, capped at
    ``cap``, rounded up to a multiple of ``multiple`` (dp meshes need
    batch % dp == 0 for any dp, not just powers of two)."""
    b = min(cap, 1 << max(0, n - 1).bit_length())
    b = max(b, multiple)
    return -(-b // multiple) * multiple


def pad_rows(x, n: int):
    """Pad a (rows, ...) array up to ``n`` rows by repeating the last
    row (jnp or numpy — uses the array's own concatenate semantics)."""
    if x.shape[0] >= n:
        return x
    import jax.numpy as jnp

    xp = jnp if not isinstance(x, np.ndarray) else np
    reps = xp.tile(x[-1:], (n - x.shape[0],) + (1,) * (x.ndim - 1))
    return xp.concatenate([x, reps], axis=0)


def to_rgb(arr: np.ndarray) -> np.ndarray:
    """Any decoded frame -> HWC RGB uint8-compatible array: grayscale
    (H, W) and single-channel (H, W, 1) stack to three channels, RGBA
    drops alpha. The one normalization every model entry point shares
    (CLIP preprocess, VLM encode, cloud captioner, U²-Net)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    elif a.ndim == 3 and a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    if a.shape[-1] == 4:
        a = a[..., :3]
    return a
