"""Device-side CLIP image preprocessing (resize + crop + normalize).

Replaces ``CLIPProcessor(images=...)`` (/root/reference/utils.py:76), whose
host path is PIL bicubic resize -> center crop -> rescale -> normalize.
Here decode stays on host (pipeline/loader.py) and everything after is a
fused device computation: two sampling matmuls on the MXU (ops/resize.py)
with the rescale/normalize affine folded into the epilogue — XLA fuses the
whole thing into the downstream ViT's first conv feed.

Images of the same (H, W) batch together; the host API buckets mixed-size
uploads and restores order.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from imatch_tpu.ops.resize import resize_crop_matrices


def _resample_precision() -> jax.lax.Precision:
    """Matmul precision for the two resampling einsums, read at trace
    time (IMATCH_RESIZE_PRECISION: high [default] | highest | default).

    Measured on TPU v5e (scripts/exp_resize_precision.py + the pixel
    agreement probe, 2026-08-19, B=512 fused preprocess+ViT-B/32):

    - ``highest`` (fp32 = 6 bf16 MXU passes): 6,485 img/s — the
      strict CLIPProcessor-parity setting (within 1 uint8 level of PIL
      bicubic).
    - ``high`` (bf16_3x): **9,789 img/s (1.51x)**. After the PIL-parity
      round-to-uint8 between passes, outputs differ from ``highest`` in
      <0.1% of pixels (0.009% on the drill corpus), every difference
      exactly 1 uint8 level — i.e. inside the tolerance the HIGHEST
      emulation itself claims vs PIL, and measured *identical*
      disagreement stats vs PIL bicubic. Embedding cosine vs highest
      >=0.99994 even under random-init weights. This is the default.
    - ``default`` (bf16): 9,812 img/s — only +0.2% over ``high`` but
      29.5% of pixels shift (max 3 levels). Rejected: all cost, no win.

    pHash is UNAFFECTED — its grid resample (ops/phash.py) pins its own
    HIGHEST for bit-exact ids."""
    name = os.environ.get("IMATCH_RESIZE_PRECISION", "high").lower()
    table = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }
    if name not in table:
        # a bare KeyError here would surface from inside a jit trace on
        # the first ingest, naming neither the knob nor its options
        raise ValueError(
            f"IMATCH_RESIZE_PRECISION={name!r} — expected one of "
            f"{sorted(table)}"
        )
    return table[name]

# OpenAI CLIP normalization constants (transformers OPENAI_CLIP_MEAN/STD).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def normalize(pixels01: jax.Array) -> jax.Array:
    """(x/1 - mean)/std for images already scaled to [0, 1], NHWC."""
    return (pixels01 - CLIP_MEAN) / CLIP_STD


def preprocess_core(imgs_u8, a_v, a_h, quantize=True, dtype=jnp.float32):
    """Traceable preprocess: (B, H, W, 3) uint8 -> (B, out, out, 3)
    normalized floats. Shared by the standalone jit below and the fused
    ingest step (pipeline/embedder.py)."""
    x = imgs_u8.astype(jnp.float32)
    hi = _resample_precision()
    # Horizontal then vertical resampling on the MXU — PIL's pass order.
    # PIL rounds + clips to uint8 between passes (bicubic overshoot is
    # clipped); emulating both passes keeps pixels within 1 uint8 level of
    # the reference CLIPProcessor output.
    x = jnp.einsum("xw,bhwc->bhxc", a_h, x, precision=hi)
    if quantize:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = jnp.einsum("yh,bhxc->byxc", a_v, x, precision=hi)
    if quantize:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = x * (1.0 / 255.0)
    x = normalize(x)  # the one definition of the CLIP affine
    return x.astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("out_size", "quantize", "dtype")
)
def _preprocess_same_size(
    imgs_u8: jax.Array,
    a_v: jax.Array,
    a_h: jax.Array,
    *,
    out_size: int = 224,
    quantize: bool = True,
    dtype=jnp.float32,
):
    return preprocess_core(imgs_u8, a_v, a_h, quantize=quantize, dtype=dtype)


def preprocess_batch(
    imgs_u8: np.ndarray | jax.Array,
    *,
    out_size: int = 224,
    quantize: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """Preprocess a uint8 NHWC batch of one geometry."""
    h, w = imgs_u8.shape[1:3]
    a_v, a_h = resize_crop_matrices(h, w, out_size)
    return _preprocess_same_size(
        jnp.asarray(imgs_u8),
        jnp.asarray(a_v),
        jnp.asarray(a_h),
        out_size=out_size,
        quantize=quantize,
        dtype=dtype,
    )


def preprocess_images(
    images: Sequence[np.ndarray],
    *,
    out_size: int = 224,
    quantize: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """Mixed-geometry host API: bucket by (H, W), batch each bucket on
    device, reassemble in input order. Returns (N, out, out, 3)."""
    buckets = {}
    for i, im in enumerate(images):
        assert im.ndim == 3 and im.shape[2] == 3, "expected HWC RGB uint8"
        buckets.setdefault(im.shape[:2], []).append(i)
    out: List = [None] * len(images)
    for (h, w), idxs in buckets.items():
        batch = np.stack([images[i] for i in idxs])
        res = preprocess_batch(
            batch, out_size=out_size, quantize=quantize, dtype=dtype
        )
        for j, i in enumerate(idxs):
            out[i] = res[j]
    return jnp.stack(out)
