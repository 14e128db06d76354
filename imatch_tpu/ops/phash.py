"""Perceptual hash (pHash) for duplicate detection.

The reference dedups uploads with ``imagehash.phash`` defaults
(/root/reference/backend/app/main.py:581-585): grayscale -> 32x32 LANCZOS
resize -> 2D DCT-II -> top-left 8x8 block -> median threshold -> 64 bits,
serialized as 16 hex chars; v2 image ids are ``img_<hex>``.

Two implementations:
- ``phash_host``  — authoritative, built from the published algorithm on
  the same primitives (PIL convert('L')/LANCZOS resize, scipy DCT), so ids
  are bit-identical to ``imagehash.phash`` and stable across migration.
- ``phash_batch`` — batched device version for bulk ingest: grayscale +
  LANCZOS resample + DCT all as matmuls on the MXU, with PIL's two-pass
  uint8 rounding. ``phash_batch_checked`` reports a per-image margin
  flag: confident ids are provably imagehash.phash's answer; the rest
  get an exact fp64 DCT of the device grid, which can diverge from the
  host path only in the measured-rare case where an fp32 pass-sum
  rounds a boundary pixel differently than PIL AND the shifted
  coefficient crosses the median (details in ``phash_core``).
- ``image_ids_batch`` — the bulk-ingest id path (pipeline/ingest.py):
  device hashes for large same-geometry buckets, threaded host hashing
  for the rest.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from imatch_tpu.ops.resize import resample_matrix


def _scipy_dct2(pixels: np.ndarray) -> np.ndarray:
    import scipy.fftpack

    return scipy.fftpack.dct(scipy.fftpack.dct(pixels, axis=0), axis=1)


def bits_to_hex(bits: np.ndarray) -> str:
    """64 bools (row-major 8x8) -> 16 hex chars, imagehash serialization."""
    flat = np.asarray(bits, dtype=np.uint8).flatten()
    val = 0
    for b in flat:
        val = (val << 1) | int(b)
    return f"{val:0{len(flat) // 4}x}"


def hex_to_bits(h: str) -> np.ndarray:
    n = len(h) * 4
    val = int(h, 16)
    return np.array([(val >> (n - 1 - i)) & 1 for i in range(n)], dtype=bool)


def hamming(h1: str, h2: str) -> int:
    return int((hex_to_bits(h1) != hex_to_bits(h2)).sum())


def phash_host(
    image: Image.Image, hash_size: int = 8, highfreq_factor: int = 4
) -> str:
    """Bit-identical to imagehash.phash defaults."""
    img_size = hash_size * highfreq_factor
    small = image.convert("L").resize(
        (img_size, img_size), Image.Resampling.LANCZOS
    )
    pixels = np.asarray(small, dtype=np.float64)
    dct = _scipy_dct2(pixels)
    low = dct[:hash_size, :hash_size]
    med = np.median(low)
    return bits_to_hex(low > med)


def image_id(image: Image.Image) -> str:
    """v2 content-addressed id (/root/reference/backend/app/main.py:585)."""
    return f"img_{phash_host(image)}"


# ---------------------------------------------------------------------------
# Batched device path
# ---------------------------------------------------------------------------


@functools.lru_cache()
def _dct2_matrix(n: int) -> np.ndarray:
    """scipy.fftpack.dct type-II (norm=None) as a matrix: y = C @ x."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    return (2.0 * np.cos(np.pi * k * (2 * m + 1) / (2 * n))).astype(np.float32)


# PIL convert('L') ITU-R 601-2 integer weights: (R*19595+G*38470+B*7471+0x8000)>>16
_L_WEIGHTS = np.array([19595.0, 38470.0, 7471.0], dtype=np.float32) / 65536.0


def phash_core(imgs, a_v, a_h, hash_size=8, highfreq_factor=4):
    """Traceable pHash: uint8 (B, H, W, 3) frames ->
    (bits, confident, small_u8). Shared by the standalone jit below and
    the fused ingest step (pipeline/embedder.py) that computes hash +
    CLIP embedding from ONE device upload of the frames.

    ``small_u8`` is the 32x32 resampled grayscale grid with PIL's
    two-pass uint8 rounding. It agrees with PIL's grid except where an
    fp32 pass-sum lands within float rounding of a half-integer
    boundary (the 2^-22-quantized weights make each PRODUCT a dyadic
    rational, but a pass sum needs more significand bits than fp32
    carries — measured ~0.5 boundary pixels per 512x512 frame can round
    differently). Unconfident images don't need a full host re-hash:
    the host runs just the fp64 DCT + median on this 1 KB grid (~60 us)
    — ~80x cheaper than decode+resize+hash (host_bits_from_small).
    ``confident`` means MORE than "device bits == fp64-DCT bits": the
    margin makes the bit pattern invariant to single-level grid flips,
    so confident ids equal PIL's even in the boundary case above."""
    hi = jax.lax.Precision.HIGHEST
    # precision=HIGHEST is exactness, not speed hygiene: at TPU DEFAULT
    # precision fp32 dots demote to bf16 and the 0-255 products lose
    # integer exactness. With full fp32 every product here is < 2^24 and
    # a multiple of 2^-16, so the L conversion is EXACT integer math and
    # floor(gray + 0.5) == PIL's (R*19595+G*38470+B*7471+0x8000)>>16.
    gray = jnp.einsum(
        "bhwc,c->bhw", imgs.astype(jnp.float32), _L_WEIGHTS, precision=hi
    )
    gray = jnp.floor(gray + 0.5)  # PIL integer rounding of the L conversion
    # LANCZOS resample to 32x32 with PIL's two-pass uint8 rounding.
    # floor(x + 0.5), NOT round(): PIL's clip8((ss + 2^21) >> 22) rounds
    # half UP while jnp.round rounds half to even — with 2^-22-quantized
    # weights (see resample_matrix) exact .5 ties are reachable and
    # half-even would deterministically diverge on them.
    x = jnp.einsum("xw,bhw->bhx", a_h, gray, precision=hi)
    x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    x = jnp.einsum("yh,bhx->byx", a_v, x, precision=hi)
    x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    # 2D DCT-II via matmuls, crop the low-frequency block
    C = jnp.asarray(_dct2_matrix(hash_size * highfreq_factor))
    d = jnp.einsum("kh,bhx->bkx", C, x, precision=hi)
    d = jnp.einsum("lx,bkx->bkl", C, d, precision=hi)
    low = d[:, :hash_size, :hash_size]
    flat = low.reshape(low.shape[0], -1)
    med = jnp.median(flat, axis=1, keepdims=True)
    # Confidence: ABSOLUTE margin, not a min/max-gap ratio. The old
    # ratio test scaled by max(gap) — dominated by the DC coefficient's
    # ~1e5-size distance from the median — so it demanded a min-gap of
    # hundreds and measured 0/128 images confident: a dead flag. The
    # margin instead bounds grid-error damage: a ±1 uint8 flip of one
    # grid pixel moves any DCT-II coefficient by at most 4
    # (|2cos x 2cos| <= 4), so min-gap > 16 makes the bit pattern
    # invariant to up to 4 flipped boundary pixels — a confident id
    # equals PIL's id even when the fp32 grid rounds a boundary pixel
    # differently (see the grid caveat in the docstring). Everything
    # else takes the cheap small-grid fp64 host path.
    gap = jnp.abs(flat - med)
    confident = jnp.min(gap, axis=1) > 16.0
    return (flat > med).reshape(low.shape), confident, x.astype(jnp.uint8)


def host_bits_from_small(small_u8: np.ndarray, hash_size: int = 8) -> str:
    """Exact imagehash.phash tail on a device-resampled grid: fp64 DCT +
    median threshold -> hex chars. Matches ``phash_host`` whenever the
    grid matches PIL's resample — exact except where a pass value lands
    within fp32 summation error (~1e-5) of a half-integer boundary.
    ``hash_size`` must match the one the grid was built with
    (grid side = hash_size * highfreq_factor)."""
    dct = _scipy_dct2(np.asarray(small_u8, np.float64))
    low = dct[:hash_size, :hash_size]
    return bits_to_hex(low > np.median(low))


@functools.partial(jax.jit, static_argnames=("hash_size", "highfreq_factor"))
def _phash_batch_jit(imgs, a_v, a_h, *, hash_size=8, highfreq_factor=4):
    return phash_core(
        imgs, a_v, a_h, hash_size=hash_size, highfreq_factor=highfreq_factor
    )


def _phash_batch_device(imgs_u8, hash_size, highfreq_factor):
    h, w = imgs_u8.shape[1:3]
    n = hash_size * highfreq_factor
    a_v = resample_matrix(h, n, "lanczos", quantize_8bpc=True)
    a_h = resample_matrix(w, n, "lanczos", quantize_8bpc=True)
    bits, confident, small = _phash_batch_jit(
        jnp.asarray(imgs_u8),
        jnp.asarray(a_v),
        jnp.asarray(a_h),
        hash_size=hash_size,
        highfreq_factor=highfreq_factor,
    )
    return np.asarray(bits), np.asarray(confident), np.asarray(small)


def phash_batch(
    imgs_u8: np.ndarray,
    hash_size: int = 8,
    highfreq_factor: int = 4,
) -> List[str]:
    """Device pHash for a same-geometry uint8 RGB batch (B, H, W, 3)."""
    bits, _, _ = _phash_batch_device(imgs_u8, hash_size, highfreq_factor)
    return [bits_to_hex(b) for b in bits]


def phash_batch_checked(
    imgs_u8: np.ndarray,
    hash_size: int = 8,
    highfreq_factor: int = 4,
) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """Device pHash + per-image margin confidence + the 32x32 grids. A
    confident hash is provably ``phash_host``'s answer (margin
    guarantee, phash_core); callers give unconfident images the fp64
    ``host_bits_from_small`` answer on their grid."""
    bits, confident, small = _phash_batch_device(
        imgs_u8, hash_size, highfreq_factor
    )
    return [bits_to_hex(b) for b in bits], confident, small


# Device path only pays off for same-geometry runs: each new (H, W) jit
# compiles a new resample geometry, so small buckets go to the host pool.
DEVICE_BUCKET_MIN = 8


def image_ids_batch(
    arrays: List[Optional[np.ndarray]],
    pool: Optional["ThreadPoolExecutor"] = None,
) -> List[Optional[str]]:
    """Bulk ``image_id`` for decoded RGB arrays (None entries skipped).

    Same-geometry runs of >= DEVICE_BUCKET_MIN images hash on the device
    (one MXU dispatch per geometry); everything else hashes on the
    host, fanned out over a thread pool (PIL/scipy release the GIL).
    Device-bucket ids: margin-confident images use the device bits
    (provably PIL's id — phash_core); the rest get the fp64 DCT of the
    device grid (host_bits_from_small), which matches the serial host
    path except the measured-rare case where an fp32 boundary pixel in
    the 32x32 grid rounds differently than PIL AND the resulting
    coefficient shift crosses the median.
    """
    out: List[Optional[str]] = [None] * len(arrays)
    buckets: Dict[tuple, List[int]] = {}
    for i, a in enumerate(arrays):
        if a is not None:
            buckets.setdefault(a.shape, []).append(i)

    host_idx: List[int] = []
    for shape, idxs in buckets.items():
        if len(idxs) >= DEVICE_BUCKET_MIN:
            hexes, confident, smalls = phash_batch_checked(
                np.stack([arrays[i] for i in idxs])
            )
            for j, i in enumerate(idxs):
                if confident[j]:
                    out[i] = f"img_{hexes[j]}"
                else:
                    # exact fp64 tail on the device-resampled grid —
                    # microseconds, no full host re-hash
                    out[i] = f"img_{host_bits_from_small(smalls[j])}"
        else:
            host_idx.extend(idxs)

    if host_idx:
        def host_one(i):
            return i, image_id(Image.fromarray(arrays[i]))

        if pool is not None and len(host_idx) > 1:
            for i, id_ in pool.map(host_one, host_idx):
                out[i] = id_
        else:
            for i in host_idx:
                out[i] = host_one(i)[1]
    return out
