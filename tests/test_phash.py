"""pHash: algorithm spec conformance + host/device agreement + dedup
semantics on the reference drill corpus."""

import os

import numpy as np
import pytest
from PIL import Image

from imatch_tpu.ops.phash import (
    bits_to_hex,
    hamming,
    hex_to_bits,
    image_id,
    phash_batch,
    phash_host,
)

CORPUS = "/root/reference/images"


def test_hex_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=64).astype(bool)
    h = bits_to_hex(bits)
    assert len(h) == 16
    assert (hex_to_bits(h) == bits).all()


def test_spec_conformance_manual():
    """Recompute the published phash algorithm step by step with
    independent numpy code and compare to phash_host."""
    import scipy.fftpack

    rng = np.random.default_rng(1)
    img = Image.fromarray(
        rng.integers(0, 256, size=(100, 80, 3), dtype=np.uint8)
    )
    small = img.convert("L").resize((32, 32), Image.Resampling.LANCZOS)
    px = np.asarray(small, dtype=np.float64)
    d = scipy.fftpack.dct(scipy.fftpack.dct(px, axis=0), axis=1)[:8, :8]
    expected = bits_to_hex(d > np.median(d))
    assert phash_host(img) == expected


def test_identical_images_same_id():
    img = Image.open(os.path.join(CORPUS, "red drill.jpg"))
    assert image_id(img) == image_id(img.copy())
    assert image_id(img).startswith("img_")


def test_distinct_images_distinct_ids():
    ids = set()
    for f in os.listdir(CORPUS):
        ids.add(image_id(Image.open(os.path.join(CORPUS, f)).convert("RGB")))
    assert len(ids) == len(os.listdir(CORPUS))


def test_device_batch_matches_host():
    imgs, hosts = [], []
    for f in sorted(os.listdir(CORPUS)):
        im = Image.open(os.path.join(CORPUS, f)).convert("RGB")
        im = im.resize((256, 256), Image.Resampling.BILINEAR)
        imgs.append(np.asarray(im))
        hosts.append(phash_host(im))
    dev = phash_batch(np.stack(imgs))
    for h, d in zip(hosts, dev):
        # device path may flip bits that sit at the median boundary
        assert hamming(h, d) <= 2, (h, d)


def test_near_duplicate_hamming_small():
    """A re-encoded / slightly resized copy hashes within a few bits."""
    img = Image.open(os.path.join(CORPUS, "red drill.jpg")).convert("RGB")
    shrunk = img.resize(
        (img.width // 2, img.height // 2), Image.Resampling.BICUBIC
    )
    assert hamming(phash_host(img), phash_host(shrunk)) <= 6


def test_image_ids_batch_bit_identical():
    """The bulk-ingest id path (device buckets + host fallback) must
    produce exactly the serial host ids, mixed geometries included."""
    from imatch_tpu.ops.phash import image_ids_batch

    rng = np.random.default_rng(7)
    arrays = []
    # a large same-geometry bucket (device path) ...
    for i in range(10):
        arrays.append(rng.integers(0, 256, (128, 160, 3), np.uint8))
    # ... plus odd sizes (host path) and a None hole (failed decode)
    arrays.append(rng.integers(0, 256, (97, 55, 3), np.uint8))
    arrays.append(None)
    arrays.append(rng.integers(0, 256, (41, 222, 3), np.uint8))
    got = image_ids_batch(arrays)
    for a, g in zip(arrays, got):
        if a is None:
            assert g is None
        else:
            assert g == image_id(Image.fromarray(a))


def test_phash_batch_checked_confidence():
    from imatch_tpu.ops.phash import phash_batch_checked

    from imatch_tpu.ops.phash import host_bits_from_small

    rng = np.random.default_rng(8)
    imgs = rng.integers(0, 256, (6, 64, 64, 3), np.uint8)
    hexes, confident, smalls = phash_batch_checked(imgs)
    assert len(hexes) == 6 and confident.shape == (6,)
    assert smalls.shape == (6, 32, 32) and smalls.dtype == np.uint8
    for im, h, ok, sm in zip(imgs, hexes, confident, smalls):
        ref = phash_host(Image.fromarray(im))
        if ok:  # confident device hashes are bit-identical to host
            assert h == ref
        # the cheap fallback path (fp64 DCT on the device-resampled
        # grid) is bit-identical to the full host hash for EVERY image
        assert host_bits_from_small(sm) == ref
