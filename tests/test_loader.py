"""Native C++ decode pool: format matrix, PIL parity, fallback, batching."""

import io

import numpy as np
import pytest
from PIL import Image

from imatch_tpu.runtime.loader import NativeImageLoader, decode_image_bytes


@pytest.fixture(scope="module")
def loader():
    return NativeImageLoader(threads=2)


def _png_bytes(arr):
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "PNG")
    return b.getvalue()


def test_png_exact(loader):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    out = loader.decode_batch([_png_bytes(img)])[0]
    np.testing.assert_array_equal(out, img)


def test_jpeg_matches_pil(loader):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 48, 3), np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=90)
    out = loader.decode_batch([b.getvalue()])[0]
    pil = np.asarray(Image.open(io.BytesIO(b.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(out, pil)


def test_webp_and_avif_paths(loader):
    """The drill corpus format matrix (SURVEY.md §4): webp native, avif
    via the PIL fallback inside the loader."""
    outs = loader.decode_batch(
        [
            "/root/reference/images/red drill not match.webp",
            "/root/reference/images/orange drill.avif",
        ]
    )
    assert outs[0].ndim == 3 and outs[0].shape[2] == 3
    assert outs[1].ndim == 3 and outs[1].shape[2] == 3


def test_grayscale_png(loader):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (20, 30), np.uint8)
    b = io.BytesIO()
    Image.fromarray(img, mode="L").save(b, "PNG")
    out = loader.decode_batch([b.getvalue()])[0]
    assert out.shape == (20, 30, 3)
    np.testing.assert_array_equal(out[..., 0], img)


def test_garbage_bytes_fall_back_with_error(loader):
    with pytest.raises(Exception):
        loader.decode_batch([b"not an image at all"])


def test_many_concurrent(loader):
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (16 + i, 24, 3), np.uint8) for i in range(20)]
    outs = loader.decode_batch([_png_bytes(im) for im in imgs])
    for a, b in zip(outs, imgs):
        np.testing.assert_array_equal(a, b)


def test_decode_image_bytes_helper():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (10, 12, 3), np.uint8)
    np.testing.assert_array_equal(decode_image_bytes(_png_bytes(img)), img)


def test_submit_directory_path_reports_error(loader, tmp_path):
    """ftell on a directory fails; must surface as a decode error, not a
    std::length_error abort through the extern "C" boundary."""
    t = loader.submit_path(str(tmp_path))
    with pytest.raises(Exception):
        loader.wait(t)
    # pool still alive and usable afterwards
    img = np.random.default_rng(5).integers(0, 256, (8, 9, 3), np.uint8)
    out = loader.decode_batch([_png_bytes(img)])[0]
    np.testing.assert_array_equal(out, img)
