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
    # per-file isolation: default decode_batch yields None, not a raise
    assert loader.decode_batch([b"not an image at all"]) == [None]
    with pytest.raises(Exception):
        loader.decode_batch([b"not an image at all"], on_error="raise")


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


def test_decode_batch_isolates_failures_and_drains():
    """One corrupt file must not abandon the rest of the batch (leaked
    C buffers + lost chunk): failures come back as None, the good
    entries decode."""
    import numpy as np

    loader = NativeImageLoader()
    img = np.full((8, 8, 3), 128, np.uint8)
    good = _png_bytes(img)
    out = loader.decode_batch([good, b"not an image at all", good])
    assert out[0] is not None and out[2] is not None
    assert out[1] is None
    np.testing.assert_array_equal(out[0], img)
    loader.close()


def test_decode_image_bytes_raises_on_garbage():
    import pytest

    with pytest.raises(Exception):
        decode_image_bytes(b"\x00\x01garbage")


def test_probe_is_header_only_and_correct():
    """iml_decode_probe reports (w, h) without a full decode."""
    import numpy as np

    from imatch_tpu.runtime.loader import probe_image_bytes

    img = np.zeros((12, 34, 3), np.uint8)
    got = probe_image_bytes(_png_bytes(img))
    if got is None:  # no native toolchain: nothing to assert
        return
    assert got == (34, 12)
    assert probe_image_bytes(b"garbage bytes") is None


def test_double_wait_returns_instead_of_hanging():
    """Waiting a consumed ticket must not park the thread forever (the
    C side answers err=4; the Python side falls back to PIL)."""
    import numpy as np

    loader = NativeImageLoader()
    img = np.full((4, 4, 3), 7, np.uint8)
    t = loader.submit_bytes(_png_bytes(img))
    a = loader.wait(t)
    b = loader.wait(t)  # consumed: err=4 -> PIL fallback re-decodes
    np.testing.assert_array_equal(a, img)
    np.testing.assert_array_equal(b, img)
    loader.close()


def test_decode_batch_accepts_bytearray():
    """bytearray reached the native pool's c_char_p argument, which
    ctypes rejects — and the submit failure abandoned already-submitted
    tickets (leaking their decoded C buffers). The PIL fallback accepted
    bytearray, so the bug only appeared with the compiled pool."""
    import io

    import numpy as np
    from PIL import Image

    from imatch_tpu.runtime.loader import default_loader

    buf = io.BytesIO()
    Image.fromarray(
        np.zeros((16, 16, 3), np.uint8) + np.uint8(200)
    ).save(buf, "JPEG")
    blob = buf.getvalue()
    out = default_loader().decode_batch([blob, bytearray(blob)])
    assert out[0] is not None and out[1] is not None
    assert out[0].shape == out[1].shape == (16, 16, 3)
    assert (out[0] == out[1]).all()
