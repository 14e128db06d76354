"""Preprocess parity vs PIL and transformers.CLIPImageProcessor."""

import numpy as np
import pytest
from PIL import Image

from imatch_tpu.ops.resize import resample_matrix, resize_crop_matrices
from imatch_tpu.ops.preprocess import (
    CLIP_STD,
    preprocess_images,
    preprocess_batch,
)


@pytest.mark.parametrize(
    "in_size,out_size", [(48, 16), (16, 48), (224, 224), (300, 224), (97, 31)]
)
def test_resample_matrix_matches_pil_float(in_size, out_size):
    """Float-mode PIL resize has no uint8 rounding -> near-exact check."""
    rng = np.random.default_rng(0)
    img = rng.standard_normal((in_size, in_size)).astype(np.float32)
    pil = Image.fromarray(img, mode="F").resize(
        (out_size, out_size), Image.Resampling.BICUBIC
    )
    ref = np.asarray(pil)
    A = resample_matrix(in_size, out_size)
    got = A @ img @ A.T
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_resize_crop_matrices_shapes():
    a_v, a_h = resize_crop_matrices(480, 640, 224)
    assert a_v.shape == (224, 480) and a_h.shape == (224, 640)
    # rows are affine combinations (sum 1) inside the crop
    np.testing.assert_allclose(a_v.sum(1), 1.0, atol=1e-5)
    np.testing.assert_allclose(a_h.sum(1), 1.0, atol=1e-5)


@pytest.mark.parametrize("hw", [(256, 384), (384, 256), (224, 224), (150, 500)])
def test_matches_hf_clip_image_processor(hw):
    transformers = pytest.importorskip("transformers")
    proc = transformers.CLIPImageProcessor()
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)

    ref = proc(images=Image.fromarray(img), return_tensors="np")["pixel_values"]
    ref = ref[0].transpose(1, 2, 0)  # NCHW -> HWC

    got = np.asarray(preprocess_batch(img[None]))[0]
    assert got.shape == ref.shape == (224, 224, 3)
    # We emulate PIL's two-pass uint8 rounding: at most 1 level off.
    diff = np.abs(got - ref)
    assert diff.max() <= 1.0 / 255.0 / CLIP_STD.min() + 1e-5, diff.max()
    assert diff.mean() < 1e-3, diff.mean()


def test_drill_corpus_preprocess():
    """Format matrix from the reference corpus: jpg + webp + avif decode
    and preprocess through the bucketed host API."""
    import os

    d = "/root/reference/images"
    files = ["red drill.jpg", "orange drill.avif", "red drill not match.webp"]
    imgs = [
        np.asarray(Image.open(os.path.join(d, f)).convert("RGB")) for f in files
    ]
    out = preprocess_images(imgs)
    assert out.shape == (3, 224, 224, 3)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # normalized range sanity
    assert out.min() > -3.5 and out.max() < 3.5
