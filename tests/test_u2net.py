"""U²-Net: forward shapes, segmenter runtime, converter layout parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imatch_tpu.models.u2net import (
    TINY_U2,
    U2NetSegmenter,
    get_u2_config,
    init_u2_params,
    u2net_forward,
)


def test_forward_shape_and_range():
    cfg = TINY_U2
    params = init_u2_params(jax.random.key(0), cfg)
    x = jnp.zeros((2, cfg.input_size, cfg.input_size, 3))
    m = u2net_forward(params, x, cfg)
    assert m.shape == (2, cfg.input_size, cfg.input_size)
    assert bool(jnp.all((m >= 0) & (m <= 1)))


def test_forward_nonsquare_batch():
    cfg = TINY_U2
    params = init_u2_params(jax.random.key(0), cfg)
    # U-Net topology must survive non-power-of-two sizes (ceil pooling).
    x = jnp.ones((1, 52, 76, 3))
    m = u2net_forward(params, x, cfg)
    assert m.shape == (1, 52, 76)


def test_segmenter_runtime(monkeypatch):
    monkeypatch.setenv("IMATCH_U2_CONFIG", "tiny-u2")
    seg = U2NetSegmenter(config="tiny-u2")
    img = np.random.default_rng(0).integers(0, 256, (50, 70, 3), np.uint8)
    out = seg.remove_background(img)
    assert out.shape == (50, 70, 4)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[..., :3], img)  # RGB preserved
    mask = seg.predict_mask(img)
    assert mask.shape == (50, 70)
    assert mask.min() >= 0.0 and mask.max() <= 1.0


def test_factory_modes(monkeypatch):
    from imatch_tpu.models.u2net.runtime import get_segmenter

    monkeypatch.setenv("IMATCH_SEGMENTER", "null")
    assert get_segmenter() is None
    monkeypatch.setenv("IMATCH_SEGMENTER", "auto")
    monkeypatch.delenv("IMATCH_U2_CHECKPOINT", raising=False)
    assert get_segmenter() is None  # no checkpoint -> degraded mode
    monkeypatch.setenv("IMATCH_SEGMENTER", "u2net")
    monkeypatch.setenv("IMATCH_U2_CONFIG", "tiny-u2")
    assert get_segmenter() is not None


def test_converter_accepts_torch_layout():
    from imatch_tpu.models.u2net.convert import convert_u2_state_dict

    cfg = TINY_U2
    rng = np.random.default_rng(1)

    def r(*s):
        return rng.standard_normal(s).astype(np.float32)

    def cbr(sd, prefix, cin, cout):
        sd[f"{prefix}.conv_s1.weight"] = r(cout, cin, 3, 3)
        sd[f"{prefix}.conv_s1.bias"] = r(cout)
        sd[f"{prefix}.bn_s1.weight"] = r(cout)
        sd[f"{prefix}.bn_s1.bias"] = r(cout)
        sd[f"{prefix}.bn_s1.running_mean"] = r(cout)
        sd[f"{prefix}.bn_s1.running_var"] = np.abs(r(cout)) + 0.5

    def rsu(sd, stage, L, cin, mid, cout):
        cbr(sd, f"{stage}.rebnconvin", cin, cout)
        cbr(sd, f"{stage}.rebnconv1", cout, mid)
        for i in range(2, L):
            cbr(sd, f"{stage}.rebnconv{i}", mid, mid)
        cbr(sd, f"{stage}.rebnconv{L}", mid, mid)
        for i in range(L - 1, 1, -1):
            cbr(sd, f"{stage}.rebnconv{i}d", 2 * mid, mid)
        cbr(sd, f"{stage}.rebnconv1d", 2 * mid, cout)

    sd = {}
    for i, (L, cin, mid, cout, _) in enumerate(cfg.encoder):
        rsu(sd, f"stage{i + 1}", L, cin, mid, cout)
    n = len(cfg.encoder)
    for i, (L, cin, mid, cout, _) in enumerate(cfg.decoder):
        rsu(sd, f"stage{n - 1 - i}d", L, cin, mid, cout)
    side_srcs = [cfg.decoder[-1][3]] + [
        d[3] for d in reversed(cfg.decoder[:-1])
    ] + [cfg.encoder[-1][3]]
    for i, cs in enumerate(side_srcs):
        sd[f"side{i + 1}.weight"] = r(1, cs, 3, 3)
        sd[f"side{i + 1}.bias"] = r(1)
    sd["outconv.weight"] = r(1, n, 1, 1)
    sd["outconv.bias"] = r(1)

    params = convert_u2_state_dict(sd, cfg)
    ref = init_u2_params(jax.random.key(0), cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a).shape, np.asarray(b).shape
        ),
        params,
        ref,
    )
    m = u2net_forward(
        jax.tree.map(jnp.asarray, params),
        jnp.zeros((1, cfg.input_size, cfg.input_size, 3)),
        cfg,
    )
    assert bool(jnp.all(jnp.isfinite(m)))


def test_ingest_with_segmenter(tmp_path, monkeypatch):
    """remove_bg=True flows the cutout through the pipeline."""
    monkeypatch.setenv("IMATCH_SEGMENTER", "u2net")
    monkeypatch.setenv("IMATCH_U2_CONFIG", "tiny-u2")
    monkeypatch.setenv("IMATCH_CAPTIONER", "null")
    from imatch_tpu.models.clip.configs import get_config
    from imatch_tpu.pipeline.embedder import ClipEmbedder
    from imatch_tpu.pipeline.ingest import process_image
    from imatch_tpu.pipeline.state import AppState
    from PIL import Image

    state = AppState(
        root=str(tmp_path), embedder=ClipEmbedder(config="tiny"),
    )
    assert state.segmenter is not None
    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 256, (40, 40, 3), np.uint8)
    )
    meta, is_new = process_image(state, img, "x.png", remove_bg=True)
    assert is_new
    out = np.asarray(Image.open(meta["processed_url"]))
    assert out.shape[-1] == 4  # RGBA cutout persisted


def test_remove_background_batch_bucketed_dispatch():
    """N mixed-geometry images -> one mask dispatch per geometry bucket,
    results identical to the per-image path."""
    from imatch_tpu.models.u2net.runtime import U2NetSegmenter

    seg = U2NetSegmenter(config="tiny-u2")
    rng = np.random.default_rng(3)
    imgs = (
        [rng.integers(0, 256, (40, 48, 3), np.uint8) for _ in range(3)]
        + [rng.integers(0, 256, (32, 32, 3), np.uint8) for _ in range(2)]
    )
    calls = []
    orig = seg._mask_fn

    def counting(params, x):
        calls.append(x.shape)
        return orig(params, x)

    seg._mask_fn = counting
    batch = seg.remove_background_batch(imgs)
    assert len(calls) == 2  # two geometry buckets
    assert calls[0][0] == 4 and calls[1][0] == 2  # padded to pow2
    seg._mask_fn = orig
    for im, rgba in zip(imgs, batch):
        single = seg.remove_background(im)
        assert rgba.shape == single.shape == im.shape[:2] + (4,)
        np.testing.assert_array_equal(rgba[..., :3], im)
        # alpha from the batched path matches the single path
        diff = np.abs(rgba[..., 3].astype(int) - single[..., 3].astype(int))
        assert diff.max() <= 1
