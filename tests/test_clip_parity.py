"""Numerical parity: imatch_tpu CLIP vs transformers.CLIPModel.

The BASELINE.md fidelity gate is cosine >= 0.999 vs the PyTorch reference.
No network access: we instantiate HF CLIPModel from config (random init),
push its state_dict through models/clip/convert.py, and compare towers.
Real checkpoints (LongCLIP) load through the exact same converter path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from imatch_tpu.models.clip import configs as C
from imatch_tpu.models.clip.convert import convert_hf_state_dict
from imatch_tpu.models.clip.model import encode_image, encode_text


def hf_config_for(cfg: C.CLIPConfig):
    vision = transformers.CLIPVisionConfig(
        hidden_size=cfg.vision.hidden_size,
        intermediate_size=cfg.vision.mlp_size,
        num_hidden_layers=cfg.vision.num_layers,
        num_attention_heads=cfg.vision.num_heads,
        image_size=cfg.vision.image_size,
        patch_size=cfg.vision.patch_size,
        hidden_act=cfg.vision.hidden_act,
        layer_norm_eps=cfg.vision.layer_norm_eps,
    )
    text = transformers.CLIPTextConfig(
        vocab_size=cfg.text.vocab_size,
        hidden_size=cfg.text.hidden_size,
        intermediate_size=cfg.text.mlp_size,
        num_hidden_layers=cfg.text.num_layers,
        num_attention_heads=cfg.text.num_heads,
        max_position_embeddings=cfg.text.max_positions,
        eos_token_id=cfg.text.eos_token_id,
        bos_token_id=cfg.text.eos_token_id - 1,
        hidden_act=cfg.text.hidden_act,
        layer_norm_eps=cfg.text.layer_norm_eps,
    )
    return transformers.CLIPConfig(
        text_config=text.to_dict(),
        vision_config=vision.to_dict(),
        projection_dim=cfg.projection_dim,
    )


# A 4-layer config with LongCLIP-style 248-token context: deep enough to
# surface layer-stacking/transpose bugs, fast enough for CPU CI.
SMALL_248 = C.CLIPConfig(
    name="small-248",
    vision=C.VisionConfig(
        image_size=64, patch_size=16, hidden_size=128, num_layers=4, num_heads=4
    ),
    text=C.TextConfig(
        vocab_size=512,
        max_positions=248,
        hidden_size=96,
        num_layers=4,
        num_heads=4,
        eos_token_id=511,
    ),
    projection_dim=64,
)


def make_tokens(rng, cfg: C.CLIPConfig, batch: int, seq: int) -> np.ndarray:
    """eos-padded token batches, mirroring processor(padding='max_length')."""
    eos = cfg.text.eos_token_id
    ids = rng.integers(1, cfg.text.vocab_size - 2, size=(batch, seq))
    for b in range(batch):
        length = int(rng.integers(2, seq))
        ids[b, length - 1 :] = eos
    return ids.astype(np.int32)


@pytest.mark.parametrize("cfg", [C.TINY, SMALL_248], ids=lambda c: c.name)
def test_tower_parity(cfg):
    torch.manual_seed(0)
    hf = transformers.CLIPModel(hf_config_for(cfg)).eval()
    params = convert_hf_state_dict(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    batch = 3
    pixels = rng.standard_normal(
        (batch, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    tokens = make_tokens(rng, cfg, batch, cfg.text.max_positions)

    with torch.no_grad():
        # HF wants NCHW
        t_img = hf.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        )
        t_img = (t_img / t_img.norm(dim=1, keepdim=True)).numpy()
        t_txt = hf.get_text_features(input_ids=torch.from_numpy(tokens).long())
        t_txt = (t_txt / t_txt.norm(dim=1, keepdim=True)).numpy()

    j_img = np.asarray(
        encode_image(params, jnp.asarray(pixels), cfg, attn_impl="xla")
    )
    j_txt = np.asarray(
        encode_text(params, jnp.asarray(tokens), cfg, attn_impl="xla")
    )

    cos_img = np.sum(j_img * t_img, axis=-1)
    cos_txt = np.sum(j_txt * t_txt, axis=-1)
    assert cos_img.min() > 0.999, f"image tower cosine {cos_img}"
    assert cos_txt.min() > 0.999, f"text tower cosine {cos_txt}"
    np.testing.assert_allclose(j_img, t_img, atol=2e-4)
    np.testing.assert_allclose(j_txt, t_txt, atol=2e-4)


def test_bf16_forward_close_to_fp32():
    """bf16 compute path (TPU default) stays close to fp32 embeddings."""
    import jax

    cfg = C.TINY
    from imatch_tpu.models.clip.model import init_params

    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    )
    f32 = encode_image(params, pixels, cfg, dtype=jnp.float32, attn_impl="xla")
    bf16 = encode_image(params, pixels, cfg, dtype=jnp.bfloat16, attn_impl="xla")
    cos = jnp.sum(f32 * bf16, axis=-1)
    assert float(cos.min()) > 0.99


def test_w8a8_forward_close_to_fp32():
    """Opt-in W8A8 tower (imatch_tpu/models/clip/quant.py): int8 encoder
    matmuls stay close to the fp32 embeddings on random init — a
    catastrophic scale/layout bug shows up even without real weights."""
    import jax
    from imatch_tpu.models.clip.model import init_params
    from imatch_tpu.models.clip.quant import (
        encode_image_w8a8,
        quantize_vision_tower,
    )

    cfg = C.TINY
    params = init_params(jax.random.key(0), cfg)
    qvision = quantize_vision_tower(params["vision"])
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(
        rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    )
    f32 = encode_image(params, pixels, cfg, dtype=jnp.float32, attn_impl="xla")
    q = encode_image_w8a8(params, qvision, pixels, cfg)
    assert q.shape == f32.shape
    cos = jnp.sum(f32 * q, axis=-1)
    assert float(cos.min()) > 0.98, np.asarray(cos)


def test_position_stretching_longclip():
    """LongCLIP 77->248 stretching: head rows verbatim, tail interpolated."""
    from imatch_tpu.models.clip.convert import _stretch_positions

    rng = np.random.default_rng(0)
    pe = rng.standard_normal((77, 8)).astype(np.float32)
    out = _stretch_positions(pe, 248)
    assert out.shape == (248, 8)
    np.testing.assert_array_equal(out[:20], pe[:20])  # kept verbatim
    np.testing.assert_allclose(out[20], pe[20], atol=1e-6)  # interp start
    np.testing.assert_allclose(out[-1], pe[-1], atol=1e-6)  # interp end
    # monotone blend: every stretched row is a convex combo of neighbors
    mins = pe[20:].min(axis=0) - 1e-5
    maxs = pe[20:].max(axis=0) + 1e-5
    assert (out[20:] >= mins).all() and (out[20:] <= maxs).all()
    # no-op and truncation cases
    np.testing.assert_array_equal(_stretch_positions(pe, 77), pe)
    assert _stretch_positions(pe, 50).shape == (50, 8)


def test_checkpoint_directory_roundtrip(tmp_path, monkeypatch):
    """Full checkpoint pathway: HF save_pretrained -> load_hf_checkpoint ->
    ClipEmbedder, with tower outputs matching the torch model."""
    from imatch_tpu.pipeline.embedder import ClipEmbedder

    cfg = C.TINY
    hf = transformers.CLIPModel(hf_config_for(cfg))
    hf.eval()
    hf.save_pretrained(tmp_path)  # writes model.safetensors + config

    emb = ClipEmbedder(config=cfg, checkpoint=str(tmp_path))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (cfg.vision.image_size, cfg.vision.image_size, 3), np.uint8)

    ours = emb.embed_images([img])[0]
    # torch reference with identical preprocessing (pixel values in [0,1]
    # then CLIP-normalized — reuse our preprocess to isolate the towers)
    from imatch_tpu.ops.preprocess import preprocess_images

    pixels = np.asarray(preprocess_images([img], out_size=cfg.vision.image_size))
    with torch.no_grad():
        feats = hf.get_image_features(
            pixel_values=torch.from_numpy(pixels).permute(0, 3, 1, 2)
        )
        feats = feats / feats.norm(dim=-1, keepdim=True)
    ref = feats[0].numpy()
    cos = float(np.dot(ours, ref))
    assert cos >= 0.999, cos
