"""Pure-JAX CLIP: ViT image tower + text transformer, TPU-first.

Numerically matches HF ``transformers.CLIPModel`` (the reference's compute
backend, /root/reference/utils.py:59-102):

- quick_gelu activation, LayerNorm eps 1e-5, pre-LN residual blocks;
- vision: conv patch embed (no bias) + CLS token + learned positions,
  pre-LN, encoder, post-LN on the CLS token, linear projection (no bias);
- text: token + position embeddings, causal encoder, final LN, pooled at
  the FIRST eos token, linear projection (no bias);
- L2-normalized embeddings (utils.py:78,98).

TPU-first choices: transformer layers are stacked along a leading axis and
scanned with ``lax.scan`` (one compiled layer body, fast XLA compiles);
matmuls accept a compute ``dtype`` (bfloat16 on TPU for MXU throughput)
while layernorm/softmax stay fp32; attention dispatches to the Pallas
flash kernel via ops/attention.py. Params are a plain dict pytree, so
``jax.sharding`` partition specs attach directly (parallel/sharding.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from imatch_tpu.models.clip.configs import CLIPConfig, TextConfig, VisionConfig
from imatch_tpu.ops.attention import mha

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_encoder_layers(key, num_layers, d, d_mlp):
    ks = jax.random.split(key, 4)
    init = jax.nn.initializers.normal(0.02)

    def stack(k, shape):
        return init(k, (num_layers,) + shape, jnp.float32)

    return {
        "ln1": {
            "scale": jnp.ones((num_layers, d)),
            "bias": jnp.zeros((num_layers, d)),
        },
        "attn": {
            "wq": stack(jax.random.fold_in(ks[0], 0), (d, d)),
            "wk": stack(jax.random.fold_in(ks[0], 1), (d, d)),
            "wv": stack(jax.random.fold_in(ks[0], 2), (d, d)),
            "wo": stack(jax.random.fold_in(ks[0], 3), (d, d)),
            "bq": jnp.zeros((num_layers, d)),
            "bk": jnp.zeros((num_layers, d)),
            "bv": jnp.zeros((num_layers, d)),
            "bo": jnp.zeros((num_layers, d)),
        },
        "ln2": {
            "scale": jnp.ones((num_layers, d)),
            "bias": jnp.zeros((num_layers, d)),
        },
        "mlp": {
            "w1": stack(ks[1], (d, d_mlp)),
            "b1": jnp.zeros((num_layers, d_mlp)),
            "w2": stack(ks[2], (d_mlp, d)),
            "b2": jnp.zeros((num_layers, d)),
        },
    }


def init_vision_params(key, cfg: VisionConfig, projection_dim: int) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    init = jax.nn.initializers.normal(0.02)
    d = cfg.hidden_size
    return {
        # HWIO conv kernel (NHWC inputs — TPU-native layout).
        "patch_embedding": init(
            k1, (cfg.patch_size, cfg.patch_size, 3, d), jnp.float32
        ),
        "class_embedding": init(k2, (d,), jnp.float32),
        "position_embedding": init(k3, (cfg.seq_len, d), jnp.float32),
        "pre_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "layers": _init_encoder_layers(k4, cfg.num_layers, d, cfg.mlp_size),
        "post_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "projection": init(k5, (d, projection_dim), jnp.float32),
    }


def init_text_params(key, cfg: TextConfig, projection_dim: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    init = jax.nn.initializers.normal(0.02)
    d = cfg.hidden_size
    return {
        "token_embedding": init(k1, (cfg.vocab_size, d), jnp.float32),
        "position_embedding": init(k2, (cfg.max_positions, d), jnp.float32),
        "layers": _init_encoder_layers(k3, cfg.num_layers, d, cfg.mlp_size),
        "final_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "projection": init(k4, (d, projection_dim), jnp.float32),
    }


def init_params(key, cfg: CLIPConfig) -> Params:
    kv, kt = jax.random.split(key)
    return {
        "vision": init_vision_params(kv, cfg.vision, cfg.projection_dim),
        "text": init_text_params(kt, cfg.text, cfg.projection_dim),
        "logit_scale": jnp.asarray(cfg.logit_scale_init, jnp.float32),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _prec(dtype):
    """Contraction precision policy.

    jax's DEFAULT matmul precision is bf16-class on all backends (measured:
    ~1e-2 relative error on fp32 CPU matmuls under jax 0.9). For fp32
    compute (the fidelity path) force HIGHEST; for bf16 compute (the TPU
    throughput path) DEFAULT feeds the MXU natively with fp32 accumulation
    via preferred_element_type.
    """
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _dense(x, w, b, prec):
    y = jnp.einsum(
        "...d,df->...f",
        x,
        w.astype(x.dtype),
        precision=prec,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _layer_norm(x, p, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _act(x, name):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {name}")


def _vision_stem(vp, vc, pixels, dtype):
    """Patch conv + CLS + positions + pre-LN — ONE definition for the
    bf16 tower (encode_image) and the W8A8 tower (clip/quant.py), which
    previously carried a near-verbatim copy that could drift."""
    x = pixels.astype(dtype)
    # Patch embedding: stride-P conv, no bias (HF patch_embedding).
    # No preferred_element_type here: its fp32 cotangent breaks the conv
    # transpose rule under AD with bf16 operands, and the TPU conv already
    # accumulates bf16 inputs in fp32 natively.
    x = jax.lax.conv_general_dilated(
        x,
        vp["patch_embedding"].astype(dtype),
        window_strides=(vc.patch_size, vc.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_prec(dtype),
    )
    b = x.shape[0]
    x = x.reshape(b, vc.num_patches, vc.hidden_size)
    cls = jnp.broadcast_to(
        vp["class_embedding"].astype(dtype), (b, 1, vc.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["position_embedding"].astype(dtype)
    return _layer_norm(x, vp["pre_ln"], vc.layer_norm_eps)


def _encoder(x, layers: Params, *, num_heads, eps, act, causal, attn_impl):
    """Scan one compiled residual block over the stacked layer params."""
    b, s, d = x.shape
    hd = d // num_heads
    prec = _prec(x.dtype)

    def body(h, lp):
        y = _layer_norm(h, lp["ln1"], eps)
        a = lp["attn"]
        q = _dense(y, a["wq"], a["bq"], prec)
        k = _dense(y, a["wk"], a["bk"], prec)
        v = _dense(y, a["wv"], a["bv"], prec)
        q = q.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        o = mha(q, k, v, causal=causal, impl=attn_impl, precision=prec)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        h = h + _dense(o, a["wo"], a["bo"], prec)

        y = _layer_norm(h, lp["ln2"], eps)
        m = lp["mlp"]
        y = _act(_dense(y, m["w1"], m["b1"], prec), act)
        h = h + _dense(y, m["w2"], m["b2"], prec)
        return h, None

    x, _ = jax.lax.scan(body, x, layers)
    return x


def encode_image(
    params: Params,
    pixels: jax.Array,
    cfg: CLIPConfig,
    *,
    dtype=jnp.float32,
    normalize: bool = True,
    attn_impl: str = "auto",
) -> jax.Array:
    """Image tower. ``pixels``: (B, H, W, 3) preprocessed NHWC floats.

    Mirrors ``CLIPModel.get_image_features`` + L2 norm
    (/root/reference/utils.py:73-79).
    """
    vc = cfg.vision
    vp = params["vision"]
    x = _vision_stem(vp, vc, pixels, dtype)
    x = _encoder(
        x,
        vp["layers"],
        num_heads=vc.num_heads,
        eps=vc.layer_norm_eps,
        act=vc.hidden_act,
        causal=False,
        attn_impl=attn_impl,
    )
    pooled = x[:, 0, :]
    pooled = _layer_norm(pooled, vp["post_ln"], vc.layer_norm_eps)
    feats = _dense(pooled, vp["projection"], None, _prec(dtype))
    feats = feats.astype(jnp.float32)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


def encode_text(
    params: Params,
    token_ids: jax.Array,
    cfg: CLIPConfig,
    *,
    dtype=jnp.float32,
    normalize: bool = True,
    attn_impl: str = "auto",
    eos_token_id: int = None,
) -> jax.Array:
    """Text tower. ``token_ids``: (B, S) int32, eos-padded to a fixed S.

    Mirrors ``CLIPModel.get_text_features`` + L2 norm
    (/root/reference/utils.py:83-99); pooling at the FIRST eos token, which
    with eos-padding and a causal mask is exactly HF's argmax pooling.
    ``eos_token_id`` overrides the config (used with alternate vocabs,
    e.g. the offline byte-fallback tokenizer).
    """
    tc = cfg.text
    eos_id = tc.eos_token_id if eos_token_id is None else eos_token_id
    tp = params["text"]
    b, s = token_ids.shape
    x = tp["token_embedding"][token_ids].astype(dtype)
    x = x + tp["position_embedding"][:s].astype(dtype)
    x = _encoder(
        x,
        tp["layers"],
        num_heads=tc.num_heads,
        eps=tc.layer_norm_eps,
        act=tc.hidden_act,
        causal=True,
        attn_impl=attn_impl,
    )
    x = _layer_norm(x, tp["final_ln"], tc.layer_norm_eps)
    eos_pos = jnp.argmax((token_ids == eos_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(b), eos_pos]
    feats = _dense(pooled, tp["projection"], None, _prec(dtype))
    feats = feats.astype(jnp.float32)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


def clip_forward(
    params: Params,
    pixels: jax.Array,
    token_ids: jax.Array,
    cfg: CLIPConfig,
    *,
    dtype=jnp.float32,
    attn_impl: str = "auto",
):
    """Joint forward: normalized embeddings + contrastive logits.

    Used by the training step (train/contrastive.py); the reference has no
    training path, this is a framework capability beyond parity.
    """
    img = encode_image(
        params, pixels, cfg, dtype=dtype, normalize=True, attn_impl=attn_impl
    )
    txt = encode_text(
        params, token_ids, cfg, dtype=dtype, normalize=True, attn_impl=attn_impl
    )
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * jnp.einsum(
        "id,jd->ij", img, txt, precision=jax.lax.Precision.HIGHEST
    )
    return img, txt, logits_per_image
