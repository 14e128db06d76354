"""U²-Net in pure JAX (NHWC) — salient-object segmentation.

Replaces rembg's onnxruntime U²-Net (/root/reference/utils.py:51-57).
TPU-first choices: NHWC layout end-to-end (conv_general_dilated maps
straight onto the MXU), SAME-padded stride-2 max-pool windows (the
ceil_mode the torch model uses), bilinear ``jax.image.resize`` for the
decoder upsampling, inference-mode batchnorm folded as an affine. The
whole net jits into a single XLA program; batches of images are the unit
of work (the reference segments one upload at a time).

Structure (U²-Net paper / released torch model): 6 RSU encoder stages
with pooling between, 5 RSU decoder stages on concatenated skips, 6
side heads fused by a 1x1 conv; each RSU-L is itself a small U-Net with
a residual over its input conv. RSU-4F swaps pooling for a dilation
pyramid (1,2,4,8).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from imatch_tpu.models.u2net.configs import U2NetConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def _conv_bn_relu(x, p, *, dilation: int, eps: float):
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=[(dilation, dilation), (dilation, dilation)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y + p["b"].astype(x.dtype)
    bn = p["bn"]
    y32 = y.astype(jnp.float32)
    y32 = (y32 - bn["mean"]) * jax.lax.rsqrt(bn["var"] + eps)
    y32 = y32 * bn["scale"] + bn["bias"]
    return jax.nn.relu(y32).astype(x.dtype)


def _maxpool2(x):
    # SAME padding + stride 2 == torch MaxPool2d(2, stride=2, ceil_mode=True)
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "SAME",
    )


def _upsample_like(x, ref):
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]), "bilinear"
    )


def _conv1x1(x, p):
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"].astype(x.dtype)


# kernel size comes from the weights: the side heads' 3x3 convs and the
# 1x1 outconv are the SAME stride-1 SAME-padded op
_conv3x3_plain = _conv1x1


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_cbr(key, cin, cout):
    return {
        "w": jax.nn.initializers.he_normal()(key, (3, 3, cin, cout), jnp.float32),
        "b": jnp.zeros((cout,)),
        "bn": {
            "scale": jnp.ones((cout,)),
            "bias": jnp.zeros((cout,)),
            "mean": jnp.zeros((cout,)),
            "var": jnp.ones((cout,)),
        },
    }


def _init_rsu(key, L, cin, mid, cout):
    ks = iter(jax.random.split(key, 2 * L + 2))
    p = {"in": _init_cbr(next(ks), cin, cout)}
    p["enc"] = [_init_cbr(next(ks), cout if i == 0 else mid, mid) for i in range(L - 1)]
    p["bottom"] = _init_cbr(next(ks), mid, mid)
    p["dec"] = [
        _init_cbr(next(ks), 2 * mid, cout if i == L - 2 else mid)
        for i in range(L - 1)
    ]
    return p


def init_u2_params(key, cfg: U2NetConfig) -> Params:
    n_enc, n_dec = len(cfg.encoder), len(cfg.decoder)
    ks = iter(jax.random.split(key, n_enc + n_dec + n_enc + 1))
    params: Params = {"encoder": [], "decoder": [], "side": []}
    for L, cin, mid, cout, _ in cfg.encoder:
        params["encoder"].append(_init_rsu(next(ks), L, cin, mid, cout))
    for L, cin, mid, cout, _ in cfg.decoder:
        params["decoder"].append(_init_rsu(next(ks), L, cin, mid, cout))
    # side heads: one per decoder output (d1..d5) + encoder stage6
    side_srcs = [cfg.decoder[-1][3]] + [d[3] for d in reversed(cfg.decoder[:-1])]
    side_srcs = side_srcs + [cfg.encoder[-1][3]]
    # order: side1 (from stage1d) .. side6 (from stage6)
    for cs in side_srcs:
        k = next(ks)
        params["side"].append(
            {
                "w": jax.nn.initializers.he_normal()(
                    k, (3, 3, cs, 1), jnp.float32
                ),
                "b": jnp.zeros((1,)),
            }
        )
    params["outconv"] = {
        "w": jax.nn.initializers.he_normal()(
            next(ks), (1, 1, n_enc, 1), jnp.float32
        ),
        "b": jnp.zeros((1,)),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _rsu(x, p, *, L, dilated, eps):
    hin = _conv_bn_relu(x, p["in"], dilation=1, eps=eps)
    if dilated:
        # RSU-4F: dilation pyramid, no pooling.
        feats = [hin]
        h = hin
        for i, ep in enumerate(p["enc"]):
            h = _conv_bn_relu(h, ep, dilation=2**i, eps=eps)
            feats.append(h)
        h = _conv_bn_relu(h, p["bottom"], dilation=2 ** (L - 1), eps=eps)
        for i, dp in enumerate(p["dec"]):
            skip = feats[L - 1 - i]
            h = _conv_bn_relu(
                jnp.concatenate([h, skip], axis=-1),
                dp,
                dilation=2 ** (L - 2 - i),
                eps=eps,
            )
        return hin + h
    feats = []
    h = hin
    for i, ep in enumerate(p["enc"]):
        h = _conv_bn_relu(h, ep, dilation=1, eps=eps)
        feats.append(h)
        if i < L - 2:
            h = _maxpool2(h)
    h = _conv_bn_relu(h, p["bottom"], dilation=2, eps=eps)
    for i, dp in enumerate(p["dec"]):
        skip = feats[L - 2 - i]
        if h.shape[1] != skip.shape[1] or h.shape[2] != skip.shape[2]:
            h = _upsample_like(h, skip)
        h = _conv_bn_relu(
            jnp.concatenate([h, skip], axis=-1), dp, dilation=1, eps=eps
        )
    return hin + h


def u2net_forward(
    params: Params, pixels: jax.Array, cfg: U2NetConfig, *, dtype=jnp.float32
) -> jax.Array:
    """(B, H, W, 3) normalized pixels -> (B, H, W) saliency in [0, 1]."""
    eps = cfg.bn_eps
    x = pixels.astype(dtype)
    enc_outs: List[jax.Array] = []
    h = x
    n = len(cfg.encoder)
    for i, ((L, _, _, _, dil), ep) in enumerate(zip(cfg.encoder, params["encoder"])):
        h = _rsu(h, ep, L=L, dilated=dil, eps=eps)
        enc_outs.append(h)
        if i < n - 1:
            h = _maxpool2(h)

    # decoder: stage5d..stage1d over [up(prev); skip]
    d = enc_outs[-1]
    dec_outs: List[jax.Array] = []
    for i, ((L, _, _, _, dil), dp) in enumerate(zip(cfg.decoder, params["decoder"])):
        skip = enc_outs[n - 2 - i]
        d = _upsample_like(d, skip)
        d = _rsu(jnp.concatenate([d, skip], axis=-1), dp, L=L, dilated=dil, eps=eps)
        dec_outs.append(d)

    # side outputs: d1 (last decoder) .. d5, then encoder stage6
    srcs = [dec_outs[-1]] + list(reversed(dec_outs[:-1])) + [enc_outs[-1]]
    sides = []
    for src, sp in zip(srcs, params["side"]):
        s = _conv3x3_plain(src, sp)
        sides.append(_upsample_like(s, x))
    fused = _conv1x1(jnp.concatenate(sides, axis=-1), params["outconv"])
    return jax.nn.sigmoid(fused.astype(jnp.float32))[..., 0]
