"""Moondream-class VLM: SigLIP-style vision tower + Phi-style decoder.

TPU-first shape (same conventions as models/clip/model.py): per-layer
params stacked on a leading axis and scanned (one compiled layer body);
bf16 matmuls with fp32 layernorm/softmax; the KV cache is a pair of
(L, B, H, Dh, S_max) arrays riding the layer-scan CARRY with in-place
column writes (see decoder_forward) so prefill and every decode step are
each a single fused XLA program — no Python in the token loop
(``lax.while_loop`` drives generation) and no per-step cache copies.

Replaces moondream_model.encode_image/caption/query
(/root/reference/backend/app/main.py:600-603,1001-1002).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from imatch_tpu.models.moondream.configs import MoondreamConfig
from imatch_tpu.ops.quant import (
    ln_quant_rows_int8,
    qdot_int8,
    quant_rows_int8,
    quantize_weight_int8,
)
from imatch_tpu.ops.attention import mha

Params = Dict[str, Any]

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_vision_layers(key, n, d, d_mlp):
    ks = jax.random.split(key, 3)
    init = jax.nn.initializers.normal(0.02)

    def stack(k, shape):
        return init(k, (n,) + shape, jnp.float32)

    return {
        "ln1": {"scale": jnp.ones((n, d)), "bias": jnp.zeros((n, d))},
        "attn": {
            # separate projections (not packed qkv): each one column-splits
            # cleanly for tensor parallelism (parallel/sharding.py)
            "wq": stack(jax.random.fold_in(ks[0], 0), (d, d)),
            "wk": stack(jax.random.fold_in(ks[0], 2), (d, d)),
            "wv": stack(jax.random.fold_in(ks[0], 3), (d, d)),
            "bq": jnp.zeros((n, d)),
            "bk": jnp.zeros((n, d)),
            "bv": jnp.zeros((n, d)),
            "wo": stack(jax.random.fold_in(ks[0], 1), (d, d)),
            "bo": jnp.zeros((n, d)),
        },
        "ln2": {"scale": jnp.ones((n, d)), "bias": jnp.zeros((n, d))},
        "mlp": {
            "w1": stack(ks[1], (d, d_mlp)),
            "b1": jnp.zeros((n, d_mlp)),
            "w2": stack(ks[2], (d_mlp, d)),
            "b2": jnp.zeros((n, d)),
        },
    }


def _init_text_layers(key, n, d, d_mlp):
    ks = jax.random.split(key, 3)
    init = jax.nn.initializers.normal(0.02)

    def stack(k, shape):
        return init(k, (n,) + shape, jnp.float32)

    return {
        # Phi parallel block: one LN feeds both attention and MLP.
        "ln": {"scale": jnp.ones((n, d)), "bias": jnp.zeros((n, d))},
        "attn": {
            # separate projections (not packed qkv): each one column-splits
            # cleanly for tensor parallelism (parallel/sharding.py)
            "wq": stack(jax.random.fold_in(ks[0], 0), (d, d)),
            "wk": stack(jax.random.fold_in(ks[0], 2), (d, d)),
            "wv": stack(jax.random.fold_in(ks[0], 3), (d, d)),
            "bq": jnp.zeros((n, d)),
            "bk": jnp.zeros((n, d)),
            "bv": jnp.zeros((n, d)),
            "wo": stack(jax.random.fold_in(ks[0], 1), (d, d)),
            "bo": jnp.zeros((n, d)),
        },
        "mlp": {
            "w1": stack(ks[1], (d, d_mlp)),
            "b1": jnp.zeros((n, d_mlp)),
            "w2": stack(ks[2], (d_mlp, d)),
            "b2": jnp.zeros((n, d)),
        },
    }


def init_md_params(key, cfg: MoondreamConfig) -> Params:
    kv, kp, kt, kh = jax.random.split(key, 4)
    init = jax.nn.initializers.normal(0.02)
    v, t = cfg.vision, cfg.text
    return {
        "vision": {
            "patch_embedding": {
                "w": init(
                    jax.random.fold_in(kv, 0),
                    (v.patch_size, v.patch_size, 3, v.hidden_size),
                    jnp.float32,
                ),
                "b": jnp.zeros((v.hidden_size,)),
            },
            "position_embedding": init(
                jax.random.fold_in(kv, 1),
                (v.num_patches, v.hidden_size),
                jnp.float32,
            ),
            "layers": _init_vision_layers(
                jax.random.fold_in(kv, 2), v.num_layers, v.hidden_size, v.mlp_size
            ),
            "post_ln": {
                "scale": jnp.ones((v.hidden_size,)),
                "bias": jnp.zeros((v.hidden_size,)),
            },
        },
        "projector": {
            "w1": init(
                jax.random.fold_in(kp, 0),
                (v.hidden_size, cfg.proj_hidden),
                jnp.float32,
            ),
            "b1": jnp.zeros((cfg.proj_hidden,)),
            "w2": init(
                jax.random.fold_in(kp, 1),
                (cfg.proj_hidden, t.hidden_size),
                jnp.float32,
            ),
            "b2": jnp.zeros((t.hidden_size,)),
        },
        "text": {
            "token_embedding": init(
                jax.random.fold_in(kt, 0),
                (t.vocab_size, t.hidden_size),
                jnp.float32,
            ),
            "layers": _init_text_layers(
                jax.random.fold_in(kt, 1), t.num_layers, t.hidden_size, t.mlp_size
            ),
            "final_ln": {
                "scale": jnp.ones((t.hidden_size,)),
                "bias": jnp.zeros((t.hidden_size,)),
            },
            "lm_head": {
                "w": init(kh, (t.hidden_size, t.vocab_size), jnp.float32),
                "b": jnp.zeros((t.vocab_size,)),
            },
        },
    }


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


# _prec/_layer_norm are the CLIP tower's definitions, imported — a
# byte-identical local copy once lived here and a precision-policy or
# layernorm fix applied to one tower would silently miss the other.
from imatch_tpu.models.clip.model import (  # noqa: E402
    _layer_norm,
    _prec,
)


def _dense(x, w, b, prec):
    """x @ w + b. ``w`` is a plain matrix or an int8 weight-only quant
    dict {"q": int8 (..., in, out), "s": fp32 (..., 1, out)} from
    quantize_int8 — dequantization is a per-output-channel scale applied
    to the fp32 accumulator, so XLA streams int8 bytes from HBM and the
    cast-to-compute fuses into the matmul read."""
    if isinstance(w, dict):
        y = jnp.einsum(
            "...d,df->...f",
            x,
            w["q"].astype(x.dtype),
            precision=prec,
            preferred_element_type=jnp.float32,
        )
        y = (y * w["s"]).astype(x.dtype)
    else:
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


# W8A8 primitives shared with the CLIP tower (ops/quant.py) — one
# implementation, no numerical divergence between the two users
_quant_rows = quant_rows_int8
_ln_quant = ln_quant_rows_int8
_dense_w8a8 = qdot_int8


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


# ---------------------------------------------------------------------------
# Vision tower + projector
# ---------------------------------------------------------------------------


def encode_image_features(
    params: Params,
    pixels: jax.Array,
    cfg: MoondreamConfig,
    *,
    dtype=jnp.float32,
    attn_impl: str = "auto",
) -> jax.Array:
    """(B, H, W, 3) normalized pixels -> (B, P, D_text) LM-space embeds."""
    v = cfg.vision
    vp = params["vision"]
    prec = _prec(dtype)
    x = pixels.astype(dtype)
    x = jax.lax.conv_general_dilated(
        x,
        vp["patch_embedding"]["w"].astype(dtype),
        window_strides=(v.patch_size, v.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec,
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    b = x.shape[0]
    x = x.reshape(b, v.num_patches, v.hidden_size)
    x = x + vp["patch_embedding"]["b"].astype(dtype)
    x = x + vp["position_embedding"].astype(dtype)

    s, d, nh = v.num_patches, v.hidden_size, v.num_heads
    hd = v.head_dim

    def body(h, lp):
        y = _layer_norm(h, lp["ln1"], v.layer_norm_eps)
        a = lp["attn"]
        q = _dense(y, a["wq"], a["bq"], prec)
        k = _dense(y, a["wk"], a["bk"], prec)
        vv = _dense(y, a["wv"], a["bv"], prec)
        q = q.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        vv = vv.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        o = mha(q, k, vv, causal=False, impl=attn_impl, precision=prec)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        h = h + _dense(o, lp["attn"]["wo"], lp["attn"]["bo"], prec)
        y = _layer_norm(h, lp["ln2"], v.layer_norm_eps)
        y = _gelu(_dense(y, lp["mlp"]["w1"], lp["mlp"]["b1"], prec))
        h = h + _dense(y, lp["mlp"]["w2"], lp["mlp"]["b2"], prec)
        return h, None

    x, _ = jax.lax.scan(body, x, vp["layers"])
    x = _layer_norm(x, vp["post_ln"], v.layer_norm_eps)

    pj = params["projector"]
    x = _gelu(_dense(x, pj["w1"], pj["b1"], prec))
    x = _dense(x, pj["w2"], pj["b2"], prec)
    return x


# ---------------------------------------------------------------------------
# Phi-style decoder with KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    # S_max LAST: the TPU pads the minor-most (lane) dimension to 128,
    # so a (..., S, Dh=64) layout would physically allocate (and stream,
    # every decode step) 2x the cache bytes. With S minor-most the lane
    # dim is the 128-bucketed sequence and Dh=64 sits in sublanes.
    #
    # int8 mode (IMATCH_MD_CACHE=int8): k/v are int8 with per-(B, H,
    # slot) symmetric scales in ks/vs — decode streams the whole cache
    # every step, so storage bytes are cache-attention time; the scales
    # fold into the attention logits/probs (see _attend_cached).
    k: jax.Array  # (L, B, H, Dh, S_max)
    v: jax.Array  # (L, B, H, Dh, S_max)
    ks: Optional[jax.Array] = None  # (L, B, H, S_max) fp32, int8 mode
    vs: Optional[jax.Array] = None


def init_cache(
    cfg: MoondreamConfig,
    batch: int,
    dtype=jnp.float32,
    cache_len: int = 0,
) -> KVCache:
    """cache_len 0 -> full max_seq. Decode attends the whole cache every
    step, so sizing it to a bucket just above prompt+max_new (instead of
    max_seq) cuts per-token HBM reads proportionally."""
    t = cfg.text
    n = cache_len or t.max_seq
    shape = (t.num_layers, batch, t.num_heads, t.head_dim, n)
    if dtype == jnp.int8:
        return KVCache(
            jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape, jnp.int8),
            jnp.ones(shape[:3] + (n,), jnp.float32),
            jnp.ones(shape[:3] + (n,), jnp.float32),
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _quant_kv_cols(x, axis):
    """Per-column symmetric int8: reduce |max| over ``axis`` (Dh) ->
    (q int8 like x, scale fp32 like x minus that axis)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / jnp.expand_dims(scale, axis)),
        -127,
        127,
    ).astype(jnp.int8)
    return q, scale


def _rotary(x, positions, rotary_dim):
    """Phi-style partial rotary: first ``rotary_dim`` dims of each head.

    x: (B, H, S, Dh); positions: (S,) or (B, S) absolute indices.
    """
    b, h, s, hd = x.shape
    rd = rotary_dim
    xr, xp = x[..., :rd], x[..., rd:]
    half = rd // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if positions.ndim == 1:
        ang = positions.astype(jnp.float32)[:, None] * freqs[None, :]  # (S, half)
        ang = ang[None, None]  # (1, 1, S, half)
    else:
        ang = positions.astype(jnp.float32)[:, None, :, None] * freqs
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = xr[..., :half], xr[..., half:]
    rot = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)
    return jnp.concatenate([rot, xp], axis=-1)


def _attend_cached(q, ck, cv, *, valid_len, prec, k_scale=None, v_scale=None):
    """q (B,H,Sq,Dh) against a cache (B,H,Dh,Smax) masked to valid_len.

    valid_len: (B, Sq) number of cache slots visible to each q position
    (its own slot included — causal by construction).
    k_scale/v_scale (B, H, Smax): per-slot dequant scales for an int8
    cache — folded into the logits / the probs, so the int8 bytes are
    all that streams from HBM.
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhdk->bhqk",
        q,
        ck.astype(q.dtype),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    if k_scale is not None:
        logits = logits * k_scale[:, :, None, :]
    logits = logits * scale
    kpos = jnp.arange(ck.shape[3])
    mask = kpos[None, None, None, :] < valid_len[:, None, :, None]
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, :]
    return jnp.einsum(
        "bhqk,bhdk->bhqd",
        probs.astype(q.dtype),
        cv.astype(q.dtype),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(q.dtype)


def decoder_forward(
    params: Params,
    embeds: jax.Array,
    cache: Optional[KVCache],
    start_pos: jax.Array,
    cfg: MoondreamConfig,
    *,
    dtype=jnp.float32,
    collect_kv: bool = False,
    act_quant: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run Sq tokens through the decoder, reading+writing the KV cache.

    embeds: (B, Sq, D) input embeddings for positions
      start_pos .. start_pos+Sq (per batch row, same start).
    start_pos: (B,) int32 — current cache fill per row.
    Returns (hidden (B, Sq, D), updated cache). Serves both prefill
    (Sq = prompt length) and decode (Sq = 1) — one compiled body.

    cache=None: CACHE-FREE prefill — attention runs causally over the
    in-flight K/V of this call (start_pos must be all zeros) and no
    cache buffers exist at all. The VQA fast path consumes only the
    prefill logits, and the (L, B, H, Dh, S) cache it would otherwise
    allocate is pure waste — ~140 MB/row at moondream2 geometry, the
    HBM ceiling on the filter-backfill batch size.

    act_quant=True (W8A8, IMATCH_MD_ACT=int8): the projection matmuls
    run int8 x int8 -> int32 on the MXU — dynamic per-token activation
    scales, the stored int8 weights from quantize_int8 used AS int8
    instead of dequantized to bf16. Only worth it where the decoder is
    compute-bound (prefill: Sq = prompt length); decode at Sq=1 is
    weight-streaming-bound, where weight-only int8 already wins.
    Requires quantize_int8 weights — non-dict weights fall back to
    _dense per matmul.
    """
    t = cfg.text
    b, sq, d = embeds.shape
    nh, hd = t.num_heads, t.head_dim
    prec = _prec(dtype)
    x = embeds.astype(dtype)
    # Absolute positions of the new tokens: (B, Sq).
    pos = start_pos[:, None] + jnp.arange(sq)[None, :]
    # Cache slots visible to each new token: previous fill + causal self.
    valid = start_pos[:, None] + jnp.arange(1, sq + 1)[None, :]
    lslice = None if cache is None else (1,) + cache.k.shape[1:]

    # The FULL cache rides the scan carry and each layer writes only its
    # new (L=1, B, H, Dh, Sq) column via dynamic_update_slice. The
    # earlier design threaded per-layer caches as scan xs/ys, which
    # re-stacks (allocates + copies) the entire cache every call — at
    # moondream2 B=8 that is ~3 GB of pure copy traffic per decode step,
    # dwarfing the 2.6 GB of weight streaming the step actually needs.
    # Carry + in-place-update is the aliasing-friendly form for XLA.
    def _mm(y, w, b, yq=None):
        """One projection: W8A8 when act_quant and the weight is an
        int8 dict, else the shipped _dense. ``yq`` carries a shared
        (xi, scale) so ONE activation quantization feeds the packed
        QKV+MLP (or the four unpacked) dots."""
        if act_quant and isinstance(w, dict):
            xi, asc = _quant_rows(y) if yq is None else yq
            return _dense_w8a8(xi, asc, w, b, x.dtype)
        return _dense(y, w, b, prec)

    def body(carry, xs):
        h, k_all, v_all, ks_all, vs_all = carry
        li, lp = xs
        y = _layer_norm(h, lp["ln"], t.layer_norm_eps)
        # Fused LN->quant entry point: the quantizer reads the fp32 LN
        # values (one fewer bf16 rounding than quantizing y above).
        # When every projection is int8 (the IMATCH_MD_ACT=int8 path) y
        # itself is dead and XLA DCEs the unfused LayerNorm away.
        yq = _ln_quant(h, lp["ln"], t.layer_norm_eps) if act_quant else None
        if "qkv_mlp" in lp:
            # Packed fast path (pack_text_layers): the Phi parallel block
            # feeds attention AND the MLP from the same LN output, so
            # Q, K, V and the MLP-in projection fuse into ONE matmul —
            # decode at B=1 is dispatch-bound (many small kernels per
            # step), and this cuts the projection kernels 4 -> 1.
            z = _mm(y, lp["qkv_mlp"]["w"], lp["qkv_mlp"]["b"], yq)
            q, k, v, m1 = (
                z[..., :d],
                z[..., d : 2 * d],
                z[..., 2 * d : 3 * d],
                z[..., 3 * d :],
            )
        else:
            a = lp["attn"]
            q = _mm(y, a["wq"], a["bq"], yq)
            k = _mm(y, a["wk"], a["bk"], yq)
            v = _mm(y, a["wv"], a["bv"], yq)
            m1 = _mm(y, lp["mlp"]["w1"], lp["mlp"]["b1"], yq)
        q = q.reshape(b, sq, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, sq, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, sq, nh, hd).transpose(0, 2, 1, 3)
        q = _rotary(q, pos, t.rotary_dim)
        k = _rotary(k, pos, t.rotary_dim)
        sk = sv = None
        if k_all is None:
            # cache-free: attend over this call's K/V directly, in the
            # cache layout (B, H, Dh, Sq) so the masked-softmax math is
            # byte-identical to the cached path (valid == causal here
            # because start_pos == 0)
            ck = k.astype(dtype).transpose(0, 1, 3, 2)
            cv = v.astype(dtype).transpose(0, 1, 3, 2)
            kv_out = (ck, cv) if collect_kv else None
        else:
            kv_out = None
            # Scatter new K/V into layer li's slots at start_pos (same
            # for all rows in a call: rows are aligned by construction).
            # Cache layout is (L, B, H, Dh, S) — see KVCache — so the
            # update writes along the lane axis.
            at = (li, 0, 0, 0, start_pos[0])
            if k_all.dtype == jnp.int8:
                kq, k_s = _quant_kv_cols(k, axis=-1)  # (B,H,Sq,Dh)->,(B,H,Sq)
                vq, v_s = _quant_kv_cols(v, axis=-1)
                kc = kq.transpose(0, 1, 3, 2)[None]
                vc = vq.transpose(0, 1, 3, 2)[None]
                at_s = (li, 0, 0, start_pos[0])
                ks_all = jax.lax.dynamic_update_slice(ks_all, k_s[None], at_s)
                vs_all = jax.lax.dynamic_update_slice(vs_all, v_s[None], at_s)
                sslice = (1,) + ks_all.shape[1:]
                sk = jax.lax.dynamic_slice(
                    ks_all, (li, 0, 0, 0), sslice
                )[0]
                sv = jax.lax.dynamic_slice(
                    vs_all, (li, 0, 0, 0), sslice
                )[0]
            else:
                kc = k.astype(k_all.dtype).transpose(0, 1, 3, 2)[None]
                vc = v.astype(v_all.dtype).transpose(0, 1, 3, 2)[None]
            k_all = jax.lax.dynamic_update_slice(k_all, kc, at)
            v_all = jax.lax.dynamic_update_slice(v_all, vc, at)
            ck = jax.lax.dynamic_slice(k_all, (li, 0, 0, 0, 0), lslice)[0]
            cv = jax.lax.dynamic_slice(v_all, (li, 0, 0, 0, 0), lslice)[0]
        o = _attend_cached(
            q, ck, cv, valid_len=valid, prec=prec, k_scale=sk, v_scale=sv
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, sq, d)
        attn_out = _mm(o, lp["attn"]["wo"], lp["attn"]["bo"])
        mlp_out = _mm(_gelu(m1), lp["mlp"]["w2"], lp["mlp"]["b2"])
        h = h + attn_out + mlp_out  # phi parallel residual
        return (h, k_all, v_all, ks_all, vs_all), kv_out

    carry0 = (
        x,
        None if cache is None else cache.k,
        None if cache is None else cache.v,
        None if cache is None else cache.ks,
        None if cache is None else cache.vs,
    )
    (x, new_k, new_v, new_ks, new_vs), kv_stack = jax.lax.scan(
        body, carry0, (jnp.arange(t.num_layers), params["text"]["layers"])
    )
    if cache is None:
        # kv_stack (when collect_kv): ((L,B,H,Dh,Sq), (L,B,H,Dh,Sq)) —
        # the prefill's K/V in cache layout, for generate.prefill
        return x, kv_stack
    return x, KVCache(new_k, new_v, new_ks, new_vs)


def pack_text_layers(params: Params) -> Params:
    """Return a params tree whose decoder layers carry one packed
    [wq | wk | wv | w1] projection for decoder_forward's fused fast
    path (the separate arrays are dropped from the copy, so HBM holds
    one set of weights). The unpacked layout stays the canonical one —
    checkpoints load into it and the TP sharding specs
    (parallel/sharding.py) column-split the individual projections."""
    tl = params["text"]["layers"]
    a, m = tl["attn"], tl["mlp"]
    packed = {
        "w": jnp.concatenate([a["wq"], a["wk"], a["wv"], m["w1"]], axis=-1),
        "b": jnp.concatenate([a["bq"], a["bk"], a["bv"], m["b1"]], axis=-1),
    }
    out = dict(params)
    out["text"] = dict(params["text"])
    out["text"]["layers"] = {
        "ln": tl["ln"],
        "qkv_mlp": packed,
        "attn": {"wo": a["wo"], "bo": a["bo"]},
        "mlp": {"w2": m["w2"], "b2": m["b2"]},
    }
    return out


def quantize_int8(params: Params) -> Params:
    """Weight-only int8 quantization of the text decoder's projection
    matrices and the lm_head (per-output-channel symmetric scales).

    Decode streams every decoder weight each step, so storage bytes ARE
    the step time; int8 halves them vs bf16. Activations, embeddings,
    layernorms and biases stay in the working dtype — this is storage
    quantization, the matmul still accumulates in fp32 on the MXU.
    Works on packed (pack_text_layers) or unpacked trees; stacked
    (L, in, out) layer weights get per-(layer, out) scales. Opt-in via
    IMATCH_MD_QUANT=int8 (runtime.py) — bf16 stays the default until a
    real-weights caption-quality check blesses int8.
    """

    qmat = quantize_weight_int8

    tl = dict(params["text"]["layers"])
    if "qkv_mlp" in tl:
        tl["qkv_mlp"] = {"w": qmat(tl["qkv_mlp"]["w"]), "b": tl["qkv_mlp"]["b"]}
        tl["attn"] = {"wo": qmat(tl["attn"]["wo"]), "bo": tl["attn"]["bo"]}
        tl["mlp"] = {"w2": qmat(tl["mlp"]["w2"]), "b2": tl["mlp"]["b2"]}
    else:
        a, m = tl["attn"], tl["mlp"]
        tl["attn"] = {
            "wq": qmat(a["wq"]), "bq": a["bq"],
            "wk": qmat(a["wk"]), "bk": a["bk"],
            "wv": qmat(a["wv"]), "bv": a["bv"],
            "wo": qmat(a["wo"]), "bo": a["bo"],
        }
        tl["mlp"] = {
            "w1": qmat(m["w1"]), "b1": m["b1"],
            "w2": qmat(m["w2"]), "b2": m["b2"],
        }
    out = dict(params)
    out["text"] = dict(params["text"])
    out["text"]["layers"] = tl
    out["text"]["lm_head"] = {
        "w": qmat(params["text"]["lm_head"]["w"]),
        "b": params["text"]["lm_head"]["b"],
    }
    return out


def lm_logits(params: Params, hidden: jax.Array, cfg: MoondreamConfig):
    """(B, Sq, D) -> (B, Sq, V) fp32 logits.

    bf16 hidden keeps the matmul on the bf16 MXU path (fp32 accumulate);
    the fp32 path stays HIGHEST for numerical tests.
    """
    tp = params["text"]
    h = _layer_norm(hidden, tp["final_ln"], cfg.text.layer_norm_eps)
    if isinstance(tp["lm_head"]["w"], dict):
        w = tp["lm_head"]["w"]
        y = jnp.einsum(
            "bsd,dv->bsv",
            h,
            w["q"].astype(h.dtype),
            precision=_prec(h.dtype),
            preferred_element_type=jnp.float32,
        )
        return y * w["s"] + tp["lm_head"]["b"].astype(jnp.float32)
    if h.dtype == jnp.float32:
        return jnp.einsum(
            "bsd,dv->bsv",
            h,
            tp["lm_head"]["w"].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) + tp["lm_head"]["b"].astype(jnp.float32)
    return jnp.einsum(
        "bsd,dv->bsv",
        h,
        tp["lm_head"]["w"].astype(h.dtype),
        preferred_element_type=jnp.float32,
    ) + tp["lm_head"]["b"].astype(jnp.float32)


def embed_tokens(params: Params, token_ids: jax.Array, dtype=jnp.float32):
    return params["text"]["token_embedding"][token_ids].astype(dtype)
