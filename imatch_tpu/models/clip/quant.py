"""W8A8 int8 CLIP vision tower — the opt-in embed throughput tier.

The v5e MXU rates int8 matmuls at 2x bf16 (394 vs 197 T*OPS) with
int32 accumulation. The towers are compute-bound at the bf16 roofline
(docs/DESIGN.md "CLIP encode ceiling"), so running the encoder's dense
matmuls int8 x int8 -> int32 buys throughput the bf16 path cannot
reach. Scheme (the standard W8A8 inference recipe):

- weights: per-out-channel symmetric int8, scales precomputed once at
  load (``quantize_vision_tower``);
- activations: dynamic per-token symmetric int8, quantized from the
  fp32 layernorm output each layer — ONE quantization per LN feeds the
  packed QKV dots (q/k/v share the same input);
- attention math, layernorms, residual stream, softmax: bf16/fp32
  exactly as the shipped path (imatch_tpu/models/clip/model.py) — only
  the six dense contractions per layer change;
- output projection and patch-embed conv stay bf16: the conv is
  C_in=3 (no MXU int8 win) and the projection runs once per image.

Replaces nothing by default: ``IMATCH_EMBED_QUANT=int8`` opts in
(pipeline/embedder.py), and like the VLM int8 modes it stays opt-in
until the real-weights gate blesses the fidelity
(tests/test_golden_weights.py, WEIGHTS.md par. 5). The reference has no
quantized path at all — its CLIP forward is fp32 torch
(/root/reference/utils.py:59-102); this tier is a beyond-parity
capability.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from imatch_tpu.models.clip.configs import CLIPConfig
from imatch_tpu.models.clip.model import (
    _act,
    _layer_norm,
    _prec,
    _vision_stem,
)
from imatch_tpu.ops.attention import mha
from imatch_tpu.ops.quant import (
    ln_quant_rows_int8,
    qdot_int8,
    quant_rows_int8,
    quantize_weight_int8 as _quantize_weight,
)

Params = Dict[str, Any]


def quantize_vision_tower(vision: Params) -> Params:
    """Quantize the encoder's dense weights; biases/LN/embeddings are
    referenced from the original params at call time (no copies)."""
    layers = vision["layers"]
    a, m = layers["attn"], layers["mlp"]
    return {
        "attn": {
            "wq": _quantize_weight(a["wq"]),
            "wk": _quantize_weight(a["wk"]),
            "wv": _quantize_weight(a["wv"]),
            "wo": _quantize_weight(a["wo"]),
        },
        "mlp": {
            "w1": _quantize_weight(m["w1"]),
            "w2": _quantize_weight(m["w2"]),
        },
    }


# _quant_rows / _qdot / _ln_quant live in ops/quant.py (shared with
# the Moondream W8A8 prefill so the two towers cannot numerically
# diverge). The LN->quant sites use the fused entry point: fp32
# LayerNorm (no bf16 downcast — one fewer rounding) flowing straight
# into the dynamic quantize, which XLA fuses on its own (the explicit
# Pallas kernel behind IMATCH_QUANT_KERNEL=pallas measured slower —
# see ops/pallas/quantize.py).
_quant_rows = quant_rows_int8
_qdot = qdot_int8
_ln_quant = ln_quant_rows_int8


def _encoder_w8a8(x, layers: Params, qlayers: Params, *, num_heads, eps, act):
    b, s, d = x.shape
    hd = d // num_heads
    prec = _prec(x.dtype)

    # scan xs carry ONLY what the body reads: the fp32 master weights
    # stay out of the loop (no HBM reads of dead operands riding on
    # XLA's DCE).
    a, m = layers["attn"], layers["mlp"]
    layers = {
        "ln1": layers["ln1"],
        "ln2": layers["ln2"],
        "attn": {k: a[k] for k in ("bq", "bk", "bv", "bo")},
        "mlp": {"b1": m["b1"], "b2": m["b2"]},
    }

    def body(h, lp):
        lp, qp = lp
        xi, asc = _ln_quant(h, lp["ln1"], eps)  # one quant feeds q, k, v
        a, qa = lp["attn"], qp["attn"]
        q = _qdot(xi, asc, qa["wq"], a["bq"], h.dtype)
        k = _qdot(xi, asc, qa["wk"], a["bk"], h.dtype)
        v = _qdot(xi, asc, qa["wv"], a["bv"], h.dtype)
        q = q.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        o = mha(q, k, v, causal=False, impl="xla", precision=prec)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        # NOTE: pass o in its native dtype — the quantizer upcasts
        # internally. An .astype(f32) here would materialize a full
        # fp32 copy in HBM in front of the Pallas kernel (converts
        # cannot fuse into a custom call).
        oi, osc = _quant_rows(o)
        h = h + _qdot(oi, osc, qa["wo"], a["bo"], h.dtype)

        xi, asc = _ln_quant(h, lp["ln2"], eps)
        m, qm = lp["mlp"], qp["mlp"]
        y = _act(_qdot(xi, asc, qm["w1"], m["b1"], h.dtype), act)
        yi, ysc = _quant_rows(y)
        h = h + _qdot(yi, ysc, qm["w2"], m["b2"], h.dtype)
        return h, None

    x, _ = jax.lax.scan(body, x, (layers, qlayers))
    return x


def encode_image_w8a8(
    params: Params,
    qvision: Params,
    pixels: jax.Array,
    cfg: CLIPConfig,
    *,
    normalize: bool = True,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Image tower with W8A8 encoder matmuls; stem/pool/projection
    identical to model.encode_image in the caller's compute dtype
    (bf16 on TPU; the embedder passes fp32 on CPU backends so the
    non-matmul stream doesn't silently degrade vs the fp32 default)."""
    vc = cfg.vision
    vp = params["vision"]
    # stem shared with the bf16 tower (models/clip/model.py) — a local
    # copy here once drifted stylistically and would drift numerically
    x = _vision_stem(vp, vc, pixels, dtype)
    x = _encoder_w8a8(
        x,
        vp["layers"],
        qvision,
        num_heads=vc.num_heads,
        eps=vc.layer_norm_eps,
        act=vc.hidden_act,
    )
    pooled = x[:, 0, :]
    pooled = _layer_norm(pooled, vp["post_ln"], vc.layer_norm_eps)
    feats = jnp.einsum(
        "bd,df->bf",
        pooled,
        vp["projection"].astype(pooled.dtype),
        precision=_prec(pooled.dtype),
        preferred_element_type=jnp.float32,
    )
    feats = feats.astype(jnp.float32)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats
