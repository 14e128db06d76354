"""PartitionSpecs for the CLIP param pytree (Megatron-style TP).

The param layout is models/clip/model.py's stacked-layer dict: every
per-layer tensor carries a leading ``num_layers`` axis (scanned), so the
specs below prepend ``None`` for that axis.

TP rule (the standard column/row split so each attention/MLP block needs
exactly one reduce at its output, which XLA SPMD emits automatically):
- qkv projections: split the OUTPUT dim (heads land whole on a shard);
- attn output proj: split the INPUT dim;
- mlp w1: split OUTPUT; mlp w2: split INPUT;
- biases follow their matmul's output split; layernorms/embeddings/
  projections replicated (small).
"""

from __future__ import annotations

from typing import Any, Dict

from jax.sharding import PartitionSpec as P

from imatch_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL


def replicated() -> P:
    return P()


def data_spec(ndim: int) -> P:
    """Batch-sharded leading axis, replicated rest."""
    return P(AXIS_DATA, *(None,) * (ndim - 1))


def _encoder_layer_specs(model_axis) -> Dict[str, Any]:
    col = P(None, None, model_axis)  # (L, d, f) split f
    row = P(None, model_axis, None)  # (L, f, d) split f
    bias_col = P(None, model_axis)  # (L, f) split f
    rep2 = P(None, None)
    return {
        "ln1": {"scale": rep2, "bias": rep2},
        "attn": {
            "wq": col,
            "wk": col,
            "wv": col,
            "wo": row,
            "bq": bias_col,
            "bk": bias_col,
            "bv": bias_col,
            "bo": rep2,
        },
        "ln2": {"scale": rep2, "bias": rep2},
        "mlp": {"w1": col, "b1": bias_col, "w2": row, "b2": rep2},
    }


def md_param_specs(model_axis: str = AXIS_MODEL) -> Dict[str, Any]:
    """Specs for the Moondream pytree (models/moondream/model.py).

    Same Megatron column/row TP rule as CLIP; the vision blocks have
    separate ln1/ln2 while the Phi decoder has one parallel-block ln.
    The lm_head column-splits the vocab; its bias follows, and XLA
    all-gathers the (B, V) logits at the boundary.
    """
    rep1, rep2 = P(None), P(None, None)
    attn = {
        "wq": P(None, None, model_axis),
        "wk": P(None, None, model_axis),
        "wv": P(None, None, model_axis),
        "bq": P(None, model_axis),
        "bk": P(None, model_axis),
        "bv": P(None, model_axis),
        "wo": P(None, model_axis, None),
        "bo": rep2,
    }
    mlp = {
        "w1": P(None, None, model_axis),
        "b1": P(None, model_axis),
        "w2": P(None, model_axis, None),
        "b2": rep2,
    }
    return {
        "vision": {
            "patch_embedding": {"w": P(None, None, None, None), "b": rep1},
            "position_embedding": rep2,
            "layers": {
                "ln1": {"scale": rep2, "bias": rep2},
                "attn": dict(attn),
                "ln2": {"scale": rep2, "bias": rep2},
                "mlp": dict(mlp),
            },
            "post_ln": {"scale": rep1, "bias": rep1},
        },
        "projector": {
            "w1": P(None, model_axis),
            "b1": P(model_axis),
            "w2": P(model_axis, None),
            "b2": rep1,
        },
        "text": {
            "token_embedding": rep2,
            "layers": {
                "ln": {"scale": rep2, "bias": rep2},
                "attn": dict(attn),
                "mlp": dict(mlp),
            },
            "final_ln": {"scale": rep1, "bias": rep1},
            "lm_head": {"w": P(None, model_axis), "b": P(model_axis)},
        },
    }


def clip_param_specs(model_axis: str = AXIS_MODEL) -> Dict[str, Any]:
    """Specs matching ``init_params``' pytree structure exactly."""
    rep1, rep2 = P(None), P(None, None)
    return {
        "vision": {
            "patch_embedding": P(None, None, None, None),
            "class_embedding": rep1,
            "position_embedding": rep2,
            "pre_ln": {"scale": rep1, "bias": rep1},
            "layers": _encoder_layer_specs(model_axis),
            "post_ln": {"scale": rep1, "bias": rep1},
            "projection": rep2,
        },
        "text": {
            "token_embedding": rep2,
            "position_embedding": rep2,
            "layers": _encoder_layer_specs(model_axis),
            "final_ln": {"scale": rep1, "bias": rep1},
            "projection": rep2,
        },
        "logit_scale": P(),
    }
