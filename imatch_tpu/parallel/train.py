"""CLIP contrastive training — the framework's fine-tuning path.

The reference is inference-only (frozen HF checkpoint,
/root/reference/utils.py:27-49); a production similarity-search stack
needs domain fine-tuning, so training is a first-class capability here.

TPU-native shape: one jitted train step whose inputs/params carry
NamedShardings (DP on ``data``, Megatron TP on ``model`` per
sharding.py); XLA SPMD inserts every collective. The CLIP InfoNCE loss is
written over the *global* batch — under DP sharding the (B, B) logits
matrix is produced via the partitioner's all-gather of the projected
embeddings (a D-sized vector per sample over ICI, the cheapest possible
exchange), which is exactly the hand-written "gather features, not
logits" recipe from open_clip, derived automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from imatch_tpu.models.clip.configs import CLIPConfig
from imatch_tpu.models.clip.model import clip_forward, init_params
from imatch_tpu.parallel.mesh import AXIS_DATA
from imatch_tpu.parallel.sharding import clip_param_specs

Params = Dict[str, Any]

# CLIP clamps exp(logit_scale) at 100 (openai/CLIP model.py public impl).
MAX_LOGIT_SCALE = 4.6052


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Params
    opt_state: Any


def clip_loss(logits_per_image: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over the global batch (labels = diagonal)."""
    b = logits_per_image.shape[0]
    labels = jnp.arange(b)
    li = optax.softmax_cross_entropy_with_integer_labels(
        logits_per_image, labels
    )
    lt = optax.softmax_cross_entropy_with_integer_labels(
        logits_per_image.T, labels
    )
    return 0.5 * (jnp.mean(li) + jnp.mean(lt))


def make_optimizer(
    lr: float = 1e-5, weight_decay: float = 0.2, grad_clip: float = 1.0
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=0.9, b2=0.98, eps=1e-6, weight_decay=weight_decay),
    )


def init_train_state(
    key,
    cfg: CLIPConfig,
    tx: Optional[optax.GradientTransformation] = None,
    mesh: Optional[Mesh] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = tx or make_optimizer()
    params = init_params(key, cfg)
    if mesh is not None:
        specs = clip_param_specs()
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params,
            specs,
        )
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state), tx


def make_train_step(
    cfg: CLIPConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
    attn_impl: str = "auto",
) -> Callable[[TrainState, jax.Array, jax.Array], Tuple[TrainState, jax.Array]]:
    """Build the jitted (state, pixels, tokens) -> (state, loss) step."""

    def loss_fn(params, pixels, tokens):
        _, _, logits = clip_forward(
            params, pixels, tokens, cfg, dtype=dtype, attn_impl=attn_impl
        )
        return clip_loss(logits)

    def step(state: TrainState, pixels, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, pixels, tokens
        )
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        params["logit_scale"] = jnp.minimum(
            params["logit_scale"], MAX_LOGIT_SCALE
        )
        return (
            TrainState(state.step + 1, params, opt_state),
            loss,
        )

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    batch_sharding = NamedSharding(mesh, P(AXIS_DATA))
    return jax.jit(
        step,
        in_shardings=(None, batch_sharding, batch_sharding),
        donate_argnums=(0,),
    )
