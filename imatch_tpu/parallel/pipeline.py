"""GPipe-style pipeline parallelism for stacked-layer transformers.

Every tower in this framework stores per-layer params stacked on a
leading axis and runs them with ``lax.scan`` (models/clip/model.py,
models/moondream/model.py). ``gpipe_scan`` is the pipeline-parallel
equivalent of that scan: layers are split into contiguous stages over a
mesh axis, the batch is split into microbatches, and activations flow
stage-to-stage with ``ppermute`` on the classic GPipe schedule
(M + P - 1 ticks, bubble fraction (P-1)/(M+P-1)). The reference has no
model parallelism of any kind (SURVEY.md §2.3); this is the PP leg of
the framework's scale-out story, used when a tower's weights outgrow
one chip's HBM and TP alone is not enough.

Semantics: ``gpipe_scan(body, x, stacked) == lax.scan(body, x, stacked)[0]``
(verified in tests/test_parallel.py), where ``body(h, layer) -> (h, None)``.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P


def _stage_body(
    x,
    stacked_local,
    *,
    body: Callable,
    axis: str,
    microbatches: int,
):
    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b = x.shape[0]
    mb = b // microbatches
    x_mb = x.reshape(microbatches, mb, *x.shape[1:])

    def run_stage(act):
        out, _ = jax.lax.scan(lambda h, lp: body(h, lp), act, stacked_local)
        return out

    perm = [(i, (i + 1) % p) for i in range(p)]
    zeros_like_mb = jnp.zeros_like(x_mb[0])

    def tick(t, carry):
        act, out = carry
        # stage 0 ingests microbatch t (while t < M); later stages use the
        # activation ppermuted in from the previous stage last tick.
        inject = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.minimum(t, microbatches - 1), keepdims=False
        )
        inject = jnp.where(t < microbatches, inject, zeros_like_mb)
        act = jnp.where(me == 0, inject, act)
        act = run_stage(act)
        # the last stage emits finished microbatch t - (P - 1)
        oidx = jnp.clip(t - (p - 1), 0, microbatches - 1)
        emit = jnp.logical_and(me == p - 1, t >= p - 1)
        cur = jax.lax.dynamic_index_in_dim(out, oidx, keepdims=False)
        upd = jnp.where(emit, act, cur)
        out = jax.lax.dynamic_update_index_in_dim(out, upd, oidx, 0)
        act = jax.lax.ppermute(act, axis, perm)
        return act, out

    out0 = jnp.zeros_like(x_mb)
    act0 = jnp.zeros_like(x_mb[0])
    _, out = jax.lax.fori_loop(
        0, microbatches + p - 1, tick, (act0, out0)
    )
    # only the last stage holds real outputs; share them with everyone
    out = jnp.where(me == p - 1, out, jnp.zeros_like(out))
    out = jax.lax.psum(out, axis)
    return out.reshape(b, *x.shape[1:])


def gpipe_scan(
    body: Callable,
    x: jax.Array,
    stacked_params,
    *,
    mesh: Mesh,
    axis: str = "model",
    microbatches: int = 4,
) -> jax.Array:
    """Pipeline-parallel ``lax.scan`` over stacked layer params.

    body: (h, layer_params) -> (h, _). x: (B, ...) with B divisible by
    ``microbatches``; the leading (num_layers) axis of every param leaf
    must be divisible by the stage count mesh.shape[axis].
    """
    p = mesh.shape[axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % p:
        raise ValueError(f"{n_layers} layers not divisible by {p} stages")
    if x.shape[0] % microbatches:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by microbatches={microbatches}"
        )
    param_specs = jax.tree.map(
        lambda l: P(axis, *(None,) * (l.ndim - 1)), stacked_params
    )
    fn = jax.shard_map(
        functools.partial(
            _stage_body, body=body, axis=axis, microbatches=microbatches
        ),
        mesh=mesh,
        in_specs=(P(), param_specs),
        out_specs=P(),
        check_vma=False,
    )
    return fn(x, stacked_params)
