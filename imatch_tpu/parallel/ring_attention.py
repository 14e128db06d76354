"""Ring attention — sequence parallelism over the device mesh.

The reference's long-context story is model-level only (LongCLIP's 248
positions, SURVEY.md §2.3/§5); its towers never need SP. This module is
the scaling path for when a longer-context tower is swapped in: shard
the sequence over a mesh axis, keep Q local, and rotate K/V shards
around the ring with ``ppermute`` while accumulating online softmax —
HBM never sees an (S, S) score matrix and each device's peak memory is
O(S/P). Communication is the classic ring schedule: P-1 hops of the
local K/V block over ICI, fully overlapped by XLA with the per-hop
matmuls.

Numerics match ops/attention.mha (fp32 stats; verified in
tests/test_parallel.py against the single-device reference).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30


def _local_ring(q, k, v, *, axis: str, causal: bool):
    """shard_map body: q/k/v (B, H, S_loc, Dh) local shards."""
    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b, h, s_loc, d = q.shape
    scale = d**-0.5
    qf = q.astype(jnp.float32) * scale

    q_pos = me * s_loc + jnp.arange(s_loc)  # global positions of local Q

    perm = [(i, (i + 1) % p) for i in range(p)]

    def hop(i, carry):
        m, l, acc, kk, vv = carry
        src = (me - i) % p  # which shard's K/V we currently hold
        s = jnp.einsum(
            "bhqd,bhkd->bhqk",
            qf,
            kk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if causal:
            k_pos = src * s_loc + jnp.arange(s_loc)
            mask = k_pos[None, :] <= q_pos[:, None]  # (S_loc, S_loc)
            s = jnp.where(mask[None, None], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        ex = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(ex, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd",
            ex,
            vv.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        # rotate K/V to the next device (skipped after the last hop's use
        # would be wasted, but a uniform loop keeps one compiled body)
        kk = jax.lax.ppermute(kk, axis, perm)
        vv = jax.lax.ppermute(vv, axis, perm)
        return m_new, l_new, acc_new, kk, vv

    m0 = jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, s_loc, d), jnp.float32)
    m, l, acc, _, _ = jax.lax.fori_loop(0, p, hop, (m0, l0, acc0, k, v))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "data",
    causal: bool = False,
) -> jax.Array:
    """(B, H, S, Dh) attention with S sharded over ``mesh[axis]``.

    S must divide evenly by the axis size. Inputs may be unsharded
    host-side arrays; shard_map partitions them.
    """
    s = q.shape[2]
    p = mesh.shape[axis]
    if s % p:
        raise ValueError(f"seq len {s} not divisible by ring size {p}")
    if k.shape[2] != s or v.shape[2] != s:
        # self-attention ring: a mismatched k/v length otherwise fails
        # deep inside the jitted fori_loop with an opaque broadcast
        # error naming internal intermediates
        raise ValueError(
            f"q/k/v seq lens must match: {s}/{k.shape[2]}/{v.shape[2]}"
        )
    fn = jax.shard_map(
        functools.partial(_local_ring, axis=axis, causal=causal),
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
        ),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return fn(q, k, v)
