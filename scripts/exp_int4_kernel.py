"""Experiment: Pallas in-kernel int4 unpack for a 4-bit capacity tier.

The round-5 exact-search ledger (DESIGN.md) closed every XLA-level route
below the int8 scoring tier: native jnp.int4 corpora cannot cross jit
boundaries on this stack (device_put RecursionError) and an XLA-level
nibble unpack materializes the interleave (12.3 ms at 1M x 512 — 5x
slower than bf16). The one route left open was unpacking INSIDE a
Pallas kernel, where the nibble shifts run on the VPU between the DMA
and the MXU dot and nothing materializes in HBM. This script measures
that kernel.

Layout (the trick that avoids an interleave): nibble-pack along the
FEATURE axis in halves, not pairs — byte b of a row stores feature b in
its low nibble and feature b+256 in its high nibble. The in-kernel
unpack is then `concat([lo, hi], axis=lanes)` (two tile copies), NOT an
element interleave, and the query just uses its natural feature order.

Per grid step: DMA a (tile_n, 256) int8 packed tile + an (8, tile_n)
bf16 sidecar (row 0 = per-row dequant scale, row 1 = validity) into
VMEM; sign-extend nibbles in int32; bf16 dot on the MXU; scale +
mask + tile-max on the VPU; lane-masked store into the (QP, GROUP)
tile-max output (same output scheme as ops/pallas/topk.py).

Floors at 1M x 512: packed bytes 0.27 GB -> 0.33 ms; int8 tier 0.66 ms;
bf16 1.31 ms. Selection fidelity: 4-bit quantized tile maxima are
coarse, so the experiment also measures top-k recall of
tile-select + exact rescore vs the fp32 oracle on random (adversarial)
and clustered (realistic) corpora across candidate-tile margins.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38
GROUP = 128
N = 1 << 20
D = 512
HALF = D // 2
QP = 8


class StreamDict(dict):
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        print(f"[exp] {k} = {v}", file=sys.stderr, flush=True)


@jax.jit
def pack_int4(corpus, valid):
    """(N, D) fp32 -> packed (N, D/2) int8, sidecar (8, N) bf16
    (row 0 scale, row 1 validity), plus the int4-valued reference rows
    (for correctness checks)."""
    amax = jnp.max(jnp.abs(corpus), axis=1)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(corpus / scale[:, None]), -7, 7).astype(jnp.int8)
    lo, hi = q[:, :HALF], q[:, HALF:]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, 15), jnp.left_shift(hi, 4)
    ).astype(jnp.int8)
    side = jnp.zeros((8, corpus.shape[0]), jnp.bfloat16)
    side = side.at[0].set(scale.astype(jnp.bfloat16))
    side = side.at[1].set(valid.astype(jnp.bfloat16))
    return packed, side, q, scale


def _int4_tile_max_kernel(q_ref, p_ref, side_ref, max_ref):
    i = pl.program_id(0)
    col = jax.lax.rem(i, GROUP)

    @pl.when(col == 0)
    def _():
        max_ref[:] = jnp.full_like(max_ref, NEG_INF)

    p32 = p_ref[:].astype(jnp.int32)  # (tile_n, HALF), sign-extended bytes
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p32, 28), 28
    )  # low nibble, signed
    hi = jax.lax.shift_right_arithmetic(p32, 4)  # high nibble, signed
    u = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)  # (t, D)
    s = jax.lax.dot_general(
        q_ref[:],
        u,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QP, tile_n)
    scale = side_ref[0:1, :].astype(jnp.float32)  # (1, tile_n)
    ok = side_ref[1:2, :].astype(jnp.float32)
    s = jnp.where(ok > 0, s * scale, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    lanes = jax.lax.broadcasted_iota(jnp.int32, max_ref.shape, 1)
    max_ref[:] = jnp.where(lanes == col, m, max_ref[:])


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def int4_tile_max(qbf, packed, side, *, tile_n, interpret=False):
    n = packed.shape[0]
    n_tiles = n // tile_n
    nt_pad = -(-n_tiles // GROUP) * GROUP
    return pl.pallas_call(
        _int4_tile_max_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((QP, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, HALF), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (QP, GROUP), lambda i: (0, i // GROUP), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((QP, nt_pad), jnp.float32),
        interpret=interpret,
    )(qbf, packed, side)[:, :n_tiles]


def timed(fn, args, iters):
    r = jax.block_until_ready(fn(*args))
    np.asarray(r.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r.ravel()[0])
    return time.perf_counter() - t0


def recall_experiment(out, kind, corpus, queries, tile_n=512, k=10):
    """tile-select via int4 maxima + exact fp32 rescore of the selected
    tiles, vs the fp32 oracle. The margin sweep shows how many extra
    candidate tiles 4-bit selection needs."""
    n = corpus.shape[0]
    n_tiles = n // tile_n
    valid = jnp.ones((n,), bool)
    packed, side, _, _ = jax.block_until_ready(pack_int4(corpus, valid))
    qbf = queries.astype(jnp.bfloat16)
    tm = np.asarray(int4_tile_max(qbf, packed, side, tile_n=tile_n))
    c_np = np.asarray(corpus, np.float32)
    q_np = np.asarray(queries, np.float32)
    s_exact = q_np @ c_np.T
    oracle = np.argsort(-s_exact, axis=1)[:, :k]
    for margin in (4, 16, 32, 64):
        kt = min(k + margin, n_tiles)
        hits = 0
        for qi in range(q_np.shape[0]):
            tiles = np.argsort(-tm[qi])[:kt]
            rows = (tiles[:, None] * tile_n + np.arange(tile_n)).ravel()
            es = c_np[rows] @ q_np[qi]
            top = rows[np.argsort(-es)[:k]]
            hits += len(set(top) & set(oracle[qi]))
        out[f"recall@{k}_{kind}_m{margin}"] = round(
            hits / (q_np.shape[0] * k), 4
        )


def main():
    iters = int(os.environ.get("ITERS", "30"))
    out = StreamDict({"n": N, "d": D, "iters": iters})
    on_tpu = jax.default_backend() == "tpu"
    key = jax.random.key(0)

    # correctness first, small N, vs a plain XLA unpack of the same pack
    nc = 4096
    kc, kq = jax.random.split(key)
    cs = jax.random.normal(kc, (nc, D), jnp.float32)
    cs = cs / jnp.linalg.norm(cs, axis=1, keepdims=True)
    vs = jnp.arange(nc) % 97 != 0  # some tombstones
    packed, side, qref, scale = jax.block_until_ready(pack_int4(cs, vs))
    q = jax.random.normal(kq, (QP, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qbf = q.astype(jnp.bfloat16)
    got = np.asarray(
        int4_tile_max(qbf, packed, side, tile_n=512, interpret=not on_tpu)
    )
    s_ref = jnp.einsum(
        "qd,nd->qn",
        qbf,
        qref.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    s_ref = jnp.where(
        vs[None, :], s_ref * scale[None, :].astype(jnp.bfloat16).astype(jnp.float32), NEG_INF
    )
    want = np.asarray(jnp.max(s_ref.reshape(QP, nc // 512, 512), axis=2))
    out["kernel_matches_xla_ref"] = bool(np.allclose(got, want, rtol=2e-2, atol=1e-3))
    out["kernel_max_abs_diff"] = float(np.max(np.abs(got - want)))

    if not on_tpu:
        print(json.dumps(out))
        return

    # speed at 1M x 512
    c = jax.random.normal(key, (N, D), jnp.float32)
    c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
    valid = jnp.ones((N,), bool)
    packed, side, _, _ = jax.block_until_ready(pack_int4(c, valid))
    for tile_n in (512, 1024, 2048):
        f = functools.partial(int4_tile_max, tile_n=tile_n)
        dt = timed(f, (qbf, packed, side), iters)
        out[f"int4_kernel_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
    out["hbm_floor_packed_ms"] = round(
        (N * HALF + 8 * N * 2) / 819e9 * 1e3, 2
    )
    out["packed_mb"] = round((N * HALF + 8 * N * 2) / 1e6, 1)

    # selection fidelity: random corpus (adversarial — near-uniform
    # scores) and clustered corpus (realistic embedding geometry)
    nr = 1 << 17  # 128k keeps the numpy oracle affordable
    kq2, kc2, kn = jax.random.split(jax.random.key(1), 3)
    cr = jax.random.normal(kc2, (nr, D), jnp.float32)
    cr = cr / jnp.linalg.norm(cr, axis=1, keepdims=True)
    qr = jax.random.normal(kq2, (QP, D), jnp.float32)
    qr = qr / jnp.linalg.norm(qr, axis=1, keepdims=True)
    recall_experiment(out, "random", cr, qr)
    # clustered: rows around 256 centers, queries = perturbed rows
    cents = jax.random.normal(kn, (256, D), jnp.float32)
    assign = jax.random.randint(kc2, (nr,), 0, 256)
    cc = cents[assign] + 0.35 * jax.random.normal(kq2, (nr, D), jnp.float32)
    cc = cc / jnp.linalg.norm(cc, axis=1, keepdims=True)
    qc = cc[:QP] + 0.05 * jax.random.normal(kn, (QP, D), jnp.float32)
    qc = qc / jnp.linalg.norm(qc, axis=1, keepdims=True)
    recall_experiment(out, "clustered", cc, qc)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
