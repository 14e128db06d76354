"""Experiment: why is the Pallas top-k engine 4x slower than tilemax?

Measured (DESIGN.md round-2 table, 1M x 512, Q=1): tilemax bf16 2.48 ms
vs Pallas fused top-k 9.9 ms, while the HBM floor for one streaming
read of the 1 GB scoring matrix is ~1.25 ms. Hypotheses:

  A. The corpus tile enters dot_general as the RHS contracted on dim 1
     ((tile_n, d_pad) . dim 1) — a transposed-B matmul Mosaic must
     relayout per tile -> variant T640 stores the corpus TRANSPOSED
     (d_pad, N) so the dot is canonical (((1,), (0,)), ((), ())).
  B. The +1 penalty feature column pads d 512 -> 640 (bf16 lane quantum
     128), +25% HBM traffic -> the transposed layout pads the penalty
     ROW to the sublane quantum instead (513 -> 528, +3%): variant T528.
  C. tile_n too large/small for the DMA pipeline -> tile sweep.

Method: phase-1 kernel only (the streaming pass is the whole story;
phase 2 rescores a few tiles), corpus generated ON DEVICE (zero tunnel
upload), fetch-path warmed before timing (axon first-fetch stall, see
scripts/exp_w8a8_profile.py). Correctness: every variant's tile maxima
must match the shipped kernel's bit pattern (same dot precision).
Output: one JSON line; conclusions -> DESIGN.md / ops/pallas/topk.py.
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

from imatch_tpu.ops.pallas.topk import (
    GROUP,
    INVALID_PENALTY,
    NEG_INF,
    _tile_max_kernel,
)

N = 1 << 20  # ~1M, pow2 so every tile_n in the sweep divides it evenly
D = 512
QP = 8  # padded query rows


def timed(fn, args, iters):
    r = jax.block_until_ready(fn(*args))
    np.asarray(r.ravel()[0])  # warm the fetch path (axon stall)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r.ravel()[0])
    return time.perf_counter() - t0


def _tile_max_kernel_T(q_ref, c_ref, max_ref):
    """Transposed-corpus variant: tile block is (d_pad, tile_n), dot is
    canonical (((1,), (0,)), ((), ()))."""
    i = pl.program_id(0)
    col = jax.lax.rem(i, GROUP)

    @pl.when(col == 0)
    def _():
        max_ref[:] = jnp.full_like(max_ref, NEG_INF)

    s = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Qp, tile_n)
    m = jnp.max(s, axis=1, keepdims=True)
    lanes = jax.lax.broadcasted_iota(jnp.int32, max_ref.shape, 1)
    max_ref[:] = jnp.where(lanes == col, m, max_ref[:])


def phase1_rowmajor(tile_n):
    n_tiles = N // tile_n
    nt_pad = -(-n_tiles // GROUP) * GROUP

    @jax.jit
    def f(qs, scoring):
        d_pad = scoring.shape[1]
        return pl.pallas_call(
            _tile_max_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (QP, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile_n, d_pad),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (QP, GROUP), lambda i: (0, i // GROUP), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((QP, nt_pad), jnp.float32),
        )(qs, scoring)

    return f


def phase1_transposed(tile_n):
    n_tiles = N // tile_n
    nt_pad = -(-n_tiles // GROUP) * GROUP

    @jax.jit
    def f(qs, scoring_t):
        d_pad = scoring_t.shape[0]
        return pl.pallas_call(
            _tile_max_kernel_T,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (QP, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (d_pad, tile_n),
                    lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (QP, GROUP), lambda i: (0, i // GROUP), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((QP, nt_pad), jnp.float32),
        )(qs, scoring_t)

    return f


@functools.partial(jax.jit, static_argnames=("d_pad",))
def make_data(key, d_pad):
    """Corpus + queries generated on device (no tunnel upload).
    Returns row-major scoring (N, d_pad) with the penalty at column D,
    and padded queries (QP, d_pad) with q[:, D] = 1."""
    kc, kq, kv = jax.random.split(key, 3)
    c = jax.random.normal(kc, (N, D), jnp.float32)
    c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
    valid = jax.random.uniform(kv, (N,)) > 0.01
    feat = jnp.zeros((N, d_pad - D), jnp.float32)
    feat = feat.at[:, 0].set(jnp.where(valid, 0.0, INVALID_PENALTY))
    scoring = jnp.concatenate([c, feat], axis=1).astype(jnp.bfloat16)
    q = jax.random.normal(kq, (1, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qf = jnp.zeros((QP, d_pad), jnp.float32).at[:1, :D].set(q)
    qf = qf.at[:, D].set(1.0)
    return scoring, qf.astype(jnp.bfloat16)


def main():
    iters = int(os.environ.get("ITERS", "30"))
    out = {"n": N, "d": D, "iters": iters}
    key = jax.random.key(0)

    # --- shipped layout: row-major, d_pad=640
    scoring640, qs640 = jax.block_until_ready(make_data(key, 640))
    base = None
    for tile_n in (1024, 2048, 4096):
        f = phase1_rowmajor(tile_n)
        dt = timed(f, (qs640, scoring640), iters)
        out[f"rowmajor_640_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
        if tile_n == 2048:
            base = np.asarray(f(qs640, scoring640))[0]

    # --- transposed, same 640 padding (isolates the relayout cost)
    scoring_t640 = jax.block_until_ready(
        jax.jit(lambda s: s.T.copy())(scoring640)
    )
    for tile_n in (1024, 2048, 4096, 8192):
        f = phase1_transposed(tile_n)
        dt = timed(f, (qs640, scoring_t640), iters)
        out[f"transposed_640_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
        if tile_n == 2048:
            got = np.asarray(f(qs640, scoring_t640))[0]
            out["transposed_matches"] = bool(
                np.allclose(got, base, atol=1e-6)
            )
    del scoring_t640

    # --- transposed, sublane-quantum padding (513 -> 528): -25% traffic
    scoring528, qs528 = jax.block_until_ready(make_data(key, 528))
    scoring_t528 = jax.block_until_ready(
        jax.jit(lambda s: s.T.copy())(scoring528)
    )
    del scoring528
    for tile_n in (2048, 4096, 8192):
        f = phase1_transposed(tile_n)
        dt = timed(f, (qs528, scoring_t528), iters)
        out[f"transposed_528_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
        if tile_n == 2048:
            got = np.asarray(f(qs528, scoring_t528))[0]
            out["transposed_528_matches"] = bool(
                np.allclose(got, base, atol=1e-6)
            )

    # --- context: the XLA tilemax engine on the same data
    from imatch_tpu.index.search import prepare_device_corpus, tilemax_topk

    c32 = jax.jit(lambda s: s[:, :D].astype(jnp.float32))(scoring640)
    valid = jax.jit(lambda s: s[:, D] == 0)(scoring640)
    dc = prepare_device_corpus(c32, valid, score_dtype=jnp.bfloat16)
    del c32
    q1 = jax.jit(lambda q: q[:1, :D].astype(jnp.float32))(qs640)
    g = jax.jit(lambda q: tilemax_topk(q, dc, k=10))
    r = jax.block_until_ready(g(q1))
    np.asarray(r[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(q1)
    np.asarray(r[0].ravel()[0])
    out["tilemax_full_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 2)

    out["hbm_floor_640_ms"] = round(N * 640 * 2 / 819e9 * 1e3, 2)
    out["hbm_floor_528_ms"] = round(N * 528 * 2 / 819e9 * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
