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


class StreamDict(dict):
    """Streams each measurement to stderr as it lands, so a timeout
    keeps the partial results."""

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        print(f"[exp] {k} = {v}", file=sys.stderr, flush=True)


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


def phase1_xla(tile_n):
    """The shipped tilemax phase-1 in plain XLA on the row-major
    (N, d_pad) corpus — einsum contracts dim 1 of both operands, so the
    corpus enters the MXU 'transposed-B' and XLA may pay a relayout."""
    n_tiles = N // tile_n

    @jax.jit
    def f(qs, scoring):
        s = jnp.einsum(
            "qd,nd->qn", qs, scoring, preferred_element_type=jnp.float32
        )
        return jnp.max(s.reshape(QP, n_tiles, tile_n), axis=2)

    return f


def phase1_xla_T(tile_n):
    """Same phase-1 with the corpus stored (d_pad, N): the contraction
    is canonical (qd,dn->qn). If the row-major gap is a per-query
    relayout, this variant alone should approach the HBM floor with no
    Pallas at all."""
    n_tiles = N // tile_n

    @jax.jit
    def f(qs, scoring_t):
        s = jnp.einsum(
            "qd,dn->qn", qs, scoring_t, preferred_element_type=jnp.float32
        )
        return jnp.max(s.reshape(QP, n_tiles, tile_n), axis=2)

    return f


def phase1_xla_int8(tile_n, transposed):
    """int8 phase-1 (the IMATCH_SCORE_DTYPE=int8 tier): half the HBM
    bytes of bf16. Dequant scales are applied in phase 2 in the shipped
    engine; here raw int32 tile maxima are enough to time the stream.
    NOTE: max-then-dequant != dequant-then-max with per-row scales, so
    the shipped int8 engine keeps the (Q, N) fp32 where+max form — this
    variant times the BEST CASE int8 stream (shared scale)."""
    n_tiles = N // tile_n

    @jax.jit
    def f(qi, ci):
        if transposed:
            s = jnp.einsum(
                "qd,dn->qn", qi, ci, preferred_element_type=jnp.int32
            )
        else:
            s = jnp.einsum(
                "qd,nd->qn", qi, ci, preferred_element_type=jnp.int32
            )
        return jnp.max(s.reshape(QP, n_tiles, tile_n), axis=2)

    return f


def main():
    iters = int(os.environ.get("ITERS", "30"))
    out = StreamDict({"n": N, "d": D, "iters": iters})
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
    # tile_n capped at 4096: a (640, 8192) bf16 block is 10.5 MB and the
    # double-buffered pair blows the 16 MB VMEM budget (measured OOM)
    for tile_n in (1024, 2048, 4096):
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
    for tile_n in (2048, 4096):
        f = phase1_transposed(tile_n)
        dt = timed(f, (qs528, scoring_t528), iters)
        out[f"transposed_528_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
        if tile_n == 2048:
            got = np.asarray(f(qs528, scoring_t528))[0]
            # atol 2e-3, not 1e-6: the 528-wide contraction splits K
            # differently than the 640-wide base, so the f32 sums of
            # bf16 products accumulate in a different order — rounding,
            # not a wrong answer; the actual gap is recorded next to it
            out["transposed_528_matches"] = bool(
                np.allclose(got, base, atol=2e-3)
            )
            out["transposed_528_max_abs_diff"] = float(
                np.max(np.abs(got - base))
            )

    # --- XLA-only variants: is the gap a layout problem, not a
    # kernel-language problem?
    for tile_n in (512, 2048):
        f = phase1_xla(tile_n)
        dt = timed(f, (qs640, scoring640), iters)
        out[f"xla_rowmajor_640_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
    scoring_t640b = jax.block_until_ready(
        jax.jit(lambda s: s.T.copy())(scoring640)
    )
    for tile_n in (512, 2048):
        f = phase1_xla_T(tile_n)
        dt = timed(f, (qs640, scoring_t640b), iters)
        out[f"xla_transposed_640_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
        if tile_n == 2048:
            got = np.asarray(f(qs640, scoring_t640b))[0]
            out["xla_transposed_matches"] = bool(
                np.allclose(got, base, atol=2e-2)
            )
    del scoring_t640b

    # --- int8 stream (half the bytes): row-major vs transposed, XLA
    ci8 = jax.block_until_ready(
        jax.jit(
            lambda s: jnp.clip(
                jnp.round(s[:, :D].astype(jnp.float32) * 127.0), -127, 127
            ).astype(jnp.int8)
        )(scoring640)
    )
    qi8 = jax.block_until_ready(
        jax.jit(
            lambda q: jnp.clip(
                jnp.round(q[:, :D].astype(jnp.float32) * 127.0), -127, 127
            ).astype(jnp.int8)
        )(qs640)
    )
    for tile_n in (512, 2048):
        f = phase1_xla_int8(tile_n, transposed=False)
        dt = timed(f, (qi8, ci8), iters)
        out[f"xla_int8_rowmajor_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
    ci8t = jax.block_until_ready(jax.jit(lambda s: s.T.copy())(ci8))
    for tile_n in (512, 2048):
        f = phase1_xla_int8(tile_n, transposed=True)
        dt = timed(f, (qi8, ci8t), iters)
        out[f"xla_int8_transposed_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
    del ci8t
    out["hbm_floor_int8_512_ms"] = round(N * 512 / 819e9 * 1e3, 2)

    # --- int8 STORAGE, bf16 COMPUTE: the int8 einsum above reaches only
    # ~40% of the halved HBM bytes (and the roofline shows XLA never
    # engages a fast int8 MXU path on v5e) — so read int8 from HBM,
    # convert to bf16 in VMEM, and ride the bf16 matmul path that
    # measures ~60% of BW. Includes the per-row dequant scale multiply
    # fused into the reduce (the realistic engine form, which also
    # drops query quantization = strictly better accuracy).
    def phase1_int8_as_bf16(tile_n):
        n_tiles = N // tile_n

        @jax.jit
        def f(qbf, ci, scale):
            s = jnp.einsum(
                "qd,nd->qn",
                qbf,
                ci.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            s = s * scale[None, :]
            return jnp.max(s.reshape(QP, n_tiles, tile_n), axis=2)

        return f

    scale1 = jax.block_until_ready(jnp.ones((N,), jnp.float32))
    qbf = jax.jit(lambda q: q[:, :D].astype(jnp.bfloat16))(qs640)
    for tile_n in (512, 2048):
        f = phase1_int8_as_bf16(tile_n)
        dt = timed(f, (qbf, ci8, scale1), iters)
        out[f"xla_int8_as_bf16_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)

    # --- int4 storage (quarter bytes; XLA packs 2 codes/byte on TPU)
    try:
        ci4 = jax.block_until_ready(
            jax.jit(
                lambda s: jnp.clip(
                    jnp.round(s[:, :D].astype(jnp.float32) * 7.0), -7, 7
                ).astype(jnp.int4)
            )(scoring640)
        )
        for tile_n in (512, 2048):
            f = phase1_int8_as_bf16(tile_n)  # same graph; operand int4
            dt = timed(f, (qbf, ci4, scale1), iters)
            out[f"xla_int4_as_bf16_t{tile_n}_ms"] = round(dt / iters * 1e3, 2)
        del ci4
        out["hbm_floor_int4_512_ms"] = round(N * 256 / 819e9 * 1e3, 2)
    except Exception as e:  # int4 support is version-dependent
        out["int4_error"] = str(e)[:160]
    del ci8

    # --- context: the XLA tilemax engine on the same data
    from imatch_tpu.index.search import prepare_device_corpus, tilemax_topk

    c32 = jax.jit(lambda s: s[:, :D].astype(jnp.float32))(scoring640)
    valid = jax.jit(lambda s: s[:, D] == 0)(scoring640)
    dc = prepare_device_corpus(c32, valid, score_dtype=jnp.bfloat16)
    del c32
    q1 = jax.jit(lambda q: q[:1, :D].astype(jnp.float32))(qs640)
    # NOTE: tilemax_topk is already jit'd with dc fields as ARGS —
    # wrapping it in another jit closure-captures the 3.2 GB corpus as
    # lowering constants and re-uploads it through the tunnel (measured:
    # the run times out in lowering with a 3.22 GB captured-constants
    # warning)
    r = jax.block_until_ready(tilemax_topk(q1, dc, k=10))
    np.asarray(r[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = tilemax_topk(q1, dc, k=10)
    np.asarray(r[0].ravel()[0])
    out["tilemax_full_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 2)

    out["hbm_floor_640_ms"] = round(N * 640 * 2 / 819e9 * 1e3, 2)
    out["hbm_floor_528_ms"] = round(N * 528 * 2 / 819e9 * 1e3, 2)

    # --- engine-level A/B: int8 storage scored via bf16 dequant matmul
    # (isolated phase-1 above measures ~parity with the int8 einsum and
    # would drop query quantization) — but inside the FULL engine graph
    # (mask + scale + tile-max + phase-2) XLA stops fusing the
    # astype(bf16) into the matmul and materializes a bf16 corpus copy,
    # so the engine-level number REGRESSES. Kept here so the negative
    # is reproducible.
    @functools.partial(jax.jit, static_argnames=("k", "tile_n"))
    def tilemax_i8bf(queries, scoring, exact, valid, scale, *, k, tile_n):
        q32 = queries.astype(jnp.float32)
        nq = q32.shape[0]
        n_pad, d = exact.shape
        n_tiles = n_pad // tile_n
        s = jnp.einsum(
            "qd,nd->qn",
            q32.astype(jnp.bfloat16),
            scoring.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(valid[None, :], s * scale[None, :], NEG_INF)
        tile_max = jnp.max(s.reshape(nq, n_tiles, tile_n), axis=2)
        kt = min(k + 16, n_tiles)
        _, top_tiles = jax.lax.top_k(tile_max, kt)
        return top_tiles

    dc8 = prepare_device_corpus(
        dc.exact, valid, tile_n=512, score_dtype=jnp.int8
    )
    g8 = lambda: tilemax_topk(q1, dc8, k=16)
    r = jax.block_until_ready(g8())
    np.asarray(r[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g8()
    np.asarray(r[0].ravel()[0])
    out["tilemax_int8_full_ms"] = round(
        (time.perf_counter() - t0) / iters * 1e3, 2
    )
    gv = lambda: tilemax_i8bf(
        q1, dc8.scoring, dc8.exact, dc8.valid, dc8.scale, k=16, tile_n=512
    )
    r = jax.block_until_ready(gv())
    np.asarray(r.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = gv()
    np.asarray(r.ravel()[0])
    out["tilemax_int8_as_bf16_phase1_ms"] = round(
        (time.perf_counter() - t0) / iters * 1e3, 2
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
