"""Experiment: W8A8 prefill (IMATCH_MD_ACT=int8) vs weight-only int8 vs
bf16 on the VQA filter workload at moondream2 geometry (random init).

The filter backfill is pure batched prefill (generate.vqa_yes_no) —
compute-bound, ~66%% MXU at bf16 (docs/DESIGN.md: 73 answers/s at
B=128 = 13.7 ms/answer vs a ~9.1 ms bf16 roofline). The v5e MXU rates
int8 at 2x bf16, so the W8A8 prefill path is the remaining lever.

Also measures the caption path (prefill + 32 greedy decode steps) with
and without W8A8 prefill — decode stays weight-only either way, so the
delta is the prefill share.

Weights are passed as jit ARGUMENTS (closure-captured towers become HLO
literals that overflow the remote-compile tunnel with HTTP 413).

Usage: python scripts/exp_w8a8_vqa.py [config] [batch ...]
"""

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "IMATCH_XLA_CACHE", os.path.expanduser("~/.cache/imatch_tpu/xla")
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imatch_tpu.models.moondream.configs import get_md_config
from imatch_tpu.models.moondream.generate import (
    greedy_generate,
    prefill,
    vqa_yes_no,
)
from imatch_tpu.models.moondream.model import (
    init_md_params,
    pack_text_layers,
    quantize_int8,
)


def make_params(cfg, quant):
    params = init_md_params(jax.random.key(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    params = pack_text_layers(params)
    if quant:
        params = quantize_int8(params)
    return jax.block_until_ready(params)


def bench_vqa(cfg, params, b, act_quant, iters=5):
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    @functools.partial(jax.jit, static_argnames=("aq",))
    def vqa(params, feats, tokens, aq):
        return vqa_yes_no(
            params, cfg, feats, tokens, (1, 2), (3, 4), dtype=dt,
            act_quant=aq,
        )

    p, d = cfg.vision.num_patches, cfg.text.hidden_size
    feats = jax.random.normal(jax.random.key(1), (b, p, d), jnp.float32)
    tokens = jnp.tile(
        jnp.arange(12, dtype=jnp.int32)[None] % cfg.text.vocab_size, (b, 1)
    )
    np.asarray(vqa(params, feats, tokens, act_quant))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = vqa(params, feats, tokens, act_quant)
    np.asarray(r)
    wall = time.perf_counter() - t0
    return b * iters / wall, wall / iters * 1e3


def bench_caption(cfg, params, b, act_quant, max_new=32, iters=3):
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    @functools.partial(jax.jit, static_argnames=("max_new", "aq"))
    def gen(params, feats, tokens, max_new, aq):
        logits, cache, pos = prefill(
            params, cfg, feats, tokens, dtype=dt, max_new=max_new,
            act_quant=aq,
        )
        return greedy_generate(
            params, cfg, logits, cache, pos, max_new=max_new, dtype=dt
        )

    p, d = cfg.vision.num_patches, cfg.text.hidden_size
    feats = jax.random.normal(jax.random.key(1), (b, p, d), jnp.float32)
    tokens = jnp.tile(
        jnp.arange(12, dtype=jnp.int32)[None] % cfg.text.vocab_size, (b, 1)
    )
    r = gen(params, feats, tokens, max_new, act_quant)
    np.asarray(r.tokens)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = gen(params, feats, tokens, max_new, act_quant)
    steps = int(np.asarray(r.lengths).max())
    wall = time.perf_counter() - t0
    return b * steps * iters / wall, wall / iters * 1e3


if __name__ == "__main__":
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "moondream2"
    batches = [int(x) for x in sys.argv[2:]] or [64, 128]
    cfg = get_md_config(cfg_name)
    print(f"{cfg_name} on {jax.default_backend()}")

    print("bf16 (weight + act):")
    params = make_params(cfg, quant=False)
    for b in batches:
        rate, ms = bench_vqa(cfg, params, b, act_quant=False)
        print(f"  vqa     batch={b:3d} {rate:8.1f} answers/s ({ms:7.1f} ms)")
    del params

    params = make_params(cfg, quant=True)
    print("int8 weights, bf16 acts (IMATCH_MD_QUANT=int8):")
    for b in batches:
        rate, ms = bench_vqa(cfg, params, b, act_quant=False)
        print(f"  vqa     batch={b:3d} {rate:8.1f} answers/s ({ms:7.1f} ms)")
    print("W8A8 prefill (+ IMATCH_MD_ACT=int8):")
    for b in batches:
        rate, ms = bench_vqa(cfg, params, b, act_quant=True)
        print(f"  vqa     batch={b:3d} {rate:8.1f} answers/s ({ms:7.1f} ms)")
    print("caption (prefill+32 decode), int8 weights:")
    for aq in (False, True):
        rate, ms = bench_caption(cfg, params, 16, act_quant=aq)
        tag = "W8A8 prefill" if aq else "bf16 prefill"
        print(f"  {tag} batch=16 {rate:8.1f} tok/s ({ms:7.1f} ms/gen)")
