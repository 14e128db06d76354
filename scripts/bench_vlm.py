"""VLM decode micro-benchmark at moondream2 geometry (random init).

Measures caption-decode token rate (the VERDICT round-1 number was
164 tok/s) and the effect of parameter storage dtype: fp32 params are
converted per-op, so every decode step streams 2x the bytes bf16
storage needs — decode is HBM-bound, making storage dtype a direct
throughput lever.

Usage: python scripts/bench_vlm.py [config] [batch ...]
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

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imatch_tpu.models.moondream.configs import get_md_config
from imatch_tpu.models.moondream.generate import greedy_generate, prefill
from imatch_tpu.models.moondream.model import init_md_params


def bench(
    cfg_name: str,
    batches,
    param_dtype,
    packed=False,
    quant=False,
    cache_int8=False,
    max_new: int = 32,
):
    cfg = get_md_config(cfg_name)
    params = init_md_params(jax.random.key(0), cfg)
    if param_dtype != jnp.float32:
        params = jax.tree.map(
            lambda x: x.astype(param_dtype)
            if x.dtype == jnp.float32
            else x,
            params,
        )
    if packed:
        from imatch_tpu.models.moondream.model import pack_text_layers

        params = pack_text_layers(params)
    if quant:
        from imatch_tpu.models.moondream.model import quantize_int8

        params = quantize_int8(params)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    import functools

    cache_dt = jnp.int8 if cache_int8 else None

    @functools.partial(jax.jit, static_argnames=("max_new",))
    def gen(params, feats, tokens, max_new):
        logits, cache, pos = prefill(
            params, cfg, feats, tokens, dtype=dt, max_new=max_new,
            cache_dtype=cache_dt,
        )
        return greedy_generate(
            params, cfg, logits, cache, pos, max_new=max_new, dtype=dt
        )

    p = cfg.vision.num_patches
    d = cfg.text.hidden_size
    for b in batches:
        feats = jax.random.normal(jax.random.key(1), (b, p, d), jnp.float32)
        tokens = jnp.tile(
            jnp.arange(12, dtype=jnp.int32)[None] % cfg.text.vocab_size,
            (b, 1),
        )
        r = gen(params, feats, tokens, max_new)
        np.asarray(r.tokens)  # compile + warm
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            r = gen(params, feats, tokens, max_new)
        steps = int(np.asarray(r.lengths).max())
        wall = time.perf_counter() - t0
        rate = b * steps * iters / wall
        print(
            f"  batch={b:3d} steps={steps} {rate:8.1f} tok/s"
            f" ({wall / iters * 1e3:7.1f} ms/gen)"
        )


if __name__ == "__main__":
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "moondream2"
    batches = [int(x) for x in sys.argv[2:]] or [1, 8]
    print(f"{cfg_name} on {jax.default_backend()}")
    variants = [
        ("bf16 params, packed qkv+mlp", jnp.bfloat16, True, False, False),
        ("int8 params, packed qkv+mlp", jnp.bfloat16, True, True, False),
        ("int8 params + int8 kv cache", jnp.bfloat16, True, True, True),
    ]
    if os.environ.get("BENCH_FP32"):
        variants.insert(0, ("fp32 params, unpacked", jnp.float32, False, False, False))
    if os.environ.get("BENCH_UNPACKED"):
        variants.insert(0, ("bf16 params, unpacked", jnp.bfloat16, False, False, False))
    for name, dtp, pk, qt, c8 in variants:
        print(name)
        bench(cfg_name, batches, dtp, packed=pk, quant=qt, cache_int8=c8)
