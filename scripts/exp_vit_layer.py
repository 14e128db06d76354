"""ViT-L/14 encoder-layer experiments: chase the ~9 ms attention-adjacent
interaction cost (docs/DESIGN.md "CLIP encode ceiling re-measured").

Round-2 profile at B=32, S=257, D=1024, H=16 (bf16): full encode 43.8 ms
of which attention-in-model ~16 ms vs 7.3 ms standalone — the gap is
layout work (reshape/transpose) AROUND the attention, not the attention
math. Variants measured here, full 24-layer scan, chained dispatch +
one scalar fetch:

  base     current model body (transpose to BHSD + mha)
  bshd     no transposes: einsums contract directly on (B, S, H, Dh)
  packed   single fused QKV matmul + bshd attention
  pad264   sequence padded 257->264 (sublane-aligned) outside the scan
  pad384   sequence padded 257->384 (lane-aligned) outside the scan
  attn     standalone attention-only reference (the 7.3 ms bound)

Usage: python scripts/exp_vit_layer.py [batch] [variants,comma-sep]
"""

import functools
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
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imatch_tpu.models.clip import get_config, init_params
from imatch_tpu.models.clip.model import (
    _act,
    _dense,
    _layer_norm,
    _prec,
)
from imatch_tpu.ops.attention import mha

CFG = get_config("vit-l14")
VC = CFG.vision
D = VC.hidden_size
H = VC.num_heads
HD = D // H
S = VC.num_patches + 1  # 257
EPS = 1e-5
ACT = VC.hidden_act


def body_base(h, lp, prec):
    b, s, d = h.shape
    y = _layer_norm(h, lp["ln1"], EPS)
    a = lp["attn"]
    q = _dense(y, a["wq"], a["bq"], prec)
    k = _dense(y, a["wk"], a["bk"], prec)
    v = _dense(y, a["wv"], a["bv"], prec)
    q = q.reshape(b, s, H, HD).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, H, HD).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, H, HD).transpose(0, 2, 1, 3)
    o = mha(q, k, v, causal=False, impl="xla", precision=prec)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
    h = h + _dense(o, a["wo"], a["bo"], prec)
    y = _layer_norm(h, lp["ln2"], EPS)
    m = lp["mlp"]
    y = _act(_dense(y, m["w1"], m["b1"], prec), ACT)
    return h + _dense(y, m["w2"], m["b2"], prec), None


def _attn_bshd(q, k, v, prec, kmask=None):
    """Attention contracting directly on (B, S, H, Dh) — no transposes;
    XLA chooses layouts for the batched matmuls itself."""
    dtype = q.dtype
    scale = jnp.bfloat16(HD**-0.5) if dtype == jnp.bfloat16 else HD**-0.5
    logits = (
        jnp.einsum(
            "bqhd,bkhd->bhqk",
            q,
            k,
            preferred_element_type=dtype,
            precision=prec,
        )
        * scale
    )
    if kmask is not None:
        neg = jnp.asarray(-3e38, dtype)
        logits = jnp.where(kmask[None, None, None, :], logits, neg)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp((logits - m).astype(jnp.float32)).astype(dtype)
    denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    p = p / denom.astype(dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(dtype)


def body_bshd(h, lp, prec, kmask=None):
    b, s, d = h.shape
    y = _layer_norm(h, lp["ln1"], EPS)
    a = lp["attn"]
    q = _dense(y, a["wq"], a["bq"], prec).reshape(b, s, H, HD)
    k = _dense(y, a["wk"], a["bk"], prec).reshape(b, s, H, HD)
    v = _dense(y, a["wv"], a["bv"], prec).reshape(b, s, H, HD)
    o = _attn_bshd(q, k, v, prec, kmask).reshape(b, s, d)
    h = h + _dense(o, a["wo"], a["bo"], prec)
    y = _layer_norm(h, lp["ln2"], EPS)
    m = lp["mlp"]
    y = _act(_dense(y, m["w1"], m["b1"], prec), ACT)
    return h + _dense(y, m["w2"], m["b2"], prec), None


def pack_qkv(layers):
    w = jnp.concatenate(
        [layers["attn"][f"w{t}"] for t in "qkv"], axis=-1
    )  # (L, D, 3D)
    b = jnp.concatenate([layers["attn"][f"b{t}"] for t in "qkv"], axis=-1)
    out = dict(layers)
    out["attn"] = dict(layers["attn"])
    out["attn"]["wqkv"] = w
    out["attn"]["bqkv"] = b
    return out


def body_packed(h, lp, prec, kmask=None):
    b, s, d = h.shape
    y = _layer_norm(h, lp["ln1"], EPS)
    a = lp["attn"]
    qkv = _dense(y, a["wqkv"], a["bqkv"], prec).reshape(b, s, 3, H, HD)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    o = _attn_bshd(q, k, v, prec, kmask).reshape(b, s, d)
    h = h + _dense(o, a["wo"], a["bo"], prec)
    y = _layer_norm(h, lp["ln2"], EPS)
    m = lp["mlp"]
    y = _act(_dense(y, m["w1"], m["b1"], prec), ACT)
    return h + _dense(y, m["w2"], m["b2"], prec), None


def _ln_normalize(x, eps):
    """LN without the affine: the scale/bias are folded into the next
    matmul's weights (one fewer VPU multiply-add pass over the (B,S,D)
    activation per LN)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def fold_ln(layers):
    """Fold ln1 into wq/wk/wv and ln2 into mlp.w1:
    (g*y + b) @ W + c  ==  y @ (g[:,None]*W) + (b @ W + c)."""
    out = dict(layers)
    a = dict(layers["attn"])
    m = dict(layers["mlp"])
    g1 = layers["ln1"]["scale"]  # (L, D)
    b1 = layers["ln1"]["bias"]
    g2 = layers["ln2"]["scale"]
    b2 = layers["ln2"]["bias"]
    for t in "qkv":
        w = layers["attn"][f"w{t}"]  # (L, D, D)
        a[f"w{t}"] = g1[:, :, None] * w
        a[f"b{t}"] = jnp.einsum("ld,ldf->lf", b1, w) + layers["attn"][f"b{t}"]
    w1 = layers["mlp"]["w1"]
    m["w1"] = g2[:, :, None] * w1
    m["b1"] = jnp.einsum("ld,ldf->lf", b2, w1) + layers["mlp"]["b1"]
    out["attn"] = a
    out["mlp"] = m
    return out


def body_fold(h, lp, prec, kmask=None):
    b, s, d = h.shape
    y = _ln_normalize(h, EPS)
    a = lp["attn"]
    q = _dense(y, a["wq"], a["bq"], prec).reshape(b, s, H, HD)
    k = _dense(y, a["wk"], a["bk"], prec).reshape(b, s, H, HD)
    v = _dense(y, a["wv"], a["bv"], prec).reshape(b, s, H, HD)
    o = _attn_bshd(q, k, v, prec, kmask).reshape(b, s, d)
    h = h + _dense(o, a["wo"], a["bo"], prec)
    y = _ln_normalize(h, EPS)
    m = lp["mlp"]
    y = _act(_dense(y, m["w1"], m["b1"], prec), ACT)
    return h + _dense(y, m["w2"], m["b2"], prec), None


def run_variant(name, layers, x, kmask=None, iters=20):
    prec = _prec(x.dtype)
    if name == "base":
        body = lambda h, lp: body_base(h, lp, prec)  # noqa: E731
    elif name == "bshd":
        body = lambda h, lp: body_bshd(h, lp, prec, kmask)  # noqa: E731
    elif name == "packed":
        layers = pack_qkv(layers)
        body = lambda h, lp: body_packed(h, lp, prec, kmask)  # noqa: E731
    elif name == "fold":
        layers = fold_ln(layers)
        body = lambda h, lp: body_fold(h, lp, prec, kmask)  # noqa: E731
    else:
        raise ValueError(name)

    @jax.jit
    def enc(x, layers):
        out, _ = jax.lax.scan(body, x, layers)
        return out

    r = enc(x, layers)
    np.asarray(r.ravel()[0])  # compile + warm
    t0 = time.perf_counter()
    outs = [enc(x, layers) for _ in range(iters)]
    np.asarray(outs[-1].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, r


def bench_attn_only(b, iters=20):
    """Standalone attention bound: 24 sequential XLA attentions on
    resident (B, H, S, Dh) tensors."""
    q = jax.random.normal(jax.random.key(0), (b, H, S, HD), jnp.bfloat16)

    @jax.jit
    def f(q):
        def step(h, _):
            return mha(h, h, h, causal=False, impl="xla"), None

        out, _ = jax.lax.scan(step, q, None, length=VC.num_layers)
        return out

    r = f(q)
    np.asarray(r.ravel()[0])
    t0 = time.perf_counter()
    outs = [f(q) for _ in range(iters)]
    np.asarray(outs[-1].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    which = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["base", "bshd", "packed", "pad264", "pad384", "attn"]
    )
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = init_params(jax.random.key(0), CFG)
    layers = jax.tree.map(
        lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v,
        params["vision"]["layers"],
    )
    x = jax.random.normal(jax.random.key(1), (b, S, D), dtype)

    ref = None
    for name in which:
        if name == "attn":
            ms = bench_attn_only(b)
            print(f"attn-only bound      : {ms:7.2f} ms")
            continue
        if name.startswith("pad"):
            sp = int(name[3:])
            xp = jnp.pad(x, ((0, 0), (0, sp - S), (0, 0)))
            kmask = jnp.arange(sp) < S
            ms, out = run_variant("bshd", layers, xp, kmask)
            out = out[:, :S]
        else:
            ms, out = run_variant(name, layers, x)
        if ref is None:
            ref = np.asarray(out, np.float32)
            err = 0.0
        else:
            got = np.asarray(out, np.float32)
            err = float(
                np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-9)
            )
        print(
            f"{name:20s} : {ms:7.2f} ms  ({b / (ms / 1e3):7.0f} img/s-equiv)"
            f"  max-rel-err {err:.2e}"
        )


if __name__ == "__main__":
    main()
