"""Autoregressive generation and the yes/no VQA fast path.

Generation is a ``lax.while_loop`` over single-token decoder calls with
the KV cache threaded through — zero host round-trips inside the loop,
per-row EOS masking for batched decode (the reference pays one network
call per caption, /root/reference/backend/app/main.py:600-603).

The filter subsystem only needs yes/no answers
(backend/app/main.py:1001-1002 "Yes or No: <q>"), so ``vqa_yes_no``
skips generation entirely: one prefill, compare the yes/no token logits.
That turns the N_images x N_filters back-fill into pure batched prefill
— the single biggest algorithmic win over the reference's design.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from imatch_tpu.models.moondream.configs import MoondreamConfig
from imatch_tpu.models.moondream.model import (
    KVCache,
    _quant_kv_cols,
    decoder_forward,
    embed_tokens,
    lm_logits,
)


def prefill(
    params,
    cfg: MoondreamConfig,
    image_embeds: jax.Array,
    token_ids: jax.Array,
    *,
    dtype=jnp.float32,
    cache_dtype=None,
    max_new: int = 0,
    use_cache: bool = True,
    act_quant: bool = False,
) -> Tuple[jax.Array, KVCache, jax.Array]:
    """Run [BOS; image patches; prompt tokens] through the decoder.

    Layout parity: moondream2 checkpoints were trained with the BOS
    embedding at position 0 BEFORE the image patches (the reference
    runtime's input_embeds), so token_ids[:, 0] MUST be BOS — the
    runtime's _prompt_id_list guarantees it. Placing BOS after the
    image shifts every rotary position the model was trained on.

    image_embeds: (B, P, D) projected vision features.
    token_ids: (B, S) prompt token ids, BOS first (fixed length, no
    padding).
    max_new > 0 sizes the KV cache to a 128-slot bucket just above
    prompt+max_new instead of max_seq — decode attends the whole cache
    per step, so this cuts per-token reads (measured ~2x at moondream2
    geometry). Returns (last logits (B, V), cache, next start_pos (B,)).
    """
    b = token_ids.shape[0]
    tok = embed_tokens(params, token_ids, dtype)
    img = image_embeds.astype(tok.dtype)
    seq = jnp.concatenate([tok[:, :1], img, tok[:, 1:]], axis=1)
    if not use_cache:
        # cache-free prefill: no (L, B, H, Dh, S) buffers at all — the
        # VQA fast path only reads the logits, and the discarded cache
        # is otherwise the HBM ceiling on batch size (~140 MB/row at
        # moondream2; XLA materializes its zero-init twice).
        start = jnp.zeros((b,), jnp.int32)
        hidden, _ = decoder_forward(
            params, seq, None, start, cfg, dtype=dtype,
            act_quant=act_quant,
        )
        logits = lm_logits(params, hidden[:, -1:, :], cfg)[:, 0]
        return logits, None, jnp.full((b,), seq.shape[1], jnp.int32)
    cache_len = 0
    if max_new:
        # 128-slot buckets: decode reads the WHOLE cache every step, so
        # bucket granularity is directly cache-bandwidth (741+32 tokens
        # bucket to 896 slots instead of 1024 — 12% less traffic);
        # compile variants stay bounded by the few prompt shapes.
        need = seq.shape[1] + max_new
        cache_len = min(cfg.text.max_seq, -(-need // 128) * 128)
    n = cache_len or cfg.text.max_seq
    start = jnp.zeros((b,), jnp.int32)
    # Build the cache FROM the prefill's own K/V (cache-free forward +
    # one pad) instead of scattering into a zero-initialized cache: XLA
    # materializes the zero-init twice (broadcast + clone), so the old
    # path's HBM peak was ~2 extra cache copies — the batch-size
    # ceiling for caption prefill.
    hidden, kv = decoder_forward(
        params, seq, None, start, cfg, dtype=dtype, collect_kv=True,
        act_quant=act_quant,
    )
    ks, vs = kv
    cdt = cache_dtype or dtype
    pad = ((0, 0),) * 4 + ((0, n - seq.shape[1]),)
    if cdt == jnp.int8:
        # int8 cache (IMATCH_MD_CACHE=int8): per-(B,H,slot) scales;
        # padded slots get scale 1 (they are masked out of attention)
        kq, k_s = _quant_kv_cols(ks, axis=3)
        vq, v_s = _quant_kv_cols(vs, axis=3)
        spad = ((0, 0),) * 3 + ((0, n - seq.shape[1]),)
        cache = KVCache(
            jnp.pad(kq, pad),
            jnp.pad(vq, pad),
            jnp.pad(k_s, spad, constant_values=1.0),
            jnp.pad(v_s, spad, constant_values=1.0),
        )
    else:
        cache = KVCache(
            jnp.pad(ks.astype(cdt), pad), jnp.pad(vs.astype(cdt), pad)
        )
    logits = lm_logits(params, hidden[:, -1:, :], cfg)[:, 0]
    pos = jnp.full((b,), seq.shape[1], jnp.int32)
    return logits, cache, pos


class GenResult(NamedTuple):
    tokens: jax.Array  # (B, max_new) int32, eos-padded
    lengths: jax.Array  # (B,) produced tokens per row (incl. eos)


class GenState(NamedTuple):
    """Decode loop carry, exposed so the loop can be split into
    bounded segments (one device dispatch each) with the cache staying
    on device between dispatches — the quantum of bulk decode work the
    scheduler's priority gate operates on."""

    i: jax.Array  # scalar int32: tokens produced so far
    last: jax.Array  # (B,) last emitted token
    pos: jax.Array  # (B,) next cache slot
    cache: KVCache
    done: jax.Array  # (B,) bool per-row EOS
    out: jax.Array  # (B, max_new) int32, eos-padded


def init_gen_state(
    cfg: MoondreamConfig,
    first_logits: jax.Array,
    cache: KVCache,
    start_pos: jax.Array,
    *,
    max_new: int,
) -> GenState:
    eos = cfg.text.eos_token_id
    b = first_logits.shape[0]
    first_tok = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
    out0 = jnp.full((b, max_new), eos, jnp.int32)
    out0 = out0.at[:, 0].set(first_tok)
    return GenState(
        jnp.int32(1), first_tok, start_pos, cache, first_tok == eos, out0
    )


def _decode_step(params, cfg: MoondreamConfig, dtype, state: GenState):
    eos = cfg.text.eos_token_id
    i, last, pos, cache, done, out = state
    emb = embed_tokens(params, last[:, None], dtype)
    hidden, cache = decoder_forward(params, emb, cache, pos, cfg, dtype=dtype)
    logits = lm_logits(params, hidden, cfg)[:, 0]
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    nxt = jnp.where(done, eos, nxt)
    out = out.at[:, i].set(nxt)
    done = jnp.logical_or(done, nxt == eos)
    return GenState(i + 1, nxt, pos + 1, cache, done, out)


def gen_segment(
    params,
    cfg: MoondreamConfig,
    state: GenState,
    *,
    steps: int,
    max_new: int,
    dtype=jnp.float32,
) -> GenState:
    """Advance the greedy decode by at most ``steps`` tokens — one
    bounded device dispatch. Segments compose to exactly the
    greedy_generate result (same step body, same EOS masking); a
    segment past the end (all rows done or i == max_new) is a no-op
    whose while_loop exits immediately, so trailing dispatches after
    early EOS cost ~nothing."""
    limit = jnp.minimum(state.i + steps, max_new)

    def cond(s):
        return jnp.logical_and(s.i < limit, ~jnp.all(s.done))

    def step(s):
        return _decode_step(params, cfg, dtype, s)

    return jax.lax.while_loop(cond, step, state)


def finish_gen(state: GenState, *, eos: int, max_new: int) -> GenResult:
    out = state.out
    lengths = jnp.argmax(out == eos, axis=1) + 1
    lengths = jnp.where(jnp.any(out == eos, axis=1), lengths, max_new)
    return GenResult(out, lengths)


def greedy_generate(
    params,
    cfg: MoondreamConfig,
    first_logits: jax.Array,
    cache: KVCache,
    start_pos: jax.Array,
    *,
    max_new: int = 64,
    dtype=jnp.float32,
) -> GenResult:
    """Greedy decode from a prefilled cache; stops per-row at EOS.

    Same step body as the segmented path (gen_segment) — one while_loop
    over all max_new steps, zero host round-trips inside."""
    eos = cfg.text.eos_token_id
    state = init_gen_state(
        cfg, first_logits, cache, start_pos, max_new=max_new
    )

    def cond(s):
        return jnp.logical_and(s.i < max_new, ~jnp.all(s.done))

    def step(s):
        return _decode_step(params, cfg, dtype, s)

    state = jax.lax.while_loop(cond, step, state)
    return finish_gen(state, eos=eos, max_new=max_new)


def vqa_yes_no(
    params,
    cfg: MoondreamConfig,
    image_embeds: jax.Array,
    token_ids: jax.Array,
    yes_ids: Sequence[int],
    no_ids: Sequence[int],
    *,
    dtype=jnp.float32,
    act_quant: bool = False,
) -> jax.Array:
    """Batched yes/no probability: True where P(yes) > P(no).

    yes_ids/no_ids: token-id variants of the answer words (e.g. "Yes",
    " Yes", "yes"); probabilities are summed over variants.
    """
    # use_cache=False: only the prefill logits are consumed, so no KV
    # cache exists at all (at moondream2 geometry a discarded cache is
    # ~140 MB per batch row — the backfill batch-size ceiling).
    logits, _, _ = prefill(
        params, cfg, image_embeds, token_ids, dtype=dtype, use_cache=False,
        act_quant=act_quant,
    )
    probs = jax.nn.softmax(logits, axis=-1)
    p_yes = probs[:, jnp.asarray(list(yes_ids))].sum(axis=-1)
    p_no = probs[:, jnp.asarray(list(no_ids))].sum(axis=-1)
    return p_yes > p_no
