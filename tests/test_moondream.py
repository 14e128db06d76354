"""Moondream-class VLM: KV-cache consistency, generation, VQA fast path,
runtime service, converter shape-compatibility (tiny config throughout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imatch_tpu.models.moondream import (
    TINY_MD,
    decoder_forward,
    embed_tokens,
    encode_image_features,
    greedy_generate,
    init_cache,
    init_md_params,
    lm_logits,
    prefill,
    vqa_yes_no,
)
from imatch_tpu.models.moondream.runtime import MoondreamJax
from imatch_tpu.ops.tokenizer_gpt2 import GPT2Tokenizer


@pytest.fixture(scope="module")
def md():
    params = init_md_params(jax.random.key(0), TINY_MD)
    return params


def test_prefill_matches_incremental_decode(md):
    """KV cache + rotary positions: one-shot prefill == token-by-token."""
    cfg = TINY_MD
    b, s = 2, 7
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 256, (b, s)), jnp.int32)
    embeds = embed_tokens(md, tokens)

    cache = init_cache(cfg, b)
    h_full, _ = decoder_forward(
        md, embeds, cache, jnp.zeros((b,), jnp.int32), cfg
    )

    cache = init_cache(cfg, b)
    outs = []
    for i in range(s):
        h, cache = decoder_forward(
            md, embeds[:, i : i + 1], cache, jnp.full((b,), i, jnp.int32), cfg
        )
        outs.append(h)
    h_inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(h_full), np.asarray(h_inc), rtol=2e-4, atol=2e-5
    )


def test_vision_tower_shapes(md):
    cfg = TINY_MD
    pixels = jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3))
    feats = encode_image_features(md, pixels, cfg)
    assert feats.shape == (2, cfg.vision.num_patches, cfg.text.hidden_size)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_greedy_generate_stops_and_pads(md):
    cfg = TINY_MD
    rng = np.random.default_rng(1)
    feats = jnp.asarray(
        rng.standard_normal((2, cfg.vision.num_patches, cfg.text.hidden_size)),
        jnp.float32,
    )
    tokens = jnp.asarray(rng.integers(0, 256, (2, 5)), jnp.int32)
    logits, cache, pos = prefill(md, cfg, feats, tokens)
    out = greedy_generate(md, cfg, logits, cache, pos, max_new=8)
    assert out.tokens.shape == (2, 8)
    assert out.lengths.shape == (2,)
    # deterministic
    out2 = greedy_generate(md, cfg, logits, cache, pos, max_new=8)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(out2.tokens))


def test_vqa_yes_no_shape(md):
    cfg = TINY_MD
    rng = np.random.default_rng(2)
    feats = jnp.asarray(
        rng.standard_normal((3, cfg.vision.num_patches, cfg.text.hidden_size)),
        jnp.float32,
    )
    tokens = jnp.asarray(rng.integers(0, 256, (3, 4)), jnp.int32)
    ans = vqa_yes_no(md, cfg, feats, tokens, yes_ids=[89, 121], no_ids=[78, 110])
    assert ans.shape == (3,)
    assert ans.dtype == bool


def test_runtime_end_to_end(monkeypatch):
    monkeypatch.setenv("IMATCH_MD_CONFIG", "tiny-md")
    svc = MoondreamJax()
    img = np.random.default_rng(3).integers(0, 256, (40, 56, 3), dtype=np.uint8)
    enc = svc.encode_image(img)
    assert enc["features"].shape == (
        TINY_MD.vision.num_patches,
        TINY_MD.text.hidden_size,
    )
    cap = svc.caption(enc, max_new=6)
    assert isinstance(cap["caption"], str)
    ans = svc.query(enc, "Yes or No: is this a drill?")
    assert ans["answer"] in ("Yes", "No")
    open_ans = svc.query(enc, "What is shown?", max_new=6)
    assert isinstance(open_ans["answer"], str)
    # batched filter path agrees with the single path
    batch = svc.query_yes_no_batch([enc, enc], "Yes or No: is this a drill?")
    assert batch == [ans["answer"] == "Yes"] * 2


def test_converter_accepts_hf_layout():
    """A synthetic state dict in the moondream2 naming scheme converts to
    a pytree with exactly the init_md_params structure."""
    from imatch_tpu.models.moondream.convert import convert_md_state_dict

    cfg = TINY_MD
    v, t = cfg.vision, cfg.text
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    sd = {}
    vis = "vision_encoder.encoder.model.visual"
    sd[f"{vis}.patch_embed.linear.weight"] = r(
        v.hidden_size, 3 * v.patch_size * v.patch_size
    )
    sd[f"{vis}.patch_embed.linear.bias"] = r(v.hidden_size)
    sd[f"{vis}.pos_embed"] = r(1, v.num_patches, v.hidden_size)
    for i in range(v.num_layers):
        p = f"{vis}.blocks.{i}"
        sd[f"{p}.norm1.weight"] = r(v.hidden_size)
        sd[f"{p}.norm1.bias"] = r(v.hidden_size)
        sd[f"{p}.attn.qkv.weight"] = r(3 * v.hidden_size, v.hidden_size)
        sd[f"{p}.attn.qkv.bias"] = r(3 * v.hidden_size)
        sd[f"{p}.attn.proj.weight"] = r(v.hidden_size, v.hidden_size)
        sd[f"{p}.attn.proj.bias"] = r(v.hidden_size)
        sd[f"{p}.norm2.weight"] = r(v.hidden_size)
        sd[f"{p}.norm2.bias"] = r(v.hidden_size)
        sd[f"{p}.mlp.fc1.weight"] = r(v.mlp_size, v.hidden_size)
        sd[f"{p}.mlp.fc1.bias"] = r(v.mlp_size)
        sd[f"{p}.mlp.fc2.weight"] = r(v.hidden_size, v.mlp_size)
        sd[f"{p}.mlp.fc2.bias"] = r(v.hidden_size)
    sd[f"{vis}.norm.weight"] = r(v.hidden_size)
    sd[f"{vis}.norm.bias"] = r(v.hidden_size)
    proj = "vision_encoder.projection"
    sd[f"{proj}.mlp.fc1.weight"] = r(cfg.proj_hidden, v.hidden_size)
    sd[f"{proj}.mlp.fc1.bias"] = r(cfg.proj_hidden)
    sd[f"{proj}.mlp.fc2.weight"] = r(t.hidden_size, cfg.proj_hidden)
    sd[f"{proj}.mlp.fc2.bias"] = r(t.hidden_size)
    txt = "text_model.transformer"
    sd[f"{txt}.embd.wte.weight"] = r(t.vocab_size, t.hidden_size)
    for i in range(t.num_layers):
        p = f"{txt}.h.{i}"
        sd[f"{p}.ln.weight"] = r(t.hidden_size)
        sd[f"{p}.ln.bias"] = r(t.hidden_size)
        sd[f"{p}.mixer.Wqkv.weight"] = r(3 * t.hidden_size, t.hidden_size)
        sd[f"{p}.mixer.Wqkv.bias"] = r(3 * t.hidden_size)
        sd[f"{p}.mixer.out_proj.weight"] = r(t.hidden_size, t.hidden_size)
        sd[f"{p}.mixer.out_proj.bias"] = r(t.hidden_size)
        sd[f"{p}.mlp.fc1.weight"] = r(t.mlp_size, t.hidden_size)
        sd[f"{p}.mlp.fc1.bias"] = r(t.mlp_size)
        sd[f"{p}.mlp.fc2.weight"] = r(t.hidden_size, t.mlp_size)
        sd[f"{p}.mlp.fc2.bias"] = r(t.hidden_size)
    sd["text_model.lm_head.ln.weight"] = r(t.hidden_size)
    sd["text_model.lm_head.ln.bias"] = r(t.hidden_size)
    sd["text_model.lm_head.linear.weight"] = r(t.vocab_size, t.hidden_size)
    sd["text_model.lm_head.linear.bias"] = r(t.vocab_size)

    converted = convert_md_state_dict(sd, cfg)
    ref = init_md_params(jax.random.key(0), cfg)
    # identical tree structure and shapes
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a).shape, np.asarray(b).shape
        ),
        converted,
        ref,
    )
    # and the converted params actually run
    pixels = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    feats = encode_image_features(
        jax.tree.map(jnp.asarray, converted), pixels, cfg
    )
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_gpt2_byte_fallback_roundtrip():
    tok = GPT2Tokenizer.byte_fallback()
    s = "Hello, Yes/No é中"
    assert tok.decode(tok.encode(s)) == s
    assert tok.vocab_size == 258


def test_packed_layers_match_unpacked(md):
    """pack_text_layers' fused QKV+MLP projection must be numerically
    identical to the separate-projection path (same matmuls, one
    dispatch): prefill logits and generated tokens agree."""
    from imatch_tpu.models.moondream.model import pack_text_layers
    from imatch_tpu.models.moondream.generate import greedy_generate, prefill

    cfg, params = TINY_MD, md
    packed = pack_text_layers(params)
    assert "qkv_mlp" in packed["text"]["layers"]
    assert "wq" not in packed["text"]["layers"]["attn"]
    feats = jax.random.normal(
        jax.random.key(3), (2, cfg.vision.num_patches, cfg.text.hidden_size)
    )
    tokens = jnp.asarray(
        [[1, 5, 9, 2], [3, 7, 4, 8]], jnp.int32
    ) % cfg.text.vocab_size
    l0, c0, p0 = prefill(params, cfg, feats, tokens)
    l1, c1, p1 = prefill(packed, cfg, feats, tokens)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5)
    r0 = greedy_generate(params, cfg, l0, c0, p0, max_new=8)
    r1 = greedy_generate(packed, cfg, l1, c1, p1, max_new=8)
    np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))


def test_int8_quantized_decode_close_to_full(md):
    """quantize_int8 (weight-only, per-out-channel) must track the
    full-precision model closely: prefill logits cosine >= 0.999 and
    the same greedy argmax on a clearly-peaked distribution."""
    from imatch_tpu.models.moondream.model import (
        pack_text_layers,
        quantize_int8,
    )
    from imatch_tpu.models.moondream.generate import prefill

    cfg, params = TINY_MD, md
    for tree in (params, pack_text_layers(params)):
        qt = quantize_int8(tree)
        lyr = qt["text"]["layers"]
        wq = lyr["qkv_mlp"]["w"] if "qkv_mlp" in lyr else lyr["attn"]["wq"]
        assert wq["q"].dtype == jnp.int8
        assert qt["text"]["lm_head"]["w"]["q"].dtype == jnp.int8
        feats = jax.random.normal(
            jax.random.key(7),
            (2, cfg.vision.num_patches, cfg.text.hidden_size),
        )
        tokens = jnp.asarray([[1, 5, 9, 2], [3, 7, 4, 8]], jnp.int32)
        l_full, _, _ = prefill(tree, cfg, feats, tokens)
        l_q, _, _ = prefill(qt, cfg, feats, tokens)
        a = np.asarray(l_full, np.float64)
        b = np.asarray(l_q, np.float64)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert cos.min() >= 0.999, cos


def test_batch_paths_chunk_and_match_single(monkeypatch):
    """Batched caption/VQA/encode must chunk to fixed-size padded device
    batches (bounded HBM + compile variants) and still agree with the
    single-image paths, including when the batch doesn't divide the
    chunk (padded rows must not leak into results)."""
    monkeypatch.setenv("IMATCH_MD_CONFIG", "tiny-md")
    monkeypatch.setenv("IMATCH_VLM_CAP_CHUNK", "2")
    monkeypatch.setenv("IMATCH_VLM_VQA_CHUNK", "2")
    monkeypatch.setenv("IMATCH_VLM_ENC_CHUNK", "2")
    svc = MoondreamJax()
    rng = np.random.default_rng(9)
    imgs = [
        rng.integers(0, 256, (40, 56, 3), dtype=np.uint8) for _ in range(5)
    ]
    encs = svc.encode_image_batch(imgs)  # 5 = 2+2+1 chunks
    singles = [svc.encode_image(im) for im in imgs]
    for e, s in zip(encs, singles):
        np.testing.assert_allclose(
            e["features"], s["features"], rtol=2e-4, atol=2e-5
        )
    caps = svc.caption_batch(encs, max_new=6)
    assert len(caps) == 5
    assert caps == [svc.caption(e, max_new=6)["caption"] for e in encs]
    answers = svc.query_yes_no_batch(encs, "Yes or No: is this a drill?")
    assert len(answers) == 5
    assert answers == [
        svc.query(e, "Yes or No: is this a drill?")["answer"] == "Yes"
        for e in encs
    ]


def test_batch_vqa_long_question_budgeted(monkeypatch):
    """A filter question long enough to overflow max_seq must be
    truncated by the shared prompt budget in the BATCH path too (it
    crashed prefill's cache update before), and still agree with the
    single-image query()."""
    monkeypatch.setenv("IMATCH_MD_CONFIG", "tiny-md")
    svc = MoondreamJax()
    img = np.random.default_rng(11).integers(0, 256, (32, 32, 3), np.uint8)
    enc = svc.encode_image(img)
    q = "Yes or No: " + "is there a very shiny red cordless drill " * 20
    single = svc.query(enc, q)["answer"]
    batch = svc.query_yes_no_batch([enc, enc, enc], q)
    assert batch == [single == "Yes"] * 3
    caps = svc.caption_batch([enc], max_new=4)  # caption path budgeted too
    assert len(caps) == 1


def test_encode_batch_mixed_geometry_one_dispatch(monkeypatch):
    """_preprocess maps every geometry to one (S, S, 3) shape, so a
    mixed-size batch within the chunk must be ONE device dispatch, not
    one per distinct raw size."""
    monkeypatch.setenv("IMATCH_MD_CONFIG", "tiny-md")
    monkeypatch.setenv("IMATCH_VLM_ENC_CHUNK", "8")
    svc = MoondreamJax()
    calls = []
    orig = svc._encode_fn

    def counting(params, pix):
        calls.append(pix.shape[0])
        return orig(params, pix)

    svc._encode_fn = counting
    rng = np.random.default_rng(12)
    imgs = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for h, w in [(40, 56), (64, 32), (33, 33), (50, 20), (28, 80)]
    ]
    encs = svc.encode_image_batch(imgs)
    assert len(calls) == 1 and calls[0] == 8  # 5 -> pow2 pad to 8
    for im, e in zip(imgs, encs):
        np.testing.assert_allclose(
            e["features"],
            svc.encode_image(im)["features"],
            rtol=2e-4,
            atol=2e-5,
        )


def test_cachefree_prefill_matches_cached(md):
    """use_cache=False must produce byte-identical prefill logits to the
    cached path (same masked-softmax math over the same K/V) — it is
    the VQA fast path's memory-ceiling fix, not an approximation."""
    from imatch_tpu.models.moondream.generate import prefill

    cfg, params = TINY_MD, md
    feats = jax.random.normal(
        jax.random.key(21), (3, cfg.vision.num_patches, cfg.text.hidden_size)
    )
    tokens = jnp.asarray(
        [[1, 5, 9], [3, 7, 4], [2, 2, 8]], jnp.int32
    ) % cfg.text.vocab_size
    l_cached, cache, pos = prefill(params, cfg, feats, tokens, max_new=1)
    l_free, no_cache, pos2 = prefill(
        params, cfg, feats, tokens, use_cache=False
    )
    assert no_cache is None
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos2))
    np.testing.assert_allclose(
        np.asarray(l_cached), np.asarray(l_free), rtol=1e-6, atol=1e-6
    )


def test_int8_kv_cache_decode_close(md):
    """IMATCH_MD_CACHE=int8: per-slot-quantized KV cache must track the
    fp cache closely — the first decode step's logits agree to high
    cosine and generation runs to completion."""
    from imatch_tpu.models.moondream.generate import (
        greedy_generate,
        prefill,
    )

    cfg, params = TINY_MD, md
    feats = jax.random.normal(
        jax.random.key(31), (2, cfg.vision.num_patches, cfg.text.hidden_size)
    )
    tokens = jnp.asarray([[1, 5, 9, 2], [3, 7, 4, 8]], jnp.int32)
    l_f, cache_f, pos = prefill(params, cfg, feats, tokens, max_new=8)
    l_q, cache_q, _ = prefill(
        params, cfg, feats, tokens, max_new=8, cache_dtype=jnp.int8
    )
    assert cache_q.k.dtype == jnp.int8 and cache_q.ks is not None
    np.testing.assert_allclose(
        np.asarray(l_f), np.asarray(l_q), rtol=1e-5, atol=1e-5
    )  # prefill logits identical (cache not consumed yet)

    from imatch_tpu.models.moondream.model import (
        decoder_forward,
        embed_tokens,
        lm_logits,
    )

    nxt = jnp.argmax(l_f, axis=-1).astype(jnp.int32)[:, None]
    emb = embed_tokens(params, nxt)
    h_f, _ = decoder_forward(params, emb, cache_f, pos, cfg)
    h_q, _ = decoder_forward(params, emb, cache_q, pos, cfg)
    a = np.asarray(lm_logits(params, h_f, cfg)[:, 0], np.float64)
    b = np.asarray(lm_logits(params, h_q, cfg)[:, 0], np.float64)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() >= 0.999, cos

    out = greedy_generate(params, cfg, l_q, cache_q, pos, max_new=8)
    assert out.tokens.shape == (2, 8)


def test_segmented_decode_matches_monolithic(md):
    """gen_segment composes to exactly greedy_generate (same step body,
    same EOS masking), for every segment size including ones that
    overshoot max_new — the serving path splits caption decode into
    bounded dispatches so searches can slot between them."""
    from imatch_tpu.models.moondream.generate import (
        finish_gen,
        gen_segment,
        init_gen_state,
    )

    cfg = TINY_MD
    rng = np.random.default_rng(3)
    feats = jnp.asarray(
        rng.standard_normal((2, cfg.vision.num_patches, cfg.text.hidden_size)),
        jnp.float32,
    )
    tokens = jnp.asarray(rng.integers(0, 256, (2, 5)), jnp.int32)
    logits, cache, pos = prefill(md, cfg, feats, tokens, max_new=11)
    ref = greedy_generate(md, cfg, logits, cache, pos, max_new=11)
    for seg in (1, 3, 4, 11, 16):
        state = init_gen_state(cfg, logits, cache, pos, max_new=11)
        for _ in range(-(-11 // seg)):
            state = gen_segment(md, cfg, state, steps=seg, max_new=11)
        got = finish_gen(state, eos=cfg.text.eos_token_id, max_new=11)
        np.testing.assert_array_equal(
            np.asarray(got.tokens), np.asarray(ref.tokens), err_msg=f"seg={seg}"
        )
        np.testing.assert_array_equal(
            np.asarray(got.lengths), np.asarray(ref.lengths)
        )


def test_caption_batch_segmented_matches(monkeypatch):
    """The runtime's segmented caption driver (IMATCH_MD_SEG) returns
    the same captions as the monolithic dispatch."""
    monkeypatch.setenv("IMATCH_MD_CONFIG", "tiny-md")
    monkeypatch.setenv("IMATCH_MD_SEG", "0")
    m = MoondreamJax(config="tiny-md")
    rng = np.random.default_rng(9)
    imgs = [
        rng.integers(0, 255, (40 + 8 * i, 52, 3), dtype=np.uint8)
        for i in range(3)
    ]
    encs = m.encode_image_batch(imgs)
    mono = m.caption_batch(encs, max_new=10)
    monkeypatch.setenv("IMATCH_MD_SEG", "4")
    segd = m.caption_batch(encs, max_new=10)
    assert segd == mono


def test_priority_gate_orders_bulk_behind_search():
    """Bulk checkpoints park while a priority section is open, resume
    after it closes, and are free when uncontended."""
    import threading
    import time as _t

    from imatch_tpu.runtime.scheduler import PriorityGate

    gate = PriorityGate()
    assert gate.checkpoint() is False  # uncontended: no wait

    order = []
    release = threading.Event()
    entered = threading.Event()

    def search():
        with gate.priority():
            entered.set()
            release.wait(2.0)
            order.append("search")

    def bulk():
        entered.wait(2.0)
        gate.checkpoint(timeout=5.0)
        order.append("bulk")

    ts, tb = threading.Thread(target=search), threading.Thread(target=bulk)
    ts.start(), tb.start()
    _t.sleep(0.15)  # bulk is parked at the checkpoint now
    assert order == []
    release.set()
    ts.join(3.0), tb.join(3.0)
    assert order == ["search", "bulk"]


def test_w8a8_prefill_close_to_weight_only(md):
    """act_quant=True (W8A8 prefill, IMATCH_MD_ACT=int8): int8
    activation x int8 weight contractions track the weight-only int8
    path — prefill logits cosine stays high on random init (a scale or
    layout bug collapses it), the VQA decision matches, and the
    cache-free and cache-building variants agree with each other."""
    from imatch_tpu.models.moondream.model import (
        pack_text_layers,
        quantize_int8,
    )

    cfg = TINY_MD
    feats = jax.random.normal(
        jax.random.key(11),
        (2, cfg.vision.num_patches, cfg.text.hidden_size),
    )
    tokens = jnp.asarray([[1, 5, 9, 2], [3, 7, 4, 8]], jnp.int32)
    for tree in (quantize_int8(md), quantize_int8(pack_text_layers(md))):
        l_w, _, _ = prefill(tree, cfg, feats, tokens)
        l_aq, _, _ = prefill(tree, cfg, feats, tokens, act_quant=True)
        a = np.asarray(l_w, np.float64)
        b = np.asarray(l_aq, np.float64)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert cos.min() >= 0.99, cos
        # cache-free (VQA) and cache-building prefill agree under W8A8
        l_nc, _, _ = prefill(
            tree, cfg, feats, tokens, use_cache=False, act_quant=True
        )
        np.testing.assert_allclose(
            np.asarray(l_aq), np.asarray(l_nc), rtol=2e-4, atol=2e-4
        )
        v_w = vqa_yes_no(tree, cfg, feats, tokens, (1,), (2,))
        v_aq = vqa_yes_no(
            tree, cfg, feats, tokens, (1,), (2,), act_quant=True
        )
        np.testing.assert_array_equal(np.asarray(v_w), np.asarray(v_aq))


def test_md_act_env_gating(monkeypatch):
    """IMATCH_MD_ACT=int8 requires IMATCH_MD_QUANT=int8 and rejects
    unknown values; with both set the runtime's VQA path runs W8A8."""
    monkeypatch.setenv("IMATCH_MD_ACT", "int8")
    monkeypatch.delenv("IMATCH_MD_QUANT", raising=False)
    with pytest.raises(ValueError):
        MoondreamJax(config="tiny-md")
    monkeypatch.setenv("IMATCH_MD_ACT", "fp4")
    with pytest.raises(ValueError):
        MoondreamJax(config="tiny-md")
    monkeypatch.setenv("IMATCH_MD_ACT", "int8")
    monkeypatch.setenv("IMATCH_MD_QUANT", "int8")
    m = MoondreamJax(config="tiny-md")
    assert m.act_quant
    img = np.full((24, 30, 3), 128, np.uint8)
    enc = m.encode_image(img)
    out = m.query(enc, "Yes or No: is it gray?")
    assert out["answer"] in ("Yes", "No")
    cap = m.caption(enc)
    assert isinstance(cap["caption"], str)
