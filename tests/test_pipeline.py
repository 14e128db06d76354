"""End-to-end pipeline tests on the reference drill corpus: ingest,
dedup, search semantics, persistence, reset. Runs with the TINY CLIP
config + deterministic random weights (no checkpoint offline), so checks
are mechanical (self-similarity, ordering, contracts), not semantic."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from imatch_tpu.models.clip.configs import TINY
from imatch_tpu.pipeline.captioner import NullCaptioner
from imatch_tpu.pipeline.embedder import ClipEmbedder
from imatch_tpu.pipeline.ingest import process_batch, process_image
from imatch_tpu.pipeline.search import (
    combine_embeddings,
    get_all_images_with_limit,
    search_by_image,
    search_by_text,
    search_multimodal,
    search_similar,
)
from imatch_tpu.pipeline.state import AppState

CORPUS = "/root/reference/images"


@pytest.fixture(scope="module")
def embedder():
    return ClipEmbedder(config=TINY)


@pytest.fixture()
def state(tmp_path, embedder):
    return AppState(
        root=str(tmp_path), embedder=embedder, captioner=NullCaptioner()
    )


def corpus_images():
    for f in sorted(os.listdir(CORPUS)):
        yield f, Image.open(os.path.join(CORPUS, f)).convert("RGB")


def test_ingest_and_dedup(state):
    name, img = next(corpus_images())
    md, is_new = process_image(state, img, name)
    assert is_new
    assert md["id"].startswith("img_")
    assert md["description"] == os.path.splitext(name)[0]
    assert os.path.exists(md["processed_url"])
    # duplicate upload short-circuits
    md2, is_new2 = process_image(state, img, "other name.jpg")
    assert not is_new2
    assert md2["id"] == md["id"]
    assert state.store.count() == 1


def test_batch_ingest_and_search(state):
    items = list(corpus_images())
    results = process_batch(
        state, [im for _, im in items], [n for n, _ in items]
    )
    assert all(r["status"] == "success" for r in results)
    assert state.store.count() == len(items)

    # re-ingest: everything skipped as duplicate
    results2 = process_batch(
        state, [im for _, im in items], [n for n, _ in items]
    )
    assert all(r["status"] == "skipped" for r in results2)

    # image search: the query image ranks itself first with sim ~1
    name0, img0 = items[0]
    hits = search_by_image(state, img0, limit=3)
    assert hits[0]["filename"] == name0
    assert hits[0]["similarity_score"] > 0.999
    # v2 similarity mapping bounds
    assert all(0 <= h["similarity_score"] <= 1.0000001 for h in hits)

    # limit semantics: 0 means all
    assert len(search_by_image(state, img0, limit=0)) == len(items)
    assert len(search_by_image(state, img0, limit=2)) == 2

    # text search runs end-to-end and returns scored hits
    hits = search_by_text(state, "a red drill", limit=5)
    assert len(hits) == 5
    d = [h["similarity_score"] for h in hits]
    assert d == sorted(d, reverse=True)


def test_multimodal_blend_math():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    c = combine_embeddings(a, b, 1.0)
    np.testing.assert_allclose(c, a / np.linalg.norm(a), atol=1e-6)
    c = combine_embeddings(a, b, 0.0)
    np.testing.assert_allclose(c, b / np.linalg.norm(b), atol=1e-6)
    assert abs(np.linalg.norm(combine_embeddings(a, b, 0.3)) - 1) < 1e-6


def test_multimodal_search(state):
    items = list(corpus_images())[:3]
    process_batch(state, [im for _, im in items], [n for n, _ in items])
    hits = search_multimodal(state, items[1][1], "drill", weight_image=1.0, limit=1)
    assert hits[0]["filename"] == items[1][0]


def test_get_all_images_newest_first(state):
    items = list(corpus_images())[:3]
    for n, im in items:
        process_image(state, im, n)
    lst = get_all_images_with_limit(state, limit=2)
    assert len(lst) == 2
    created = [m["created_at"] for m in lst]
    assert created == sorted(created, reverse=True)
    assert len(get_all_images_with_limit(state, limit=0)) == 3


def test_persistence_roundtrip(tmp_path, embedder):
    state = AppState(root=str(tmp_path), embedder=embedder, captioner=NullCaptioner())
    items = list(corpus_images())[:2]
    process_batch(state, [im for _, im in items], [n for n, _ in items])
    state.snapshot()

    state2 = AppState(root=str(tmp_path), embedder=embedder, captioner=NullCaptioner())
    assert state2.store.count() == 2
    assert len(state2.image_metadata) == 2
    hits = search_by_image(state2, items[0][1], limit=1)
    assert hits[0]["filename"] == items[0][0]


def test_reset(state):
    items = list(corpus_images())[:2]
    process_batch(state, [im for _, im in items], [n for n, _ in items])
    state.save_filters(["is it red?"])
    state.reset()
    assert state.store.count() == 0
    assert state.image_metadata == {}
    assert state.load_filters() == []
    assert os.listdir(state.processed_dir) == []


def test_process_batch_applies_existing_filters_and_batched_captions(tmp_path):
    """Batch ingest must apply saved filters to new images (single-upload
    parity, main.py:707-731) through the batched captioner paths."""
    import json as _json

    from imatch_tpu.models.moondream.runtime import MoondreamJax
    from imatch_tpu.pipeline.ingest import process_batch
    from PIL import Image as _Image

    os.environ["IMATCH_MD_CONFIG"] = "tiny-md"
    state = AppState(
        root=str(tmp_path),
        embedder=ClipEmbedder(config="tiny"),
        captioner=MoondreamJax(config="tiny-md"),
    )
    state.save_filters(["is it red"])
    rng = np.random.default_rng(0)
    imgs = [
        _Image.fromarray(
            rng.integers(0, 256, (32 + 4 * i, 40, 3), np.uint8)
        )
        for i in range(3)
    ]
    results = process_batch(state, imgs, [f"f{i}.png" for i in range(3)])
    assert all(r["status"] == "success" for r in results)
    for r in results:
        md = r["metadata"]
        fr = _json.loads(md["filter_results_json"])
        assert fr["is it red"] in ("Yes", "No")
        assert isinstance(md["custom_metadata"], str)


def test_embedder_int8_quant_mode(monkeypatch):
    """IMATCH_EMBED_QUANT=int8 (W8A8 image tower): embeddings stay
    close to the bf16/fp32 path (unit-norm, high cosine), the fused
    bulk-ingest step runs through the quantized tower, and text
    embeddings are BIT-identical (the text tower is untouched)."""
    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 256, (40 + 4 * i, 48, 3), np.uint8) for i in range(4)
    ]
    texts = ["a red drill", "blue sky"]
    base = ClipEmbedder(config="tiny")
    monkeypatch.setenv("IMATCH_EMBED_QUANT", "int8")
    q = ClipEmbedder(config="tiny")
    assert q.quant == "int8"

    e_base = base.embed_images(imgs)
    e_q = q.embed_images(imgs)
    np.testing.assert_allclose(
        np.linalg.norm(e_q, axis=-1), 1.0, rtol=1e-4
    )
    cos = np.sum(e_base * e_q, axis=-1)
    assert cos.min() > 0.98, cos

    # fused path (ids_and_embed_images: pHash + embed in one dispatch)
    ids_b, emb_b = base.ids_and_embed_images(imgs)
    ids_q, emb_q = q.ids_and_embed_images(imgs)
    assert ids_b == ids_q  # pHash ids are quant-independent
    cos = np.sum(emb_b * emb_q, axis=-1)
    assert cos.min() > 0.98, cos

    np.testing.assert_array_equal(
        base.embed_texts(texts), q.embed_texts(texts)
    )

    # DP + quant compose: replicated qvision, sharded batch
    import jax

    if len(jax.devices()) >= 8:
        q8 = ClipEmbedder(config="tiny", data_parallel=8)
        np.testing.assert_allclose(
            q8.embed_images(imgs), e_q, rtol=2e-5, atol=2e-6
        )

    monkeypatch.setenv("IMATCH_EMBED_QUANT", "fp7")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ClipEmbedder(config="tiny")


def test_embedder_data_parallel_matches_single():
    """DP-sharded embedding == single-device embedding (8 virtual devs),
    including the batch-padding path (batch not divisible by dp)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 256, (30 + i, 40, 3), np.uint8) for i in range(5)
    ]
    texts = ["a red drill", "blue sky", "cat"]
    e1 = ClipEmbedder(config="tiny")
    e8 = ClipEmbedder(config="tiny", data_parallel=8)
    assert e8.dp == 8
    np.testing.assert_allclose(
        e8.embed_images(imgs), e1.embed_images(imgs), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        e8.embed_texts(texts), e1.embed_texts(texts), rtol=2e-5, atol=2e-6
    )


def test_embed_images_device_pixel_budget_chunks(monkeypatch):
    """embed_images_device must return identical embeddings whether the
    batch fits one preprocess dispatch or is split by the source-pixel
    budget (the HBM bound for arbitrary-resolution query batches)."""
    e = ClipEmbedder(config="tiny")
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 256, (h, w, 3), np.uint8)
        for h, w in [(40, 40), (64, 48), (40, 40), (100, 80), (64, 48)]
    ]
    whole = np.asarray(e.embed_images_device(imgs))
    # budget below the largest single image: every image becomes its own
    # chunk (the loop must still make progress on oversized frames)
    monkeypatch.setenv("IMATCH_QUERY_PIXEL_BUDGET", "1000")
    chunked = np.asarray(e.embed_images_device(imgs))
    np.testing.assert_allclose(chunked, whole, rtol=2e-5, atol=2e-6)
    assert whole.shape == (5, e.dim)


def test_text_embedding_pools_at_eos_with_folded_vocab():
    """Byte-fallback tokenizer vocab (514) > tiny model vocab (99): ids are
    folded, eos stays unique, and texts sharing a PREFIX but differing
    later must still embed differently (pooling at eos, not position 0)."""
    e = ClipEmbedder(config="tiny")
    assert e._fold_vocab and e._model_eos == e.cfg.text.vocab_size - 1
    # short texts (tiny context is 16 tokens): same first token, different
    # second -> embeddings must differ (pooled at eos, not position 0)
    a, b = e.embed_texts(["ab", "ax"])
    assert not np.allclose(a, b)
    # eos id must be unique after folding: no regular token aliases it
    toks = np.asarray(e.tokenizer.encode_batch(["ab", "ax"], max_length=16))
    folded = np.where(
        toks == e.tokenizer.eos_id,
        e._model_eos,
        toks % (e.cfg.text.vocab_size - 1),
    )
    body = folded[toks != e.tokenizer.eos_id]
    assert (body != e._model_eos).all()


def test_upload_dup_race_returns_duplicate(tmp_path):
    """If another thread adds the same id between the dup check and
    store.add, process_image must return (metadata, False), not raise."""
    from PIL import Image as _Image
    from imatch_tpu.pipeline.ingest import process_image

    state = AppState(
        root=str(tmp_path), embedder=ClipEmbedder(config="tiny"),
        captioner=NullCaptioner(),
    )
    img = _Image.fromarray(
        np.random.default_rng(9).integers(0, 256, (28, 28, 3), np.uint8)
    )
    real_get = state.store.get
    calls = {"n": 0}

    def racy_get(ids=None, include=("metadatas", "documents")):
        calls["n"] += 1
        if calls["n"] == 2:
            # second upload's dup check: pretend the id isn't there yet
            return {"ids": [], "metadatas": []}
        return real_get(ids=ids, include=include)

    md1, new1 = process_image(state, img, "a.png")
    assert new1
    state.store.get = racy_get
    try:
        md2, new2 = process_image(state, img, "a.png")
    finally:
        state.store.get = real_get
    assert not new2 and md2["id"] == md1["id"]


def test_batch_dup_race_keeps_survivor_metadata(state):
    """A batch row reclassified as skipped in the dup-race fallback must
    not overwrite the surviving image's in-memory metadata."""
    img = Image.fromarray(
        np.random.default_rng(11).integers(0, 256, (30, 30, 3), np.uint8)
    )
    md1, new1 = process_image(state, img, "win.png", description="original")
    assert new1 and md1["description"] == "original"

    real_get = state.store.get

    def blind_get(ids=None, include=("metadatas", "documents")):
        # pretend the dup check sees nothing (simulates the race window)
        if include == [] or list(include) == []:
            return {"ids": []}
        return real_get(ids=ids, include=include)

    state.store.get = blind_get
    try:
        results = process_batch(state, [img], ["lose.png"])
    finally:
        state.store.get = real_get
    assert results[0]["status"] == "skipped"
    assert state.image_metadata[md1["id"]]["description"] == "original"


def test_fused_ids_and_embeddings_match_separate_paths():
    """The fused ingest step (one device upload -> pHash + embedding)
    must produce ids bit-identical to the host hash and embeddings
    identical to embed_images, across device buckets and host fallback."""
    from imatch_tpu.ops.phash import image_id as host_image_id

    emb = ClipEmbedder(config=TINY)
    rng = np.random.default_rng(11)
    images = [rng.integers(0, 256, (96, 80, 3), np.uint8) for _ in range(9)]
    images.append(rng.integers(0, 256, (50, 64, 3), np.uint8))  # host bucket
    images.append(None)  # failed decode hole
    ids, vecs = emb.ids_and_embed_images(images)
    assert ids[-1] is None and not vecs[-1].any()
    live = [im for im in images if im is not None]
    ref_vecs = emb.embed_images(live)
    j = 0
    for i, im in enumerate(images):
        if im is None:
            continue
        assert ids[i] == host_image_id(Image.fromarray(im))
        np.testing.assert_allclose(vecs[i], ref_vecs[j], atol=2e-6)
        j += 1


def test_process_batch_fused_equals_serial(state):
    """process_batch (fused path) and process_image must agree on ids
    and produce search-identical embeddings."""
    rng = np.random.default_rng(12)
    arrays = [rng.integers(0, 256, (64, 64, 3), np.uint8) for _ in range(10)]
    images = [Image.fromarray(a) for a in arrays]
    results = process_batch(state, images, [f"f{i}.png" for i in range(10)])
    assert all(r["status"] == "success" for r in results)
    # a re-upload of the same images via the serial path dedups 10/10
    for i, a in enumerate(arrays):
        md, is_new = process_image(state, Image.fromarray(a), f"g{i}.png")
        assert not is_new
        assert md["id"] == results[i]["id"]


@pytest.mark.parametrize("odd_tail", [False, True])
def test_process_batch_device_ingest_matches_host(
    tmp_path, embedder, monkeypatch, odd_tail
):
    """IMATCH_DEVICE_INGEST=1 (throughput profile): the fused stream
    yields device-resident embeddings and store.add scatters them d2d
    (index/patch.py) — ids, store state, and search answers must be
    identical to the host path. With an odd-geometry tail the batch
    mixes device chunks and host rows (the small-bucket fallback) and
    must materialize cleanly; the post-response flush leaves no
    deferred host syncs (durability unchanged)."""
    rng = np.random.default_rng(7)
    images = [
        Image.fromarray(rng.integers(0, 256, (64, 48, 3), np.uint8))
        for _ in range(10)
    ]
    if odd_tail:
        images.append(
            Image.fromarray(rng.integers(0, 256, (40, 32, 3), np.uint8))
        )
    names = [f"f{i}.png" for i in range(len(images))]

    def run(dev):
        monkeypatch.setenv("IMATCH_DEVICE_INGEST", "1" if dev else "0")
        st = AppState(
            root=str(tmp_path / ("dev" if dev else "host")),
            embedder=embedder,
            captioner=NullCaptioner(),
        )
        res = process_batch(st, images, names)
        assert all(r["status"] == "success" for r in res)
        hits = search_by_text(st, "anything", limit=len(images))
        return st, res, hits

    st_d, res_d, hits_d = run(True)
    st_h, res_h, hits_h = run(False)
    assert [r["id"] for r in res_d] == [r["id"] for r in res_h]
    assert st_d.store.count() == st_h.store.count() == len(images)
    assert [h["id"] for h in hits_d] == [h["id"] for h in hits_h]
    np.testing.assert_allclose(
        [h["similarity_score"] for h in hits_d],
        [h["similarity_score"] for h in hits_h],
        atol=1e-5,
    )
    # IMATCH_DEVICE_INGEST_FLUSH default: drained before the response
    assert st_d.store.stats()["pending_host_syncs"] == 0
    # restart from disk sees every row (journal/snapshot complete)
    reloaded = st_d.store.load(st_d.store.persist_dir)
    assert reloaded.count() == len(images)


def test_chunk_bounds_divisible_by_any_dp():
    """Padded device batches must be divisible by the dp mesh for ANY
    dp (sharding over 'data' requires batch % dp == 0), including
    non-power-of-two meshes — and still reuse pow2-bucketed compile
    variants."""
    from imatch_tpu.pipeline.embedder import ClipEmbedder

    for dp in (1, 2, 3, 5, 6, 8):
        e = ClipEmbedder.__new__(ClipEmbedder)
        e.dp = dp
        seen = set()
        for n in (1, 5, 7, 64, 513, 1000):
            for s, b, bp in e._chunk_bounds(n, 512):
                assert bp % dp == 0, (dp, n, bp)
                assert bp >= b
                seen.add(bp)
        assert len(seen) <= 12  # bounded compile-variant count


def test_process_batch_survives_batched_hash_failure(tmp_path, monkeypatch):
    """If the fused batch hash/embed dies whole (device error), the
    folder upload must degrade to per-image processing instead of
    500ing — the reference's per-file isolation contract
    (main.py:1180-1187)."""
    from PIL import Image

    from imatch_tpu.models.clip.configs import TINY
    from imatch_tpu.pipeline.captioner import NullCaptioner
    from imatch_tpu.pipeline.embedder import ClipEmbedder
    from imatch_tpu.pipeline.ingest import process_batch
    from imatch_tpu.pipeline.state import AppState

    state = AppState(
        root=str(tmp_path),
        embedder=ClipEmbedder(config=TINY),
        captioner=NullCaptioner(),
    )

    def boom(*a, **k):
        raise RuntimeError("simulated device failure")

    monkeypatch.setattr(
        state.get_embedder(), "ids_and_embed_images_stream", boom
    )
    rng = np.random.default_rng(3)
    imgs = [
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), np.uint8))
        for _ in range(3)
    ]
    results = process_batch(state, imgs, ["a.png", "b.png", "c.png"])
    assert [r["status"] for r in results] == ["success"] * 3
    assert state.store.count() == 3


def test_process_batch_survives_midstream_failure(tmp_path, monkeypatch):
    """The pipelined stream dying AFTER yielding some chunks must keep
    the already-streamed results and degrade only the tail to the host
    fallback — per-file isolation, not all-or-nothing."""
    from PIL import Image

    from imatch_tpu.models.clip.configs import TINY
    from imatch_tpu.pipeline.captioner import NullCaptioner
    from imatch_tpu.pipeline.embedder import ClipEmbedder
    from imatch_tpu.pipeline.ingest import process_batch
    from imatch_tpu.pipeline.state import AppState

    state = AppState(
        root=str(tmp_path),
        embedder=ClipEmbedder(config=TINY),
        captioner=NullCaptioner(),
    )
    emb = state.get_embedder()
    real = emb.ids_and_embed_images_stream

    def partial_stream(images, pool=None, **kw):
        it = real(images, pool=pool, **kw)
        yield next(it)  # first chunk lands
        raise RuntimeError("simulated mid-stream device failure")

    monkeypatch.setattr(emb, "ids_and_embed_images_stream", partial_stream)
    # two geometry buckets so the stream yields at least once before dying
    rng = np.random.default_rng(4)
    imgs = [
        Image.fromarray(rng.integers(0, 256, (sz, sz, 3), np.uint8))
        for sz in (40, 40, 40, 40, 48, 48, 48, 48)
    ]
    names = [f"f{i}.png" for i in range(len(imgs))]
    results = process_batch(state, imgs, names)
    assert [r["status"] for r in results] == ["success"] * len(imgs)
    assert state.store.count() == len(imgs)
    # every processed PNG landed (saves submitted in both phases)
    import os

    for r in results:
        assert os.path.exists(
            os.path.join(state.processed_dir, f"{r['id']}.png")
        )


def test_text_query_embedding_cache(monkeypatch):
    """Repeated query texts are served from the embedder LRU — no
    second tokenizer/tower dispatch — and cached results are identical
    to fresh embeds. Eviction respects IMATCH_TEXT_CACHE."""
    e = ClipEmbedder(config=TINY)
    calls = {"n": 0}
    orig = e._embed_tokens

    def counting(tokens):
        calls["n"] += 1
        return orig(tokens)

    e._embed_tokens = counting
    a = np.asarray(e.embed_text_device("a red drill"))
    b = np.asarray(e.embed_text_device("a red drill"))
    np.testing.assert_array_equal(a, b)
    assert calls["n"] == 1  # second call was a cache hit
    fresh = np.asarray(e.embed_texts(["a red drill"])[0])
    np.testing.assert_allclose(a, fresh, atol=1e-6)

    # capacity 2: third distinct text evicts the oldest
    monkeypatch.setenv("IMATCH_TEXT_CACHE", "2")
    e2 = ClipEmbedder(config=TINY)
    e2._embed_tokens = counting
    calls["n"] = 0
    for t in ("q1", "q2", "q3"):
        e2.embed_text_device(t)
    assert calls["n"] == 3
    e2.embed_text_device("q3")  # hit
    assert calls["n"] == 3
    e2.embed_text_device("q1")  # evicted -> re-embeds
    assert calls["n"] == 4

    # 0 disables caching entirely
    monkeypatch.setenv("IMATCH_TEXT_CACHE", "0")
    e3 = ClipEmbedder(config=TINY)
    e3._embed_tokens = counting
    calls["n"] = 0
    e3.embed_text_device("same")
    e3.embed_text_device("same")
    assert calls["n"] == 2


def _jpeg_with_orientation(arr, orientation):
    import io as _io

    ex = Image.Exif()
    ex[0x0112] = orientation
    b = _io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", exif=ex)
    return b.getvalue()


def test_save_original_rejects_exif_rotation_and_animation(state):
    """IMATCH_SAVE_ORIGINAL stores raw bytes only when they render
    identically to the decoded frame: EXIF-rotated JPEGs (browsers
    auto-rotate raw files; the hashed/embedded array — and the
    reference's re-encoded PNG — are unrotated) and animated GIFs
    (only frame 1 was embedded) must fall back to PNG re-encode."""
    import io as _io

    rng = np.random.default_rng(31)
    a1 = rng.integers(0, 256, (40, 56, 3), np.uint8)
    rot = _jpeg_with_orientation(a1, 6)
    a2 = rng.integers(0, 256, (40, 56, 3), np.uint8)
    plain = _jpeg_with_orientation(a2, 1)
    f1, f2 = Image.open(_io.BytesIO(rot)), Image.open(_io.BytesIO(plain))
    res = process_batch(
        state,
        [np.asarray(f1.convert("RGB")), np.asarray(f2.convert("RGB"))],
        ["rotated.jpg", "plain.jpg"],
        raw_bytes=[rot, plain],
    )
    assert [r["status"] for r in res] == ["success", "success"]
    # EXIF-rotated -> re-encoded PNG; orientation-1 -> raw bytes kept
    assert res[0]["metadata"]["url"].endswith(".png")
    assert res[1]["metadata"]["url"].endswith(".jpg")

    # animated GIF -> PNG
    frames = [
        Image.fromarray(rng.integers(0, 256, (24, 24, 3), np.uint8))
        for _ in range(3)
    ]
    b = _io.BytesIO()
    frames[0].save(b, "GIF", save_all=True, append_images=frames[1:])
    gif = b.getvalue()
    first = np.asarray(Image.open(_io.BytesIO(gif)).convert("RGB"))
    res = process_batch(state, [first], ["anim.gif"], raw_bytes=[gif])
    assert res[0]["status"] == "success"
    assert res[0]["metadata"]["url"].endswith(".png")


def test_add_collision_loser_file_reaped(state, monkeypatch):
    """An in-flight collision (another request inserted the id between
    our dup check and store.add) reclassifies the loser as skipped —
    and its already-written processed file must not be left orphaned."""
    rng = np.random.default_rng(33)
    a1 = rng.integers(0, 256, (40, 56, 3), np.uint8)
    a2 = rng.integers(0, 256, (48, 64, 3), np.uint8)

    orig_add = state.store.add
    calls = {"n": 0}

    def racy_add(ids, **kw):
        calls["n"] += 1
        if calls["n"] == 1 and len(ids) > 1:
            raise ValueError("simulated concurrent insert")
        if calls["n"] == 3:  # second per-id retry: the loser
            raise ValueError(f"duplicate id {ids[0]}")
        return orig_add(ids=ids, **kw)

    monkeypatch.setattr(state.store, "add", racy_add)
    res = process_batch(state, [a1, a2], ["w.png", "l.png"])
    statuses = sorted(r["status"] for r in res)
    assert statuses == ["skipped", "success"]
    winner = next(r for r in res if r["status"] == "success")
    loser = next(r for r in res if r["status"] == "skipped")
    assert os.path.exists(winner["metadata"]["processed_url"])
    loser_path = os.path.join(
        state.processed_dir, f"{loser['id']}.png"
    )
    assert not os.path.exists(loser_path), "orphan file left behind"


def test_embedder_int8_strips_master_dense_weights(monkeypatch):
    """IMATCH_EMBED_QUANT=int8 must not keep the dead fp32 encoder
    matrices resident next to the int8 copies (at ViT-L/14 that is
    ~1.2 GB of HBM the capacity profile cannot afford)."""
    monkeypatch.setenv("IMATCH_EMBED_QUANT", "int8")
    q = ClipEmbedder(config="tiny")
    layers = q.params["vision"]["layers"]
    assert set(layers["attn"]) == {"bq", "bk", "bv", "bo"}
    assert set(layers["mlp"]) == {"b1", "b2"}
    assert q._qvision["attn"]["wq"]["q"].dtype.name == "int8"
