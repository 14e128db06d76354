"""Search engine: similarity, text, multimodal, listing.

Reference: /root/reference/backend/app/main.py:748-867,1225-1243.
Similarity mapping is the v2 one: ``1 - distance/2`` (main.py:779-782);
``limit <= 0`` caps at 1000 (main.py:757). The legacy caption-enhanced
multimodal variant (app.py:2583-2691) is exposed as
``enhance_query_with_caption``.
"""

from __future__ import annotations

import logging
from typing import List

import numpy as np
from PIL import Image

from imatch_tpu.pipeline.state import AppState

logger = logging.getLogger("imatch.search")

ALL_LIMIT = 1000


def search_similar(
    state: AppState, embedding, limit: int = 10
) -> List[dict]:
    """Vector search returning metadata dicts with ``similarity_score``.

    ``embedding`` may be a numpy vector or an in-flight jax.Array (the
    one-round-trip text-search path); the store handles both."""
    import jax

    actual_limit = ALL_LIMIT if limit <= 0 else limit
    if isinstance(embedding, jax.Array):
        qe = embedding[None] if embedding.ndim == 1 else embedding
    else:
        qe = [np.asarray(embedding, dtype=np.float32)]
    res = state.store.query(
        query_embeddings=qe,
        n_results=actual_limit,
        include=["metadatas", "distances"],
    )
    if not res["ids"] or not res["ids"][0]:
        return []
    return _result_row(res, 0)


def _result_row(res: dict, qi: int) -> List[dict]:
    """Chroma-shaped query result row ``qi`` -> metadata dicts with
    ``similarity_score`` (the v2 ``1 - distance/2`` mapping)."""
    out = []
    for img_id, md, dist in zip(
        res["ids"][qi], res["metadatas"][qi], res["distances"][qi]
    ):
        md = dict(md or {})
        md["similarity_score"] = 1 - (dist / 2)
        md.setdefault("url", f"/static/processed/{img_id}.png")
        md.setdefault("thumbnail_url", f"/static/processed/{img_id}.png")
        out.append(md)
    return out


def search_by_text(state: AppState, query_text: str, limit: int = 10) -> List[dict]:
    # device-chained: the text tower output feeds the index matmul
    # without a host round-trip in between (one blocking transfer total)
    emb = state.get_embedder().embed_text_device(query_text)
    return search_similar(state, emb, limit)


def search_by_text_batch(
    state: AppState, queries: List[str], limit: int = 10
) -> List[List[dict]]:
    """Batched text search: ONE text-tower dispatch for all Q queries
    chained into ONE index top-k dispatch and ONE blocking transfer, so
    the host<->device round-trip — the measured per-request latency
    floor on tunneled/remote links (docs/DESIGN.md "<10 ms search
    target") — amortizes Q ways. Results per query are identical to Q
    separate ``search_by_text`` calls (pinned in tests/test_api.py).

    The reference has no batched query surface — one hnswlib call per
    request (/root/reference/backend/app/main.py:761); batching is the
    TPU-idiomatic answer because the MXU's tile-max scoring at Q=16
    costs barely more than Q=1."""
    if not queries:
        return []
    embs = state.get_embedder().embed_texts_device(queries)
    actual_limit = ALL_LIMIT if limit <= 0 else limit
    # store.query always returns exactly Q rows (empty lists when the
    # store is empty), so per-row decoding needs no length guard
    res = state.store.query(
        query_embeddings=embs,
        n_results=actual_limit,
        include=["metadatas", "distances"],
    )
    return [_result_row(res, qi) for qi in range(len(queries))]


def search_by_image(
    state: AppState, image: Image.Image, limit: int = 10
) -> List[dict]:
    image = image.convert("RGB") if image.mode != "RGB" else image
    emb = state.get_embedder().embed_image_device(np.asarray(image))
    return search_similar(state, emb, limit)


def search_by_image_batch(
    state: AppState, images: List[Image.Image], limit: int = 10
) -> List[List[dict]]:
    """Batched image search (POST /api/search/image-batch): all N query
    images go through the vision tower in chunked device batches and ONE
    index top-k dispatch + ONE blocking transfer — same round-trip
    amortization as ``search_by_text_batch``, and the tower itself runs
    at batch efficiency instead of N single-image dispatches. Per-row
    results are identical to N separate ``search_by_image`` calls
    (pinned in tests/test_api.py)."""
    if not images:
        return []
    arrays = [
        np.asarray(im.convert("RGB") if im.mode != "RGB" else im)
        for im in images
    ]
    embs = state.get_embedder().embed_images_device(arrays)
    actual_limit = ALL_LIMIT if limit <= 0 else limit
    res = state.store.query(
        query_embeddings=embs,
        n_results=actual_limit,
        include=["metadatas", "distances"],
    )
    return [_result_row(res, qi) for qi in range(len(images))]


def combine_embeddings(image_emb, text_emb, weight_image: float):
    """Normalized weighted blend (main.py:852-860). jnp ops so it serves
    both host numpy arrays and in-flight device arrays (the chained
    multimodal path) from one definition."""
    import jax.numpy as jnp

    i = image_emb / jnp.linalg.norm(image_emb)
    t = text_emb / jnp.linalg.norm(text_emb)
    c = weight_image * i + (1.0 - weight_image) * t
    return c / jnp.linalg.norm(c)


def search_multimodal(
    state: AppState,
    image: Image.Image,
    query_text: str,
    weight_image: float = 0.5,
    limit: int = 10,
) -> List[dict]:
    image = image.convert("RGB") if image.mode != "RGB" else image
    embedder = state.get_embedder()
    # both towers dispatch without materializing; the blend and the index
    # matmul chain on device (one blocking transfer for the whole request)
    img_emb = embedder.embed_image_device(np.asarray(image))
    txt_emb = embedder.embed_text_device(query_text)
    combined = combine_embeddings(img_emb, txt_emb, weight_image)
    return search_similar(state, combined, limit)


def get_all_images_with_limit(state: AppState, limit: int = 10) -> List[dict]:
    """Newest-first listing for empty-query+filters search
    (main.py:1225-1243)."""
    # snapshot under the lock: concurrent ingest inserts while sorted()
    # iterates the live dict raise "dictionary changed size during
    # iteration" and 500 the search
    with state.lock:
        values = list(state.image_metadata.values())
    items = sorted(
        values,
        key=lambda m: m.get("created_at", ""),
        reverse=True,
    )
    if limit > 0:
        items = items[:limit]
    return [dict(md) for md in items]


def enhance_query_with_caption(
    state: AppState,
    image: Image.Image,
    query_text: str,
    max_tokens: int = 248,
    chars_per_token: int = 4,
) -> str:
    """Legacy v1 capability (app.py:2653-2689): caption the QUERY image
    and append as much of the caption as fits the token budget, truncated
    at a word boundary."""
    cap = state.captioner
    if not getattr(cap, "available", False):
        return query_text
    try:
        encoded = cap.encode_image(np.asarray(image.convert("RGB")))
        caption = cap.caption(encoded)["caption"]
    except Exception as e:
        logger.error("caption enhancement failed: %s", e)
        return query_text
    budget_chars = max_tokens * chars_per_token - len(query_text) - 2
    if budget_chars <= 0 or not caption:
        return query_text
    if len(caption) > budget_chars:
        cut = caption[:budget_chars]
        if " " in cut:
            cut = cut.rsplit(" ", 1)[0]
        caption = cut
    return f"{query_text}. {caption}" if query_text else caption
