"""Background filter back-fill job.

Reference: process_filter_on_all_images
(/root/reference/backend/app/main.py:939-1056) — applies a new filter to
every indexed image via the VLM, updating per-image metadata and a
progress dict polled by clients over /api/filter-progress.
"""

from __future__ import annotations

import logging

from imatch_tpu.pipeline.captioner import load_encoded
from imatch_tpu.pipeline.filters import format_filter_query, merge_filter_result
from imatch_tpu.pipeline.state import AppState

logger = logging.getLogger("imatch.backfill")


def process_filter_on_all_images(state: AppState, filter_query: str) -> None:
    try:
        if not getattr(state.captioner, "available", False):
            state.filter_progress[filter_query] = {
                "status": "error",
                "message": "Model not available",
                "progress": 0,
            }
            return

        formatted = format_filter_query(filter_query)
        all_ids = list(state.image_metadata.keys())
        total = len(all_ids)
        state.filter_progress[filter_query] = {
            "status": "processing",
            "progress": 0,
            "current_image": "",
            "processed": 0,
            "total": total,
        }

        for idx, image_id in enumerate(all_ids):
            try:
                state.filter_progress[filter_query] = {
                    "status": "processing",
                    "progress": int(idx / total * 100) if total else 0,
                    "current_image": image_id,
                    "processed": idx,
                    "total": total,
                }
                encoded = load_encoded(state.encoded_dir, image_id)
                if encoded is None:
                    # reference skips images without a cached encoding
                    logger.warning("no encoded image for %s, skipping", image_id)
                    continue
                raw = state.captioner.query(encoded, formatted)["answer"]
                answer = raw.strip() if isinstance(raw, str) else raw
                with state.lock:
                    md = dict(state.image_metadata.get(image_id, {}))
                    md = merge_filter_result(md, filter_query, answer)
                    state.image_metadata[image_id] = md
                    state.store.update(ids=[image_id], metadatas=[md])
            except Exception as e:
                logger.error("filter error for %s: %s", image_id, e)

        state.filter_progress[filter_query] = {
            "status": "completed",
            "progress": 100,
            "processed": total,
            "total": total,
        }
    except Exception as e:
        logger.error("error processing filter: %s", e)
        state.filter_progress[filter_query] = {
            "status": "error",
            "message": str(e),
            "progress": 0,
        }
