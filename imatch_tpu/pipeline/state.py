"""Application state — the reference's module globals, made explicit.

Reference: /root/reference/backend/app/main.py:66-120,522-579 (dirs,
Moondream init, startup hydration of ``image_metadata`` from the
collection) and :1058-1098 (``reset_system``). State is an object so tests
can build isolated instances; the single-process mutation model is guarded
with an RLock instead of relying on one uvicorn worker.
"""

from __future__ import annotations

import logging
import os
import shutil
import threading
from typing import Dict, Optional

from imatch_tpu.index.store import VectorStore
from imatch_tpu.pipeline import filters as filters_mod
from imatch_tpu.pipeline.captioner import get_captioner
from imatch_tpu.pipeline.embedder import ClipEmbedder

logger = logging.getLogger("imatch.state")


class AppState:
    def __init__(
        self,
        root: str = ".",
        embedder: Optional[ClipEmbedder] = None,
        captioner=None,
        segmenter=None,
        autoload: bool = True,
    ):
        self.root = os.path.abspath(root)
        self.static_dir = os.path.join(self.root, "static")
        self.uploads_dir = os.path.join(self.static_dir, "uploads")
        self.processed_dir = os.path.join(self.static_dir, "processed")
        self.encoded_dir = os.path.join(self.static_dir, "encoded")
        self.data_dir = os.path.join(
            self.root, os.environ.get("IMATCH_DATA_DIR", "index_data")
        )
        self.filters_file = os.path.join(self.root, "filters.json")
        for d in (
            self.uploads_dir,
            self.processed_dir,
            self.encoded_dir,
            self.data_dir,
        ):
            os.makedirs(d, exist_ok=True)

        self.embedder = embedder
        self.captioner = captioner if captioner is not None else get_captioner()
        if segmenter is None:
            from imatch_tpu.models.u2net.runtime import get_segmenter

            segmenter = get_segmenter()
        self.segmenter = segmenter
        self.lock = threading.RLock()
        self._embedder_lock = threading.Lock()
        self.filter_progress: Dict[str, dict] = {}
        self.image_metadata: Dict[str, dict] = {}
        self.store = (
            VectorStore.load(self.data_dir) if autoload else VectorStore()
        )
        self._hydrate_metadata()

    def get_embedder(self) -> ClipEmbedder:
        """Lazy like the reference's CLIP load (utils.py:28-49).

        Guarded by a DEDICATED lock: holding the global state.lock for a
        checkpoint load (seconds to minutes) would hang every unrelated
        endpoint — /api/images, filter polls — behind the first embed."""
        if self.embedder is None:
            with self._embedder_lock:
                if self.embedder is None:
                    self.embedder = ClipEmbedder()
        return self.embedder

    def _hydrate_metadata(self):
        """load_metadata_from_chromadb equivalent (main.py:550-579)."""
        got = self.store.get(include=["metadatas"])
        for id_, md in zip(got["ids"], got["metadatas"]):
            if md is not None:
                self.image_metadata[id_] = md
        if got["ids"]:
            logger.info("hydrated %d image records", len(got["ids"]))

    # -- filters ------------------------------------------------------------

    def load_filters(self):
        return filters_mod.load_filters(self.filters_file)

    def save_filters(self, filters):
        filters_mod.save_filters(self.filters_file, filters)

    # -- persistence --------------------------------------------------------

    def snapshot(self, force: bool = False):
        """Durability point. Mutations are already journaled per-op
        (store.journal.jsonl); this compacts into a full snapshot when
        the journal has grown (or immediately with force)."""
        self.store.checkpoint(force=force)

    # -- reset --------------------------------------------------------------

    def reset(self):
        """reset_system (main.py:1058-1098): clear collection, wipe
        processed/encoded files, empty filters, clear caches."""
        with self.lock:
            # logical state FIRST (store rows, mirror, filters): if the
            # rmtree below fails mid-way (an in-flight ingest writes
            # files OUTSIDE state.lock and can race directory removal),
            # the API must not be left with an empty store while
            # /api/images still lists every image from a stale mirror
            all_ids = self.store.get(include=[])["ids"]
            if all_ids:
                self.store.delete(all_ids)
            self.image_metadata.clear()
            self.filter_progress.clear()
            self.save_filters([])
            for d in (self.processed_dir, self.encoded_dir, self.uploads_dir):
                if os.path.isdir(d):
                    # ignore_errors: racing file creation from an
                    # in-flight upload must not abort the reset — any
                    # stragglers are orphan files, not logical state
                    shutil.rmtree(d, ignore_errors=True)
                os.makedirs(d, exist_ok=True)
            self.snapshot(force=True)
