"""Captioner/VQA interface — the Moondream slot.

Reference behavior (/root/reference/backend/app/main.py:87-120,587-611):
a Moondream handle exposing ``encode_image`` / ``caption`` / ``query``,
with a degraded mode when unavailable (captioning + filters disabled).

Implementations:
- ``NullCaptioner``  — unavailable (the degraded mode).
- ``MoondreamJax``   — the JAX Moondream-class VLM
  (models/moondream/), selected with IMATCH_CAPTIONER=moondream.

Encoded image representations are cached to ``static/encoded/<id>.npz``
replacing the reference's ``torch.save`` .pt files (main.py:647-651).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


class NullCaptioner:
    """Moondream-unavailable degraded mode."""

    available = False

    def encode_image(self, image: np.ndarray) -> Optional[Any]:
        return None

    def caption(self, encoded: Any) -> Dict[str, str]:
        raise RuntimeError("captioner unavailable")

    def query(self, encoded: Any, question: str) -> Dict[str, str]:
        raise RuntimeError("captioner unavailable")


def save_encoded(path_dir: str, image_id: str, encoded: Any) -> str:
    os.makedirs(path_dir, exist_ok=True)
    path = os.path.join(path_dir, f"{image_id}.npz")
    if isinstance(encoded, dict):
        np.savez(path, **{k: np.asarray(v) for k, v in encoded.items()})
    else:
        np.savez(path, encoded=np.asarray(encoded))
    return path


def load_encoded(path_dir: str, image_id: str) -> Optional[Dict[str, np.ndarray]]:
    path = os.path.join(path_dir, f"{image_id}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def get_captioner():
    """Factory from IMATCH_CAPTIONER env (default: moondream if it can
    initialize, else the null degraded mode — mirroring the reference's
    cloud -> local -> disabled fallback chain, main.py:87-120)."""
    choice = os.environ.get("IMATCH_CAPTIONER", "auto")
    if choice == "null":
        return NullCaptioner()
    try:
        from imatch_tpu.models.moondream.runtime import MoondreamJax

        return MoondreamJax()
    except Exception:
        if choice == "moondream":
            raise
        import logging

        logging.getLogger("imatch.captioner").warning(
            "captioner init failed; captions and filters disabled",
            exc_info=True,
        )
        return NullCaptioner()
