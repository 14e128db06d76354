"""Bulk-ingest a directory of images from the command line.

The legacy app exposes /upload-samples to ingest the bundled corpus
(/root/reference/app.py:1190-1281); this CLI generalizes it: point it at
any directory and it runs the full batched pipeline (native C++ decode
pool -> phash dedup -> caption/filters -> optional background removal ->
device-batched CLIP embed -> index add -> snapshot) without a server.

Usage:
  python scripts/ingest_folder.py /path/to/images --root approot \\
      [--batch 64] [--remove-bg] [--captioner null]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger("imatch.ingest_folder")

EXTS = {".jpg", ".jpeg", ".png", ".webp", ".avif", ".bmp", ".gif"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("directory")
    ap.add_argument("--root", default=".", help="app state root")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--remove-bg", action="store_true")
    ap.add_argument(
        "--captioner", default=None, help="override IMATCH_CAPTIONER"
    )
    args = ap.parse_args()

    if args.captioner:
        os.environ["IMATCH_CAPTIONER"] = args.captioner

    from PIL import Image

    from imatch_tpu.pipeline.ingest import process_batch
    from imatch_tpu.pipeline.state import AppState
    from imatch_tpu.runtime.loader import default_loader

    paths = sorted(
        os.path.join(args.directory, f)
        for f in os.listdir(args.directory)
        if os.path.splitext(f)[1].lower() in EXTS
    )
    if not paths:
        logger.error("no images found in %s", args.directory)
        return 2

    state = AppState(root=args.root)
    loader = default_loader()
    totals = {"success": 0, "skipped": 0, "error": 0}
    t0 = time.time()
    for lo in range(0, len(paths), args.batch):
        chunk = paths[lo : lo + args.batch]
        arrays = loader.decode_batch(chunk)  # None entries = failed decode
        images, names = [], []
        for p_, a in zip(chunk, arrays):
            if a is None:
                totals["error"] = totals.get("error", 0) + 1
                logger.error("decode failed: %s", p_)
            else:
                images.append(Image.fromarray(a))
                names.append(os.path.basename(p_))
        results = process_batch(
            state, images, names, remove_bg=args.remove_bg
        )
        for r in results:
            totals[r["status"]] = totals.get(r["status"], 0) + 1
        done = lo + len(chunk)
        rate = done / max(time.time() - t0, 1e-9)
        logger.info(
            "%d/%d (%.1f img/s) ok=%d skip=%d err=%d",
            done,
            len(paths),
            rate,
            totals["success"],
            totals["skipped"],
            totals["error"],
        )
    state.snapshot()
    logger.info(
        "done: %d indexed, %d duplicates, %d errors in %.1fs",
        totals["success"],
        totals["skipped"],
        totals["error"],
        time.time() - t0,
    )
    return 0 if totals["error"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
