"""Standalone index bootstrap — the init_db.py equivalent.

The reference ships init_db.py (/root/reference/init_db.py:1-81): an
idempotent script that creates the persistent ChromaDB collection before
first serve. Here the persistent artifact is the VectorStore snapshot
directory; this script creates (or verifies) it and prints its state.

Usage: python scripts/init_index.py [root_dir]
Env: IMATCH_DATA_DIR (snapshot dir name under root, default index_data).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host-side bootstrap: nothing here needs an accelerator, but the auto
# index engine probes jax.devices() for capacity, which would initialize
# the TPU runtime (and on tunneled/single-client environments can hang
# or fail while the lease is busy). The snapshot artifact this script
# creates is pure host data (npy + json), so pin the process to CPU
# unconditionally — the config knob, not the env var, because this jax
# build's TPU plugin self-registers and ignores JAX_PLATFORMS.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from imatch_tpu.index.store import VectorStore  # noqa: E402


def main() -> int:
    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else ".")
    data_dir = os.path.join(
        root, os.environ.get("IMATCH_DATA_DIR", "index_data")
    )
    existed = os.path.isdir(data_dir) and os.path.exists(
        os.path.join(data_dir, "manifest.json")
    )
    store = VectorStore.load(data_dir)
    if existed:
        print(f"existing index at {data_dir}: {store.count()} records")
    else:
        store.save(data_dir)
        print(f"initialized empty index at {data_dir}")
    for sub in ("static/uploads", "static/processed", "static/encoded"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    print("static dirs ready")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
