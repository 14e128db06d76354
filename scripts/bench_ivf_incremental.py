"""Incremental-IVF bench: repair vs retrain on a live VectorStore.

Measures what a serving deployment actually pays per ingest batch into
an ANN-tier store: after the initial k-means build, each new batch
invalidates the device index and the next query triggers a rebuild —
round 3 made that rebuild a REPAIR (assign only the new rows against
existing centroids + repack, index/ivf.py) instead of a full Lloyd run.
This script times both paths at scale on one store:

  build_s    — first query after N rows (full k-means + assign + pack)
  repair_s   — first query after adding a small batch (repair path)
  retrain_s  — first query after IMATCH_IVF_REBUILD_FRAC=0 forces the
               old behavior on the same mutation size

Usage: python scripts/bench_ivf_incremental.py [--rows 1000000] [--dim 512]
       [--batch 2048] [--cpu-rows 60000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("IMATCH_WARMUP", "0")

import jax


def _accelerator_alive(timeout_s: float = None) -> bool:
    # kept in sync with bench.py's probe; honors the same env knob
    if timeout_s is None:
        timeout_s = float(os.environ.get("IMATCH_BENCH_PROBE_TIMEOUT", "120"))
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--cpu-rows", type=int, default=60_000)
    args = ap.parse_args()

    if not _accelerator_alive():
        print("[bench] accelerator down — CPU fallback", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    n = args.rows if on_tpu else args.cpu_rows

    import numpy as np

    from imatch_tpu.index.store import VectorStore

    rng = np.random.default_rng(0)
    d = args.dim

    def batch(count, seed):
        r = np.random.default_rng(seed)
        e = r.standard_normal((count, d)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        return e

    emb = batch(n, 1)
    q = emb[:8]

    def timed_first_query(store):
        t0 = time.perf_counter()
        store.query(q, n_results=10)
        return time.perf_counter() - t0

    # leave headroom so the post-build adds never double capacity
    # (capacity growth would legitimately retrain the sharded kind and
    # muddy the single-device comparison with buffer copies)
    store = VectorStore(dim=d, engine="ivf")
    store.add(
        ids=[f"r{i:08d}" for i in range(n)], embeddings=emb
    )
    build_s = timed_first_query(store)
    store.query(q, n_results=10)  # steady-state sanity

    os.environ["IMATCH_IVF_REBUILD_FRAC"] = "0.3"
    store.add(
        ids=[f"x{i:08d}" for i in range(args.batch)],
        embeddings=batch(args.batch, 2),
    )
    repair_s = timed_first_query(store)

    os.environ["IMATCH_IVF_REBUILD_FRAC"] = "0"  # force full retrain
    store.add(
        ids=[f"y{i:08d}" for i in range(args.batch)],
        embeddings=batch(args.batch, 3),
    )
    retrain_s = timed_first_query(store)
    os.environ["IMATCH_IVF_REBUILD_FRAC"] = "0.3"

    # steady-state query cost after repair (the thing repair must not hurt)
    for _ in range(3):
        store.query(q, n_results=10)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        store.query(q, n_results=10)
    query_ms = (time.perf_counter() - t0) / reps * 1000

    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "rows": n,
                "dim": d,
                "mutation_batch": args.batch,
                "initial_build_s": round(build_s, 3),
                "repair_rebuild_s": round(repair_s, 3),
                "full_retrain_s": round(retrain_s, 3),
                "speedup": round(retrain_s / max(repair_s, 1e-9), 1),
                "steady_query_ms": round(query_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
