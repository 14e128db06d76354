"""Capacity-tier scale benchmark: 10M x 512 exact-rescored search.

The default tilemax engine keeps an fp32 rescore copy in HBM, capping a
v5e chip near ~2M x 512. The tilemax-host tier keeps only the int8
scoring matrix on device (5 GB at 10M) and rescores candidate tiles on
the host — this script measures its p50 at 10M rows (and the default
engine at 1M for reference).

Usage: python scripts/bench_scale.py [rows_millions] (default 10)
"""

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/imatch_tpu/xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imatch_tpu.index.search import (
    host_rescore_topk,
    prepare_host_rescore_corpus,
)

D = 512
K = 16


def main():
    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 10_000_000
    print(f"rows={n:,} dim={D} backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    print(f"corpus built in {time.perf_counter() - t0:.1f}s "
          f"({emb.nbytes / 1e9:.1f} GB host)", flush=True)

    t0 = time.perf_counter()
    hc = prepare_host_rescore_corpus(emb, np.ones((n,), bool))
    np.asarray(hc.scoring[0, :1])  # force the upload
    print(f"prepare (quantize + int8 upload {hc.scoring.nbytes / 1e9:.1f} GB)"
          f" in {time.perf_counter() - t0:.1f}s", flush=True)

    q = emb[:1]
    s, i = host_rescore_topk(q, hc, k=K)  # warm/compile
    assert i[0, 0] == 0, "self-match failed"
    times = []
    for r in range(30):
        qq = emb[r : r + 1]
        t0 = time.perf_counter()
        s, i = host_rescore_topk(qq, hc, k=K)
        times.append(time.perf_counter() - t0)
        assert i[0, 0] == r
    p50 = float(np.median(times)) * 1e3
    print(f"tilemax-host p50: {p50:.2f} ms/query @ {n:,} rows "
          f"(self-match exact on all 30)", flush=True)

    # The REAL serving path: VectorStore with the tier selected, query()
    # round-trips through the outside-lock build + id/metadata mapping.
    del hc
    from imatch_tpu.index.store import VectorStore

    store = VectorStore(dim=D, engine="tilemax-host")
    store._emb = emb
    store._alive = np.ones((n,), bool)
    store._ids = [f"v{i:08d}" for i in range(n)]
    store._meta = [None] * n
    store._docs = [None] * n
    store._slot = {}  # not needed for querying
    store._n = n
    t0 = time.perf_counter()
    res = store.query(emb[:1], n_results=10)
    print(f"store.query first (build+query): {time.perf_counter() - t0:.1f}s",
          flush=True)
    assert res["ids"][0][0] == "v00000000", res["ids"][0][:3]
    times = []
    for r in range(10):
        t0 = time.perf_counter()
        res = store.query(emb[r : r + 1], n_results=10)
        times.append(time.perf_counter() - t0)
        assert res["ids"][0][0] == f"v{r:08d}"
    print(f"store.query p50: {float(np.median(times)) * 1e3:.2f} ms @ "
          f"{n:,} rows (ids exact)", flush=True)


if __name__ == "__main__":
    main()
