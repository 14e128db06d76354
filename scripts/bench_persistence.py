"""Persistence at scale: snapshot save / cold rehydrate / journal replay.

The reference's durability is chroma's sqlite + hnswlib files; restart
recovery is load_metadata_from_chromadb
(/root/reference/backend/app/main.py:550-579) — O(N) but nobody ever
measured it. Here the store's restart story (snapshot npy/jsonl +
per-op journal, index/store.py:578-) gets numbers at production scale
so "the server restarts in X s with 1M images" is a fact, not a hope.

Usage: python scripts/bench_persistence.py [rows] [dim]
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host-side benchmark: pin to CPU unconditionally (the TPU plugin
# self-registers and ignores the env var; environments may also bake
# JAX_PLATFORMS to the TPU platform, so setdefault is not enough).
import jax

jax.config.update("jax_platforms", "cpu")

from imatch_tpu.index.store import VectorStore


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((rows, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"img_{i:016x}" for i in range(rows)]
    metas = [
        {
            "id": ids[i],
            "filename": f"photo_{i}.jpg",
            "description": "a photo",
            "url": f"/static/processed/{ids[i]}.png",
            "created_at": "2026-08-17T00:00:00",
        }
        for i in range(rows)
    ]

    tmp = tempfile.mkdtemp(prefix="imatch_persist_bench_")
    try:
        store = VectorStore(dim=dim)
        t0 = time.perf_counter()
        store.add(ids=ids, embeddings=emb, metadatas=metas)
        add_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        store.save(tmp)
        save_s = time.perf_counter() - t0
        size_mb = sum(
            os.path.getsize(os.path.join(tmp, f)) for f in os.listdir(tmp)
        ) / 2**20

        t0 = time.perf_counter()
        loaded = VectorStore.load(tmp, persist=False)
        load_s = time.perf_counter() - t0
        assert loaded.count() == rows

        # journal append throughput: per-op durability cost on the
        # ingest path (every add/update/delete appends + flushes).
        # Fresh dir with NO snapshot, so the replay below times the
        # journal path alone instead of a noisy subtraction of two
        # full snapshot loads.
        jdir = os.path.join(tmp, "journal_only")
        jstore = VectorStore(dim=dim, persist_dir=jdir)
        n_ops = 20_000
        t0 = time.perf_counter()
        for i in range(n_ops):
            jstore.add(
                ids=[f"j{i}"],
                embeddings=emb[i : i + 1],
                metadatas=[metas[i]],
            )
        journal_ops_s = n_ops / (time.perf_counter() - t0)

        t0 = time.perf_counter()
        replayed = VectorStore.load(jdir, persist=False)
        replay_s = time.perf_counter() - t0
        assert replayed.count() == n_ops

        print(
            json.dumps(
                {
                    "metric": "persistence_scale",
                    "rows": rows,
                    "dim": dim,
                    "bulk_add_s": round(add_s, 2),
                    "snapshot_save_s": round(save_s, 2),
                    "snapshot_mb": round(size_mb, 1),
                    "cold_load_s": round(load_s, 2),
                    "journal_append_ops_s": round(journal_ops_s, 1),
                    "journal_replay_ops_s": round(n_ops / replay_s, 1),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
