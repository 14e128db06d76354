"""Sharded-tier stress at realistic scale on the virtual 8-device mesh.

Round-3 review: the sharded engines were proven bit-exact only at toy
sizes (<=900 rows in tests, 64/dp in the dryrun). This run cycles an
``ivf-sharded`` VectorStore through ~100k x 256 with mutations,
compaction, snapshot/restore and journal replay, checking every
checkpoint against a numpy exact-cosine oracle (queries run with
n_probe >= clusters-per-shard, where sharded IVF equals exact search
bit-for-bit) — the shard-boundary bookkeeping bugs small tests can't
catch live exactly here.

Usage (defaults: n=100_000, d=256, 8 virtual CPU devices):
    python scripts/stress_sharded_store.py [n] [d]

Prints one PASS/FAIL line per checkpoint and a JSON summary; exits
non-zero on any mismatch. A recorded run lives in docs/DESIGN.md
("Sharded tier at scale").
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("IMATCH_WARMUP", "0")
# full probe -> the ANN tier degenerates to exact search (recall note in
# parallel/dist_ivf.py), so a numpy oracle can check it bit-for-bit
os.environ.setdefault("IMATCH_IVF_NPROBE", "100000")

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

# before backend init: the axon plugin ignores JAX_PLATFORMS (conftest)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from imatch_tpu.index.store import VectorStore


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class Oracle:
    """Host mirror of the live set + exact cosine top-k."""

    def __init__(self, d):
        self.d = d
        self.vecs: dict = {}

    def add(self, ids, rows):
        for i, r in zip(ids, rows):
            self.vecs[i] = r

    def delete(self, ids):
        for i in ids:
            self.vecs.pop(i, None)

    def update(self, ids, rows):
        for i, r in zip(ids, rows):
            self.vecs[i] = r

    def topk(self, q, k):
        ids = list(self.vecs.keys())
        mat = np.stack([self.vecs[i] for i in ids])
        s = mat @ q
        order = np.lexsort((np.arange(len(ids)), -s))[:k]
        return [ids[i] for i in order], s[order]


def check(tag, store, oracle, qs, k=10):
    t0 = time.perf_counter()
    res = store.query(qs, n_results=k)
    dt = (time.perf_counter() - t0) * 1e3
    for qi in range(qs.shape[0]):
        want_ids, want_s = oracle.topk(qs[qi], k)
        got_ids = res["ids"][qi]
        got_s = [1.0 - d for d in res["distances"][qi]]
        if got_ids != want_ids or not np.allclose(
            got_s, want_s, atol=1e-4
        ):
            print(f"FAIL {tag} q{qi}")
            print("  want", want_ids[:5], np.round(want_s[:5], 5))
            print("  got ", got_ids[:5], np.round(got_s[:5], 5))
            return False
    print(f"PASS {tag} ({dt:.0f} ms, live={store.count()})")
    return True


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    oracle = Oracle(d)
    summary = {"n": n, "d": d, "devices": len(jax.devices())}
    ok = True
    t_start = time.perf_counter()

    with tempfile.TemporaryDirectory() as root:
        store = VectorStore(dim=d, engine="ivf-sharded", persist_dir=root)
        ids = [f"r{i:07d}" for i in range(n)]
        rows = _norm(rng.standard_normal((n, d)).astype(np.float32))
        t0 = time.perf_counter()
        store.add(ids=ids, embeddings=rows)
        oracle.add(ids, rows)
        summary["bulk_add_s"] = round(time.perf_counter() - t0, 1)
        qs = _norm(rng.standard_normal((4, d)).astype(np.float32))
        t0 = time.perf_counter()
        ok &= check("initial build", store, oracle, qs)
        summary["initial_build_s"] = round(time.perf_counter() - t0, 1)

        # mutation rounds: appends land in capacity padding (patched),
        # deletes flip masks (patched), updates fall back to repair
        for rnd in range(3):
            new_ids = [f"a{rnd}_{i:05d}" for i in range(2048)]
            new_rows = _norm(
                rng.standard_normal((2048, d)).astype(np.float32)
            )
            store.add(ids=new_ids, embeddings=new_rows)
            oracle.add(new_ids, new_rows)
            dead = [f"r{i:07d}" for i in range(rnd * 3000, rnd * 3000 + 1500)]
            store.delete(dead)
            oracle.delete(dead)
            upd_ids = [f"a{rnd}_{i:05d}" for i in range(16)]
            upd_rows = _norm(
                rng.standard_normal((16, d)).astype(np.float32)
            )
            store.update(upd_ids, embeddings=upd_rows)
            oracle.update(upd_ids, upd_rows)
            ok &= check(f"mutation round {rnd}", store, oracle, qs)
        summary["patched_mutations"] = store.stats()["patched_mutations"]

        # snapshot + journal replay restore
        store.checkpoint(force=True)
        extra_ids = [f"j_{i:04d}" for i in range(512)]
        extra = _norm(rng.standard_normal((512, d)).astype(np.float32))
        store.add(ids=extra_ids, embeddings=extra)  # journal-only
        oracle.add(extra_ids, extra)
        restored = VectorStore.load(root)
        assert restored.count() == store.count(), (
            restored.count(),
            store.count(),
        )
        ok &= check("snapshot+journal restore", restored, oracle, qs)

        # force compaction: kill >half the live set
        live_ids = store.get(include=[])["ids"]
        victims = live_ids[: int(len(live_ids) * 0.55)]
        step = 20000
        for i in range(0, len(victims), step):
            store.delete(victims[i : i + step])
        oracle.delete(victims)
        ok &= check("post-compaction", store, oracle, qs)

        # rebuild from the compacted state's snapshot
        store.checkpoint(force=True)
        restored2 = VectorStore.load(root)
        ok &= check("restore after compaction", restored2, oracle, qs)

        summary["stats"] = {
            k: v
            for k, v in store.stats().items()
            if k in ("engine", "live", "tombstones", "capacity", "ivf")
        }

    summary["wall_s"] = round(time.perf_counter() - t_start, 1)
    summary["ok"] = bool(ok)
    print(json.dumps(summary))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
