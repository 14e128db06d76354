"""Multi-process (DCN) dryrun: the sharded serving engine over a mesh
that SPANS PROCESSES.

SURVEY.md §2.3 calls for "ICI for intra-slice, DCN for multi-slice".
Single-process mesh tests (conftest's virtual 8-device CPU mesh,
``__graft_entry__.dryrun_multichip``) validate the intra-slice story;
this script validates the multi-slice one: N worker processes each own
a disjoint set of devices, ``jax.distributed`` stitches them into one
global mesh, and the UNCHANGED serving store (VectorStore,
IMATCH_INDEX_ENGINE=sharded) answers queries over it — the same code
path that rides ICI inside a slice rides the process-spanning backend
(gloo on CPU here, DCN on real multi-slice TPU) with zero changes.

Usage:
    python scripts/dryrun_multiprocess.py             # launcher: 2 procs x 4 devices
    python scripts/dryrun_multiprocess.py --procs 2 --local-devices 4

Exit 0 and a final ``MULTIPROCESS DRYRUN OK`` line = every process
produced results identical to a local numpy exact reference.

Reference anchor: the one-process hnswlib query this scales past,
/root/reference/backend/app/main.py:761.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args) -> int:
    # platform/flag setup MUST precede any jax backend init; the env var
    # is baked to the TPU plugin in some environments, so decide via
    # jax.config (docs/DESIGN.md "the env var is a request, the config
    # knob is a decision").
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        args.coordinator,
        num_processes=args.procs,
        process_id=args.worker,
    )
    import numpy as np

    from imatch_tpu.index.store import VectorStore
    from imatch_tpu.parallel.dist_search import (
        prepare_sharded_corpus,
        sharded_topk_prepared,
    )
    from imatch_tpu.parallel.mesh import make_mesh

    n_global = args.procs * args.local_devices
    assert len(jax.devices()) == n_global, (
        f"expected {n_global} global devices, got {len(jax.devices())}"
    )
    assert len(jax.local_devices()) == args.local_devices

    # deterministic corpus — identical on every process, the SPMD
    # contract the serving layer provides by replicating host state
    rng = np.random.default_rng(7)
    n, d, k = 4096, 64, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[rng.integers(0, n, 8)]

    # ---- library layer: prepared sharded corpus over the global mesh
    mesh = make_mesh(model_parallel=1)
    sc = prepare_sharded_corpus(
        corpus, np.ones(n, bool), mesh=mesh, score_dtype=jax.numpy.float32
    )
    s, i = jax.device_get(sharded_topk_prepared(queries, sc, k=k))

    ref = queries.astype(np.float64) @ corpus.astype(np.float64).T
    for qi in range(queries.shape[0]):
        want = np.argsort(-ref[qi], kind="stable")[:k]
        got = i[qi]
        assert got.tolist() == want.tolist(), (
            f"proc {args.worker} query {qi}: {got} != {want}"
        )
        np.testing.assert_allclose(s[qi], ref[qi][want], atol=1e-5)
    print(f"[proc {args.worker}] library sharded_topk exact over "
          f"{args.procs}-process mesh", flush=True)

    # ---- serving layer: the real VectorStore, engine=sharded, global mesh
    store = VectorStore(dim=d, engine="sharded", score_dtype=jax.numpy.float32)
    ids = [f"r{j:05d}" for j in range(n)]
    store.add(ids=ids, embeddings=corpus)
    res = store.query(queries, n_results=k)
    for qi in range(queries.shape[0]):
        want = np.argsort(-ref[qi], kind="stable")[:k]
        assert res["ids"][qi] == [ids[w] for w in want], (
            f"proc {args.worker} store query {qi} mismatch"
        )
    # mutation path: delete the top hit of query 0, expect the runner-up
    top0 = res["ids"][0][0]
    store.delete([top0])
    res2 = store.query(queries[:1], n_results=k)
    assert top0 not in res2["ids"][0]
    assert res2["ids"][0][0] == res["ids"][0][1]
    print(f"[proc {args.worker}] VectorStore sharded engine + mutation "
          f"exact over the process-spanning mesh", flush=True)
    return 0


def launcher(args) -> int:
    port = 20000 + (os.getpid() % 10000)
    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f
        for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count="
        f"{args.local_devices} "
        "--xla_cpu_collective_call_terminate_timeout_seconds=600"
    ).strip()
    procs = []
    for pid in range(args.procs):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--worker",
                    str(pid),
                    "--procs",
                    str(args.procs),
                    "--local-devices",
                    str(args.local_devices),
                    "--coordinator",
                    coordinator,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    rc = 0
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += f"\n[launcher] proc {pid} TIMED OUT"
        sys.stdout.write(out)
        if p.returncode != 0:
            rc = 1
            print(f"[launcher] proc {pid} exited {p.returncode}")
    if rc == 0:
        print(
            f"MULTIPROCESS DRYRUN OK: {args.procs} processes x "
            f"{args.local_devices} devices, sharded engine exact"
        )
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--coordinator", default="localhost:20377")
    ap.add_argument("--timeout", type=int, default=300)
    args = ap.parse_args()
    if args.worker is not None:
        return worker(args)
    return launcher(args)


if __name__ == "__main__":
    sys.exit(main())
