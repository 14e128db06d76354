"""Round-5 experiment: why did the driver-run e2e ingest collapse?

BENCH_r04 tail recorded e2e at 79.3 img/s vs 195.3 in r03 and 221.8 in
the same-week local run — measured right AFTER the (new in r04)
device-resident ingest tiers and the chunk sweep. Two hypotheses from
VERDICT.md:

  H1 (contention): the preceding tiers leave something saturated
     (thread pools, deferred host-mirror d2h copies, device memory)
     that throttles the e2e tier's frame upload.
  H2 (link variance): the tunnel's h2d rate simply drifted between the
     t=0 bandwidth probe (76.5 MB/s) and the e2e tier minutes later —
     the e2e wall is ~dominated by the 402 MB frame upload (r03 stage
     story: stream 9.5 s of 10.5 s wall), so a slow window alone
     explains a 2.8x drop.

Design: e2e standalone -> replicate the full r04 pre-e2e tier sequence
-> e2e again, with a link probe before/after every step. If the two e2e
rates agree (and track the adjacent link probes), it is H2 and the fix
is attribution (probe the link AT the tier and emit the upload-bound
ceiling next to the rate). If the second e2e is much slower while the
adjacent probe is not, it is H1 and there is a leak to find.

Run on the real chip:  python scripts/exp_e2e_order.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (bench.py sets env defaults + probes the accelerator)
import jax  # noqa: E402


def main():
    on_tpu = jax.default_backend() == "tpu"
    out = {"backend": jax.default_backend()}

    def probe(tag):
        down, up = bench.bench_link_bandwidth()
        out[f"link_{tag}"] = {"down_mb_s": down, "up_mb_s": up}
        print(f"[exp] link {tag}: {down}/{up} MB/s", file=sys.stderr, flush=True)
        return up

    from imatch_tpu.pipeline.embedder import ClipEmbedder

    embedder = ClipEmbedder(config="vit-b32")

    up0 = probe("t0")
    t0 = time.perf_counter()
    rate_a, wall_a, stages_a = bench.bench_e2e_ingest(embedder, on_tpu, up0)
    out["e2e_standalone"] = {
        "imgs_per_sec": round(rate_a, 1),
        "wall_ms": wall_a,
        "stages": stages_a,
        "total_s": round(time.perf_counter() - t0, 1),
    }
    print(f"[exp] e2e standalone: {rate_a:.1f} img/s", file=sys.stderr, flush=True)
    probe("after_e2e_a")

    # replicate the r04 pre-e2e tier sequence
    seq = {}
    t0 = time.perf_counter()
    seq["headline"] = round(bench.bench_ingest(on_tpu), 1)
    seq["device_resident"] = round(bench.bench_ingest(on_tpu, device_adds=True), 1)
    if on_tpu:
        seq["device_resident_w8a8"] = round(
            bench.bench_ingest(on_tpu, quant=True, device_adds=True), 1
        )
        seq["w8a8"] = round(bench.bench_ingest(on_tpu, quant=True), 1)
        seq["chunk_1024"] = round(bench.bench_ingest(on_tpu, batch=1024), 1)
        seq["chunk_2048"] = round(bench.bench_ingest(on_tpu, batch=2048), 1)
    seq["tiers_total_s"] = round(time.perf_counter() - t0, 1)
    out["pre_e2e_tiers"] = seq
    print(f"[exp] tiers done: {seq}", file=sys.stderr, flush=True)

    up1 = probe("after_tiers")
    t0 = time.perf_counter()
    rate_b, wall_b, stages_b = bench.bench_e2e_ingest(embedder, on_tpu, up1)
    out["e2e_after_tiers"] = {
        "imgs_per_sec": round(rate_b, 1),
        "wall_ms": wall_b,
        "stages": stages_b,
        "total_s": round(time.perf_counter() - t0, 1),
    }
    print(f"[exp] e2e after tiers: {rate_b:.1f} img/s", file=sys.stderr, flush=True)
    probe("final")

    out["verdict"] = (
        "H1-contention"
        if rate_b < 0.7 * rate_a
        else "H2-link-variance-or-stable"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
