"""Deployment profiles: one knob that turns on the measured fast tiers.

The framework ships with conservative defaults (bf16 exact search,
segmented decode at seg=8) and exposes ~30 ``IMATCH_*`` env vars to
tune them. Every number behind these presets is measured in
docs/DESIGN.md; the profile just sets the matching group of env vars
so a deployment gets the measured configuration without hand-tuning
each flag.

``IMATCH_PROFILE``:

- ``latency``     — interactive search-first serving. Decode segment
  length 2 (search p50 within ~24% of an idle chip under full caption
  load, DESIGN.md co-residency table), ``auto`` index engine, warmup
  on.
- ``throughput``  — bulk ingest / backfill boxes with no interactive
  readers. Monolithic decode dispatches (no segmentation overhead,
  100% caption rate), W8A8 int8 image tower
  (ViT-B/32 1.11x / ViT-L/14 1.27x encode), int8 VLM weights + W8A8
  prefill (VQA backfill 73 -> 96.5 answers/s at B=128). Request
  coalescing is deliberately NOT in this profile — measured losing to
  pipelining on TPU at every depth (see the PROFILES entry below and
  docs/DESIGN.md).
- ``capacity``    — largest corpus per chip. ``auto`` engine (which
  escalates tilemax → sharded → tilemax-host by HBM budget), int8
  phase-1 scoring with fp32 rescore, int8 VLM weights + KV cache +
  W8A8 prefill and int8 image tower (opt-in tiers measured at 1.89
  ms/query and 894 tok/s; bless real checkpoints per WEIGHTS.md §5
  before production use).

Explicit env vars always win: the profile only fills in unset keys
(``os.environ.setdefault``), so ``IMATCH_PROFILE=latency
IMATCH_MD_SEG=4`` runs seg=4.

Reference anchor: the reference has no equivalent — its tuning surface
is editing backend/app/main.py constants; this is the TPU deployment's
"pick your operating point" switch.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("imatch.profiles")

PROFILES: dict[str, dict[str, str]] = {
    "latency": {
        "IMATCH_MD_SEG": "2",
        "IMATCH_INDEX_ENGINE": "auto",
        "IMATCH_WARMUP": "1",
    },
    "throughput": {
        "IMATCH_MD_SEG": "0",
        # NOT here: IMATCH_EMBED_CHUNK=1024. The clean-host chunk sweep
        # (TPU v5e, 2026-08-19) measured B=512 at 9,068 img/s vs 8,353
        # (B=1024) and 8,152 (B=2048) — the default IS the knee. An
        # earlier contended run showed B=1024 "winning" only because a
        # concurrent CPU job starved B=512's more-frequent host
        # iterations (DESIGN.md "Ingest chunk knee"); larger chunks are
        # more contention-robust, not faster.
        "IMATCH_INDEX_ENGINE": "auto",
        # NOT here: IMATCH_COALESCE. Coalescing measured LOSING to
        # depth-N pipelining on TPU at every depth tried (BENCH_r04:
        # depth-8 111 vs 196 QPS, depth-32 15 vs 414 — the engine is
        # HBM-bound, not dispatch-bound, so batching only adds queueing
        # delay). Stays available as an explicit opt-in for
        # dispatch-rate-limited backends; docs/DESIGN.md "Dynamic
        # request coalescing" has the full ledger.
        # W8A8 image tower: ViT-B/32 1.11x, ViT-L/14 1.27x encode
        # (scripts/exp_w8a8_vit.py; bless per WEIGHTS.md §5)
        "IMATCH_EMBED_QUANT": "int8",
        # int8 VLM weights + W8A8 prefill: VQA backfill 73 -> 96.5
        # answers/s at B=128 (scripts/exp_w8a8_vqa.py; bless per
        # WEIGHTS.md §5)
        "IMATCH_MD_QUANT": "int8",
        "IMATCH_MD_ACT": "int8",
        # B=128 is the VQA throughput knee (96 answers/s; plateaus
        # flat through B=256) — cache-free prefill removed the old
        # HBM ceiling that set the 64 default
        "IMATCH_VLM_VQA_CHUNK": "128",
        "IMATCH_BACKFILL_BATCH": "128",
        # Device-resident ingest: bulk-upload embeddings scatter d2d
        # into the index (store.add with a jax.Array, index/patch.py)
        # instead of round-tripping host<->device per batch; the host
        # mirror + journal still land before each HTTP response
        # (IMATCH_DEVICE_INGEST_FLUSH=1 default), so durability is
        # unchanged — only the h2d re-upload disappears and the d2h
        # fetch overlaps compute.
        "IMATCH_DEVICE_INGEST": "1",
    },
    "capacity": {
        "IMATCH_INDEX_ENGINE": "auto",
        "IMATCH_SCORE_DTYPE": "int8",
        "IMATCH_MD_QUANT": "int8",
        "IMATCH_MD_CACHE": "int8",
        "IMATCH_MD_ACT": "int8",
        "IMATCH_EMBED_QUANT": "int8",
    },
}


def apply_profile(env: os._Environ | dict | None = None) -> dict[str, str]:
    """Fill in the env-var group for ``IMATCH_PROFILE``, if set.

    Returns the key→value pairs actually applied (i.e. that were not
    already set explicitly). Unknown profile names raise ValueError so
    a typo fails loudly at startup rather than silently serving with
    defaults.
    """
    if env is None:
        env = os.environ
    name = env.get("IMATCH_PROFILE", "").strip().lower()
    if not name:
        return {}
    if name not in PROFILES:
        raise ValueError(
            f"IMATCH_PROFILE={name!r}: unknown profile "
            f"(choose from {sorted(PROFILES)})"
        )
    applied = {}
    for key, value in PROFILES[name].items():
        if key not in env:
            env[key] = value
            applied[key] = value
    # A PROFILE-applied IMATCH_MD_ACT must not crash the runtime when
    # the user explicitly overrode IMATCH_MD_QUANT away from int8 (the
    # "explicit env vars always win" contract means per-flag overrides
    # degrade gracefully). A user-set MD_ACT still fails loudly in
    # MoondreamJax — that conflict is theirs to resolve.
    if (
        applied.get("IMATCH_MD_ACT") == "int8"
        and env.get("IMATCH_MD_QUANT") != "int8"
    ):
        del env["IMATCH_MD_ACT"]
        del applied["IMATCH_MD_ACT"]
        log.info(
            "profile %s: dropping IMATCH_MD_ACT=int8 (explicit "
            "IMATCH_MD_QUANT=%r is not int8)",
            name,
            env.get("IMATCH_MD_QUANT"),
        )
    # Unblessed-numerics klaxon: the int8/W8A8 tiers' ACCEPTANCE gates
    # (real-weight retrieval parity, caption quality, LM activation
    # outliers — WEIGHTS.md §5) cannot run until a real checkpoint has
    # flowed once. A deployment that types IMATCH_PROFILE=throughput
    # gets those tiers by default, so it must be told, loudly, exactly
    # what is unproven. Silence the warning ONLY by setting
    # IMATCH_QUANT_BLESSED=1 after the §5 gates pass.
    _QUANT_KEYS = (
        "IMATCH_EMBED_QUANT",
        "IMATCH_MD_QUANT",
        "IMATCH_MD_ACT",
        "IMATCH_MD_CACHE",
        "IMATCH_SCORE_DTYPE",
    )
    quant_on = sorted(k for k in _QUANT_KEYS if applied.get(k) == "int8")
    if quant_on and env.get("IMATCH_QUANT_BLESSED", "") not in (
        "1",
        "true",
        "yes",
    ):
        log.warning(
            "profile %s enables int8/W8A8 tiers (%s) whose quality "
            "gates have NOT been run against real checkpoints. Run the "
            "WEIGHTS.md §5 blessing gates "
            "(tests/test_golden_weights.py with the matching env vars) "
            "once real weights are installed, then set "
            "IMATCH_QUANT_BLESSED=1 to confirm — or override the "
            "individual flags to opt out.",
            name,
            ", ".join(quant_on),
        )
    if applied:
        log.info("profile %s: %s", name,
                 " ".join(f"{k}={v}" for k, v in sorted(applied.items())))
    return applied
