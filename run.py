#!/usr/bin/env python
"""Launcher — the reference's backend/run.py equivalent.

Env config (SURVEY.md §5 config table):
  PORT                  server port (default 8000)
  IMATCH_ROOT           app data root (static/, index_data/, filters.json)
  IMATCH_CLIP_CONFIG    vit-b32 | vit-l14 | longclip-l14-248 (default vit-b32)
  IMATCH_CLIP_CHECKPOINT  local HF checkpoint dir for real weights
  IMATCH_CAPTIONER      auto | moondream | null
  IMATCH_SAMPLES_DIR    sample corpus for /upload-samples
  IMATCH_INDEX_ENGINE   auto (default here: sharded when >1 device) |
                        tilemax | sharded | pallas | tilemax-host | ivf
  IMATCH_PROFILE        latency | throughput | capacity — one-knob
                        presets for the measured fast tiers
                        (imatch_tpu/utils/profiles.py); explicit env
                        vars always override the profile.
"""

import logging
import os

import jax

# Some TPU plugins self-register and ignore the JAX_PLATFORMS env var;
# honor it explicitly so `JAX_PLATFORMS=cpu python run.py` really serves
# from CPU (same handling as __graft_entry__.py / tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the towers' first-request compiles
# (minutes on CPU, ~30s on TPU) are paid once per machine, not per
# restart. Override location with JAX_COMPILATION_CACHE_DIR.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/imatch_tpu/xla"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
)

# Apply the deployment profile BEFORE importing the serving stack so
# every module reads the profiled env (chunk sizes, engines, dtypes).
from imatch_tpu.utils.profiles import apply_profile  # noqa: E402

apply_profile()

from imatch_tpu.serving.app import create_app  # noqa: E402
from imatch_tpu.serving.server import serve  # noqa: E402

if __name__ == "__main__":
    # Production default: use every chip on the slice for the index
    # (row-sharded exact search); single-chip stays tilemax. Explicit
    # IMATCH_INDEX_ENGINE always wins.
    os.environ.setdefault("IMATCH_INDEX_ENGINE", "auto")
    root = os.environ.get("IMATCH_ROOT", ".")
    port = int(os.environ.get("PORT", "8000"))
    app = create_app(root=root)

    # Graceful shutdown: mutations are already journaled per-op, so no
    # data is at risk — but compacting into a snapshot here makes the
    # NEXT start take the fast cold-load path (one npy read) instead of
    # a journal replay. SIGTERM is what orchestrators send.
    import signal
    import sys

    def _graceful(signum, frame):
        log = logging.getLogger("imatch.run")
        log.info("signal %d: snapshotting before exit", signum)
        # NOTE: the snapshot waits on the store lock, i.e. it DRAINS an
        # in-flight bulk mutation before compacting — intentional (the
        # journal already holds every completed op, so even a SIGKILL
        # past the orchestrator's grace window only costs the next start
        # a journal replay, never data).
        ok = True
        try:
            app.state.snapshot(force=True)
        except Exception as e:
            ok = False
            log.error("shutdown snapshot failed: %s", e)
        # exit 0 only when the shutdown actually did what it promised —
        # a supervisor watching exit codes must see the failed
        # compaction (the old handler always reported success)
        sys.exit(0 if ok else 1)

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)
    serve(app, port=port)
