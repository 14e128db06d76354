"""Multi-process (DCN) mesh: the sharded serving engine over processes.

Wraps scripts/dryrun_multiprocess.py — 2 worker processes x 4 CPU
devices stitched by jax.distributed (gloo), driving the UNCHANGED
VectorStore sharded engine and asserting exactness per process. This is
the multi-slice/DCN analogue of the virtual-8-device single-process
mesh the rest of the suite uses (SURVEY.md §2.3)."""

import os
import subprocess
import sys

def test_multiprocess_sharded_engine_dryrun():
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "dryrun_multiprocess.py",
    )
    env = dict(os.environ)
    # the launcher sets its own per-worker XLA flags; drop the suite's
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, script, "--timeout", "240"],
        capture_output=True,
        text=True,
        timeout=270,
        env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MULTIPROCESS DRYRUN OK" in out.stdout
