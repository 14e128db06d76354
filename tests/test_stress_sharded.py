"""In-suite run of the sharded-tier stress cycle (scaled down).

scripts/stress_sharded_store.py is the full ~100k x 256 run (recorded
in docs/DESIGN.md); this keeps the same mutation/compaction/restore
cycle under CI at a size the 1-core host absorbs, so shard-boundary
bookkeeping regressions are caught without waiting for a manual run.
"""

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "stress_sharded_store.py",
)


@pytest.mark.parametrize("n,d", [(8192, 64)])
def test_stress_cycle_scaled(n, d):
    # subprocess: the script pins its own platform/flags before backend
    # init, which an in-process import after conftest cannot redo
    r = subprocess.run(
        [sys.executable, SCRIPT, str(n), str(d)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert '"ok": true' in r.stdout
