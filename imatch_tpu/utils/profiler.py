"""jax.profiler integration (SURVEY.md §5 "TPU equivalent: jax.profiler
traces + per-stage timing").

``start_trace``/``stop_trace`` wrap jax.profiler's TensorBoard-format
device traces; the serving layer exposes them as POST
/api/profile/start and /api/profile/stop so a production chip can be
profiled in place. ``profile_trace`` is the context-manager form for
scripts/benchmarks.
"""

from __future__ import annotations

import contextlib
import logging
import os
import threading
import time
from typing import Optional

logger = logging.getLogger("imatch.profiler")

_lock = threading.Lock()
_active_dir: Optional[str] = None


def start_trace(log_dir: Optional[str] = None) -> str:
    """Begin a device trace; returns the trace directory."""
    global _active_dir
    import jax

    with _lock:
        if _active_dir is not None:
            raise RuntimeError(f"trace already active in {_active_dir}")
        log_dir = log_dir or os.path.join(
            "profiles", time.strftime("%Y%m%d-%H%M%S")
        )
        os.makedirs(log_dir, exist_ok=True)
        jax.profiler.start_trace(log_dir)
        _active_dir = log_dir
        logger.info("profiler trace started -> %s", log_dir)
        return log_dir


def stop_trace() -> str:
    """End the active trace; returns the trace directory."""
    global _active_dir
    import jax

    with _lock:
        if _active_dir is None:
            raise RuntimeError("no active trace")
        # clear BEFORE jax stop: if stop_trace() raises (disk full
        # finalizing the dump), leaving _active_dir set wedges both
        # endpoints until restart — start refuses ("already active")
        # and every stop retry re-raises ("no trace running")
        out, _active_dir = _active_dir, None
        jax.profiler.stop_trace()
        logger.info("profiler trace written -> %s", out)
        return out


def active_trace_dir() -> Optional[str]:
    return _active_dir


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None):
    d = start_trace(log_dir)
    try:
        yield d
    finally:
        stop_trace()
