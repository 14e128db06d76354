"""Device-queue priority gate: bulk work yields to latency-critical work.

The TPU executes dispatches FIFO, so a search that lands behind a bulk
VLM caption batch waits for all of it — measured 12.7x p50 inflation
(27 -> 338 ms) with monolithic caption dispatches on one chip
(docs/DESIGN.md, serve-mix). The reference never faces this: its
captioner is a remote HTTP API and its index query is host-side hnswlib
(/root/reference/backend/app/main.py:600,761). On TPU both workloads
share one device queue, so the framework needs an explicit priority
boundary.

Mechanism, two halves:

- Latency-critical paths (index queries) wrap their dispatch in
  ``GATE.priority()``.
- Bulk paths (caption decode segments, VQA backfill chunks, embed
  chunks) call ``GATE.checkpoint()`` BETWEEN device dispatches. If any
  priority work is in flight, the bulk path parks until it completes
  (bounded wait), leaving the device queue empty for the search.

Combined with decode segmentation (generate.gen_segment — the decode
scan split into IMATCH_MD_SEG-step dispatches, each a bounded-depth
enqueue), the worst case a search waits is ONE in-flight segment plus
one queued segment instead of a whole caption batch.

This is cooperative scheduling on the host side — no device preemption
exists — which is exactly the continuous-batching discipline TPU/LLM
servers use: bound the quantum of bulk work, insert yield points.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager

__all__ = ["PriorityGate", "GATE"]


class PriorityGate:
    """Fairness note: a checkpoint waits only for priority sections
    ALREADY OPEN when it is reached (a sequence-number handoff), not
    for later arrivals — a continuous search stream therefore cannot
    starve bulk work; the two interleave one-quantum-for-one-query."""

    def __init__(self):
        self._cond = threading.Condition()
        self._next_seq = 0  # priority sections ever opened
        self._open: set = set()  # seq numbers of in-flight sections

    @contextmanager
    def priority(self):
        """Mark a latency-critical section (dispatch + fetch)."""
        with self._cond:
            seq = self._next_seq
            self._next_seq += 1
            self._open.add(seq)
        try:
            yield
        finally:
            with self._cond:
                self._open.discard(seq)
                self._cond.notify_all()

    def checkpoint(self, timeout: float = 2.0) -> bool:
        """Bulk yield point: park until every priority section open at
        this moment has finished (or ``timeout`` — a stuck search must
        not wedge ingest). Returns True if it waited. Costs one
        uncontended lock acquire when idle.

        Exactness matters here: the wait is on the SET of open section
        ids below the snapshot, not on a finished-count — with counters,
        a later section opening and closing quickly could satisfy the
        count while a section open at snapshot time was still in flight,
        letting a bulk quantum interleave mid-section."""
        with self._cond:
            target = self._next_seq
            if not any(s < target for s in self._open):
                return False
            deadline = time.monotonic() + timeout
            while any(s < target for s in self._open):
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                self._cond.wait(left)
        return True

    @property
    def contended(self) -> bool:
        return bool(self._open)


GATE = PriorityGate()
