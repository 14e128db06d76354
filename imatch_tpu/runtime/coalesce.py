"""Dynamic request coalescing: concurrent single-query searches share
one device dispatch.

The production-TPU serving pattern (continuous batching): the MXU scores
a (Q, d) query block for barely more than (1, d), and on remote/tunneled
links every dispatch pays a full host<->device round-trip — so when
single-query requests arrive concurrently, the right move is ONE batched
engine call, not Q pipelined ones. The reference cannot do this at all
(one hnswlib call per request, /root/reference/backend/app/main.py:761);
POST /api/search/batch covers clients that batch explicitly, and this
module covers the ones that don't.

Zero added latency at low load: the worker blocks on the first request
and then drains whatever else is ALREADY queued (no timed window), so a
lone query goes straight through and batches only form while the device
is busy with a previous group. Opt-in via ``IMATCH_COALESCE=1`` (also
switched on by the throughput profile, utils/profiles.py).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, Sequence, Tuple


class QueryCoalescer:
    """Funnels single-row queries into batched calls of ``direct``.

    ``direct(q, n_results, include) -> dict`` is the store's internal
    query implementation taking an already-normalized (Q, d) array
    (numpy or jax); results are chroma-shaped lists-of-lists and are
    split back row-per-future. Requests are grouped by
    (n_results, include) so every member of a batch wants the same k
    and the same result fields.
    """

    def __init__(self, direct: Callable, max_batch: int = 64):
        self._direct = direct
        self.max_batch = max_batch
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._started = False
        self._start_lock = threading.Lock()

    # -- client side ---------------------------------------------------------

    def submit(self, q, n_results: int, include: Tuple[str, ...]) -> dict:
        """Block until the (1, d) query ``q`` has been answered as part
        of some batch; returns the single-row chroma-shaped dict."""
        if not self._started:
            with self._start_lock:
                if not self._started:
                    threading.Thread(
                        target=self._loop,
                        daemon=True,
                        name="imatch-coalesce",
                    ).start()
                    self._started = True
        fut: Future = Future()
        self._q.put((q, int(n_results), tuple(include), fut))
        return fut.result()

    # -- worker side -----------------------------------------------------------

    def _drain(self):
        """First request blocking, then everything already queued."""
        batch = [self._q.get()]
        while len(batch) < self.max_batch:
            try:
                batch.append(self._q.get_nowait())
            except queue.Empty:
                break
        return batch

    @staticmethod
    def _stack(rows: Sequence):
        """Stack (1, d) rows; keeps the whole group on device when any
        member is device-resident (jnp converts the numpy ones), avoids
        touching jax at all for pure-host groups."""
        if len(rows) == 1:
            return rows[0]
        import jax

        if any(isinstance(r, jax.Array) for r in rows):
            import jax.numpy as jnp

            return jnp.concatenate(list(rows), axis=0)
        import numpy as np

        return np.concatenate(list(rows), axis=0)

    def _loop(self):
        while True:
            batch = self._drain()
            groups: dict = {}
            for q, k, inc, fut in batch:
                groups.setdefault((k, inc), []).append((q, fut))
            for (k, inc), members in groups.items():
                futs = [f for _, f in members]
                try:
                    res = self._direct(
                        self._stack([q for q, _ in members]), k, inc
                    )
                    for i, fut in enumerate(futs):
                        fut.set_result(
                            {key: [val[i]] for key, val in res.items()}
                        )
                except BaseException as e:  # propagate, never strand callers
                    for fut in futs:
                        if not fut.done():
                            fut.set_exception(e)
