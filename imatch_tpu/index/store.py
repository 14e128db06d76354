"""In-HBM vector store with ChromaDB-collection semantics.

Drop-in for the subset of the ChromaDB collection API the reference uses
(add/get/query/update/delete/count — call sites
/root/reference/backend/app/main.py:630,735,761,503,1030,1069 and
utils.py:104-138):

- ``query`` returns cosine *distance* ``1 - cos`` like a chroma cosine
  collection; the search engine maps similarity ``1 - d/2`` on top
  (pipeline/search.py), matching backend/app/main.py:779-782.
- Host-side master copy (fp32 numpy + metadata lists) is the source of
  truth; a padded fp32 device buffer + validity mask is rebuilt lazily and
  reused across queries, so steady-state search is one device matmul.
- Deletes are tombstones; compaction rewrites the buffer when more than
  half the slots are dead.
- Durable snapshots (save/load): embeddings.npy + records.json +
  manifest.json, written atomically — the restart-recovery story the
  reference gets from chroma's sqlite persistence (SURVEY.md §5).
"""

from __future__ import annotations

import base64
import json
import logging
import os
import tempfile
import threading
import time
import zipfile
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from imatch_tpu.index import patch as _patch
from imatch_tpu.index.search import prepare_device_corpus, tilemax_topk
from imatch_tpu.runtime.scheduler import GATE
from imatch_tpu.utils.metrics import METRICS

logger = logging.getLogger("imatch.store")

_MIN_CAP = 1024


def _norm_row_lists(rows, n: int, what: str) -> list:
    """Normalize a per-row sidecar list (metadatas/documents) to exactly
    n entries. None / empty -> n Nones; a non-empty list of the wrong
    length is a client error — the old `rows or [None] * n` silently
    accepted a short list, permanently misaligning _meta/_docs with
    _ids (and the journal generator zips short, dropping rows on
    restart)."""
    if rows is None or len(rows) == 0:
        return [None] * n
    rows = list(rows)
    if len(rows) != n:
        raise ValueError(f"{n} ids but {len(rows)} {what}")
    return rows

_SCORE_DTYPES = {
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "int8": jnp.int8,
}


def _env_engine() -> str:
    """IMATCH_INDEX_ENGINE: tilemax (default, exact), sharded (exact,
    corpus row-sharded over every local device — the multi-chip serving
    engine), auto (sharded when >1 device, else tilemax), pallas (fused
    Pallas phase-1 kernel), tilemax-host (int8 scoring in HBM + host
    fp32 rescore — the capacity tier for corpora whose fp32 copy
    exceeds HBM, e.g. 10M x 512), ivf (approximate — opt-in; ordering
    is no longer chroma-exact), ivf-sharded (approximate, corpus
    row-sharded over the mesh with one IVF per shard — the ANN tier
    past one chip's HBM, parallel/dist_ivf.py)."""
    return os.environ.get("IMATCH_INDEX_ENGINE", "tilemax").lower()


def _env_score_dtype():
    """IMATCH_SCORE_DTYPE: bf16 (default) | fp32 | int8 (tilemax only)."""
    name = os.environ.get("IMATCH_SCORE_DTYPE", "bf16").lower()
    if name not in _SCORE_DTYPES:
        raise ValueError(
            f"unknown score dtype {name!r}; valid: {sorted(_SCORE_DTYPES)}"
        )
    return _SCORE_DTYPES[name]


class VectorStore:
    def __init__(
        self,
        dim: Optional[int] = None,
        persist_dir: Optional[str] = None,
        engine: Optional[str] = None,
        score_dtype=None,
        coalesce: Optional[bool] = None,
        capacity: Optional[int] = None,
    ):
        self.dim = dim
        self.engine = (engine or _env_engine()).lower()
        self._auto = self.engine == "auto"
        if self._auto:
            # the reference serves its whole index from one process
            # (hnswlib query, /root/reference/backend/app/main.py:761);
            # on a TPU slice the natural default is the mesh-sharded
            # exact engine — same results, N/P rows of HBM per chip.
            # Per-build, auto additionally escalates to the
            # tilemax-host capacity tier when the corpus outgrows HBM
            # (see _engine_for) instead of OOMing mid-growth.
            self.engine = "sharded" if len(jax.devices()) > 1 else "tilemax"
        if self.engine not in (
            "tilemax",
            "sharded",
            "pallas",
            "ivf",
            "ivf-sharded",
            "tilemax-host",
        ):
            raise ValueError(f"unknown index engine {self.engine!r}")
        self._mesh = None  # lazy data-axis mesh for the sharded engine
        self.score_dtype = (
            score_dtype if score_dtype is not None else _env_score_dtype()
        )
        # When set, every mutation appends to an on-disk journal
        # (journal.jsonl) so durability is per-operation like chroma's
        # sqlite, while full snapshots become an occasional compaction
        # instead of an O(N) rewrite per upload.
        self.persist_dir = persist_dir
        self._journal_len = 0
        self._lock = threading.RLock()
        self._ids: List[str] = []
        self._slot: Dict[str, int] = {}
        self._meta: List[Optional[dict]] = []
        self._docs: List[Optional[str]] = []
        self._emb: Optional[np.ndarray] = None  # (cap, D) fp32
        self._alive: Optional[np.ndarray] = None  # (cap,) bool
        # Device-resident adds (add() with a jax.Array) defer the host
        # mirror + journal: each entry is (base_slot, count, device_rows,
        # ids, metadatas, documents) whose d2h copy was started async at
        # add time. _drain_pending() completes them FIFO before anything
        # reads self._emb or appends a later op to the journal, so the
        # journal order always equals the operation order.
        self._pending: List[tuple] = []
        self._n = 0  # slots in use (incl. tombstones)
        self._dead = 0
        self._device = None  # cached (corpus jnp, valid jnp)
        self._gen = 0  # bumped on every invalidation (build-outside-lock)
        # queries currently holding a reference to the prepared device
        # state (between snapshot capture and device_get). While zero,
        # incremental patches donate the live buffers to XLA — a true
        # in-place HBM update; otherwise the patch copies so in-flight
        # readers keep a valid state (index/patch.py).
        self._inflight = 0
        self._patched = 0  # mutations absorbed by an O(batch) patch
        self._patch_rebuilds = 0  # mutations that fell back to invalidate
        # IVF host state surviving _device invalidations: trained
        # centroids + per-slot cluster assignment (int32, -1 = not yet
        # assigned). Lets a mutation-invalidated ivf build REPAIR the
        # index (assign only new rows against the existing centroids —
        # the FAISS IVF add discipline) instead of re-running k-means
        # over the whole corpus. Lock-guarded; cents treated immutable.
        self._ivf_host: Optional[dict] = None
        self._last_build: Optional[dict] = None  # stats(): engine/seconds
        # opt-in dynamic batching front: concurrent single-query
        # requests share one engine dispatch instead of pipelining N
        # (runtime/coalesce.py). Decided at construction so the query
        # path has no races; the worker thread starts lazily on first
        # submit. ``coalesce=None`` reads IMATCH_COALESCE, gated to
        # accelerator backends — batched host scoring is FLOP-bound and
        # counterproductive (docs/DESIGN.md); pass True to force (tests,
        # benches).
        # Pre-reserve slot capacity (reference parity: hnswlib indexes
        # are created with a max_elements budget). Growth past the
        # reservation still works — it doubles like always — but a
        # right-sized reservation means steady-state ingest NEVER hits
        # a capacity rebuild: every add lands as an O(batch) device
        # patch inside the already-uploaded padding (index/patch.py).
        # IMATCH_STORE_CAPACITY applies when the constructor doesn't
        # pass one (run.py serving store).
        if capacity is None:
            capacity = int(os.environ.get("IMATCH_STORE_CAPACITY", "0")) or None
        # the reservation is remembered, not just applied here: the
        # serving store is built by VectorStore.load() with dim=None
        # (dim comes from the snapshot manifest), so the first
        # _ensure_capacity call — whenever dim is known — must still
        # honor it, or IMATCH_STORE_CAPACITY is a silent no-op for
        # exactly the run.py case it documents
        self._reserve = int(capacity) if capacity else 0
        if self._reserve and dim:
            self._ensure_capacity(0)
        self._coalescer = None
        if coalesce is None:
            coalesce = os.environ.get("IMATCH_COALESCE", "").lower() in (
                "1", "true", "yes", "on",
            ) and jax.default_backend() != "cpu"
        if coalesce:
            self.set_coalescing(True)

    # -- capacity -----------------------------------------------------------

    def _ensure_capacity(self, extra: int):
        need = max(self._n + extra, self._reserve)
        cap = 0 if self._emb is None else self._emb.shape[0]
        if need <= cap:
            return
        new_cap = max(_MIN_CAP, cap or _MIN_CAP)
        while new_cap < need:
            new_cap *= 2
        emb = np.zeros((new_cap, self.dim), dtype=np.float32)
        alive = np.zeros((new_cap,), dtype=bool)
        if self._emb is not None:
            emb[: self._n] = self._emb[: self._n]
            alive[: self._n] = self._alive[: self._n]
        self._emb, self._alive = emb, alive
        if self._ivf_host is not None:
            if self._ivf_host.get("kind") == "ivf-sharded":
                # capacity growth moves shard boundaries; per-shard
                # assignments are meaningless afterwards — retrain
                self._ivf_host = None
            else:
                grown = np.full((new_cap,), -1, np.int32)
                old = self._ivf_host["assign"]
                grown[: old.shape[0]] = old
                self._ivf_host["assign"] = grown
        self._device = None
        self._gen += 1

    def _maybe_compact(self):
        if self._dead * 2 > self._n and self._n >= _MIN_CAP:
            keep = [i for i in range(self._n) if self._alive[i]]
            self._ids = [self._ids[i] for i in keep]
            self._meta = [self._meta[i] for i in keep]
            self._docs = [self._docs[i] for i in keep]
            emb = np.zeros_like(self._emb)
            emb[: len(keep)] = self._emb[keep]
            self._emb = emb
            self._alive = np.zeros_like(self._alive)
            self._alive[: len(keep)] = True
            self._n = len(keep)
            self._dead = 0
            self._slot = {d: i for i, d in enumerate(self._ids)}
            if self._ivf_host is not None:
                if self._ivf_host.get("kind") == "ivf-sharded":
                    # compaction moves rows across shard boundaries —
                    # shard-local cluster ids don't transfer; retrain
                    self._ivf_host = None
                else:
                    # rows moved: remap assignments to the compacted layout
                    remapped = np.full_like(self._ivf_host["assign"], -1)
                    remapped[: len(keep)] = self._ivf_host["assign"][keep]
                    self._ivf_host["assign"] = remapped
            self._device = None
            self._gen += 1

    # -- journal ------------------------------------------------------------

    @staticmethod
    def _enc_emb(vec: np.ndarray) -> str:
        return base64.b64encode(
            np.asarray(vec, np.float32).tobytes()
        ).decode("ascii")

    @staticmethod
    def _dec_emb(s: str) -> np.ndarray:
        return np.frombuffer(base64.b64decode(s), dtype=np.float32)

    def _journal(self, *ops: dict):
        if self.persist_dir is None or not ops:
            return
        os.makedirs(self.persist_dir, exist_ok=True)
        path = os.path.join(self.persist_dir, "journal.jsonl")
        with open(path, "a", encoding="utf-8") as f:
            for op in ops:
                f.write(json.dumps(op) + "\n")
            f.flush()
            # sqlite-grade durability (the claim above): survive power
            # loss, not just process crashes. IMATCH_JOURNAL_FSYNC=0 trades
            # that for latency.
            if os.environ.get("IMATCH_JOURNAL_FSYNC", "1") != "0":
                os.fsync(f.fileno())
        self._journal_len += len(ops)

    def checkpoint(self, force: bool = False):
        """Compact the journal into a snapshot when it has grown past a
        quarter of the live set (or always, with force)."""
        if self.persist_dir is None:
            return
        with self._lock:
            if force or self._journal_len >= max(256, self.count() // 4):
                self.save(self.persist_dir)

    # -- incremental device-state maintenance --------------------------------

    def _patch_or_invalidate(self, kind: str, slots, rows=None):
        """Mutation epilogue (caller holds the lock): absorb the mutation
        into the cached prepared state with an O(batch) scatter
        (index/patch.py) instead of dropping it — dropping means the
        next query re-copies and re-uploads the ENTIRE corpus (~3 GB at
        1M x 512), the one place the design lost to hnswlib's
        incremental insert (/root/reference/backend/app/main.py:735).

        Falls back to invalidate-and-rebuild when the engine or the
        patch declines (IVF staleness budget exceeded, member table
        full, capacity grew — _ensure_capacity/_maybe_compact null the
        state before we get here). Buffers are donated (true in-place
        HBM update) only while no in-flight query holds the current
        state."""
        self._gen += 1
        dc = self._device
        if dc is None:
            return
        if not (_patch.enabled() and len(slots)):
            self._device = None
            self._patch_rebuilds += 1
            return
        slots = np.asarray(slots, np.int64)
        tag = dc[0]
        ivf_host = None
        if kind == "append" and tag in ("ivf", "ivf-sharded"):
            h = self._ivf_host
            frac = float(os.environ.get("IMATCH_IVF_REBUILD_FRAC", "0.3"))
            if (
                h is None
                or h.get("kind") != tag
                or "counts" not in h
                or (self._n - self._dead) > h["built_live"] * (1.0 + frac)
            ):
                # stale clustering (or a pre-counts host state): let the
                # next build retrain/repair instead of packing new rows
                # into a layout that is about to be replaced
                self._device = None
                self._patch_rebuilds += 1
                return
            ivf_host = h
        donate = self._inflight == 0
        try:
            if kind == "append":
                res = _patch.append_rows(
                    dc, slots, rows, donate=donate, ivf_host=ivf_host
                )
                if res is not None:
                    new_dc, host_upd = res
                    self._device = new_dc
                    if host_upd is not None:
                        cl, counts_upd = host_upd
                        ivf_host["assign"][slots] = cl
                        if isinstance(counts_upd, dict):
                            for s, nc in counts_upd.items():
                                ivf_host["counts"][s] = nc
                        else:
                            ivf_host["counts"] = counts_upd
                    self._patched += 1
                    return
            elif kind == "delete":
                res = _patch.delete_rows(dc, slots, donate=donate)
                if res is not None:
                    self._device = res
                    self._patched += 1
                    return
            else:
                res = _patch.update_rows(dc, slots, rows, donate=donate)
                if res is not None:
                    self._device = res
                    self._patched += 1
                    return
        except Exception:
            # a failed patch must degrade to the always-correct rebuild,
            # never poison the serving path (donated inputs are dead
            # either way — the state is dropped below)
            logger.exception(
                "incremental %s patch failed — falling back to a rebuild",
                kind,
            )
        self._device = None
        self._patch_rebuilds += 1

    # -- device-resident ingest ----------------------------------------------

    def _drain_pending(self):
        """Complete deferred device-resident adds: fill the host mirror
        rows and append their journal entries (FIFO — journal order ==
        op order). The d2h copies were started async at add() time, so
        by the time a drain point is reached the bytes have usually
        already flowed under the device compute. Caller need not hold
        the lock (RLock; every caller in this file already does)."""
        if not self._pending:
            return
        with self._lock:
            # pop each batch only AFTER it fully drains: a failed d2h
            # mid-queue must leave the remainder pending (retried at the
            # next drain point), not silently dropped with live ids whose
            # mirror rows are zeros and whose journal entries never land
            while self._pending:
                base, k, rows_dev, ids, mds, docs = self._pending[0]
                host = np.asarray(rows_dev, np.float32)
                self._emb[base : base + k] = host
                if self.persist_dir is not None:
                    self._journal(
                        *(
                            {
                                "op": "add",
                                "id": id_,
                                "metadata": md,
                                "document": doc,
                                "embedding": self._enc_emb(host[i]),
                            }
                            for i, (id_, md, doc) in enumerate(
                                zip(ids, mds, docs)
                            )
                        )
                    )
                self._pending.pop(0)

    def _add_device(self, ids, emb, metadatas, documents):
        """add() with embeddings already ON DEVICE (a jax.Array, e.g.
        straight out of the CLIP tower): the rows are scattered
        device-to-device into the capacity-padded index buffers
        (index/patch.py) and NEVER cross the host link on the hot path —
        the tpu-native answer to hnswlib's incremental insert
        (/root/reference/backend/app/main.py:735), which is
        intrinsically host-resident. The host fp32 mirror and the
        journal entry are deferred: a non-blocking d2h copy starts here
        and completes at the next drain point (any journaled op, a
        rebuild, save/get(embeddings) — see _drain_pending). With a
        journal this widens per-op durability to the next drain;
        flush()/checkpoint()/SIGTERM-save all drain first.

        Caller (add) holds the lock and has validated ids non-empty."""
        if emb.ndim == 1:
            emb = emb[None]
        if emb.shape[0] != len(ids):
            raise ValueError(f"{len(ids)} ids but {emb.shape[0]} embeddings")
        if self.dim is None:
            self.dim = int(emb.shape[1])
        elif int(emb.shape[1]) != self.dim:
            # the numpy path would raise at the slice copy; the device
            # path must not discover this at drain time
            raise ValueError(
                f"embedding dim {emb.shape[1]} != store dim {self.dim}"
            )
        metadatas = _norm_row_lists(metadatas, len(ids), "metadatas")
        documents = _norm_row_lists(documents, len(ids), "documents")
        seen = set()
        for i in ids:
            if i in self._slot or i in seen:
                raise ValueError(f"duplicate id {i}")
            seen.add(i)
        if emb.dtype != jnp.float32:
            emb = emb.astype(jnp.float32)
        try:
            emb.copy_to_host_async()
        except Exception:  # pragma: no cover - backend without async d2h
            pass
        self._ensure_capacity(len(ids))
        base = self._n
        self._alive[base : base + len(ids)] = True
        self._ids.extend(ids)
        self._meta.extend(metadatas)
        self._docs.extend(documents)
        self._slot.update(zip(ids, range(base, base + len(ids))))
        self._n = base + len(ids)
        self._pending.append(
            (base, len(ids), emb, list(ids), list(metadatas), list(documents))
        )
        self._patch_or_invalidate(
            "append", np.arange(base, self._n, dtype=np.int64), emb
        )
        # bound the HBM held by undrained batches (each is also live in
        # the index buffers, so pending rows cost 2x until drained)
        if len(self._pending) >= int(
            os.environ.get("IMATCH_PENDING_MAX", "64")
        ):
            self._drain_pending()

    def flush(self):
        """Complete any deferred device-resident adds (host mirror +
        journal). No-op unless add() was called with device arrays."""
        with self._lock:
            self._drain_pending()

    # -- chroma-like API ----------------------------------------------------

    def add(
        self,
        ids: Sequence[str],
        embeddings: Sequence[Sequence[float]],
        metadatas: Optional[Sequence[dict]] = None,
        documents: Optional[Sequence[Optional[str]]] = None,
    ):
        if not len(ids):
            # chroma parity: an empty add is a client error (and
            # np.asarray([]) is shape (0,) — inferring dim from it would
            # permanently poison the store with dim=0).
            raise ValueError("expected non-empty ids for add")
        with self._lock:
            if isinstance(embeddings, jax.Array):
                return self._add_device(ids, embeddings, metadatas, documents)
            if self._pending and self.persist_dir is not None:
                # journal order == op order: deferred device adds must
                # hit the journal before this add's entries
                self._drain_pending()
            embeddings = np.asarray(embeddings, dtype=np.float32)
            if embeddings.ndim == 1:
                embeddings = embeddings[None]
            if embeddings.shape[0] != len(ids):
                # must precede any mutation: the vectorized slice copy
                # below would silently numpy-broadcast a (1, D) batch
                # across every id
                raise ValueError(
                    f"{len(ids)} ids but {embeddings.shape[0]} embeddings"
                )
            if self.dim is None:
                self.dim = int(embeddings.shape[1])
            elif embeddings.ndim != 2 or int(embeddings.shape[1]) != self.dim:
                # the slice copy below does NOT always raise on a dim
                # mismatch: an (n, 1) batch numpy-broadcasts into
                # constant dim-D rows with no error
                raise ValueError(
                    f"embedding shape {embeddings.shape} != "
                    f"({len(ids)}, {self.dim})"
                )
            metadatas = _norm_row_lists(metadatas, len(ids), "metadatas")
            documents = _norm_row_lists(documents, len(ids), "documents")
            seen = set()
            for i in ids:
                # chroma rejects duplicates both against the collection
                # AND within the batch (an in-batch dup would leave an
                # unreachable-but-alive phantom slot here)
                if i in self._slot or i in seen:
                    raise ValueError(f"duplicate id {i}")
                seen.add(i)
            self._ensure_capacity(len(ids))
            base = self._n
            # bulk row insert: one vectorized copy + dict/list extends
            # instead of a per-row python loop — restart rehydration is
            # ONE add() of the whole snapshot (1M rows), and the loop
            # form dominated its profile
            self._emb[base : base + len(ids)] = embeddings
            self._alive[base : base + len(ids)] = True
            self._ids.extend(ids)
            self._meta.extend(metadatas)
            self._docs.extend(documents)
            self._slot.update(zip(ids, range(base, base + len(ids))))
            self._n = base + len(ids)
            self._patch_or_invalidate(
                "append",
                np.arange(base, self._n, dtype=np.int64),
                embeddings,
            )
            if self.persist_dir is not None:
                # build ops only when a journal exists: the base64
                # embedding encode is ~40% of a non-persistent bulk
                # add's time if done eagerly (the old *generator call
                # evaluated it before _journal could no-op)
                self._journal(
                    *(
                        {
                            "op": "add",
                            "id": id_,
                            "metadata": md,
                            "document": doc,
                            "embedding": self._enc_emb(embeddings[i]),
                        }
                        for i, (id_, md, doc) in enumerate(
                            zip(ids, metadatas, documents)
                        )
                    )
                )

    def get(
        self,
        ids: Optional[Sequence[str]] = None,
        include: Sequence[str] = ("metadatas", "documents"),
    ) -> dict:
        with self._lock:
            if "embeddings" in include:
                self._drain_pending()
            if ids is None:
                slots = [i for i in range(self._n) if self._alive[i]]
            else:
                slots = [
                    self._slot[i]
                    for i in ids
                    if i in self._slot and self._alive[self._slot[i]]
                ]
            out = {"ids": [self._ids[s] for s in slots]}
            if "metadatas" in include:
                out["metadatas"] = [self._meta[s] for s in slots]
            if "documents" in include:
                out["documents"] = [self._docs[s] for s in slots]
            if "embeddings" in include:
                out["embeddings"] = (
                    self._emb[slots].copy() if slots else np.zeros((0, self.dim or 0))
                )
            return out

    def update(
        self,
        ids: Sequence[str],
        embeddings: Optional[Sequence[Sequence[float]]] = None,
        metadatas: Optional[Sequence[dict]] = None,
    ):
        with self._lock:
            # an update may target a slot whose device-resident add is
            # still pending — drain first or the deferred host fill
            # would overwrite the new value (and the journal would
            # record the ops out of order)
            self._drain_pending()
            # Validate EVERY id before touching any state: a bad id
            # mid-batch must not leave the host mirror/journal mutated
            # for earlier rows while the cached device index (never
            # patched, gen never bumped) keeps serving their old
            # vectors — restart and live serving would disagree.
            slots_all: List[int] = []
            for id_ in ids:
                slot = self._slot.get(id_)
                if slot is None or not self._alive[slot]:
                    raise KeyError(id_)
                slots_all.append(slot)
            # length/shape validation BEFORE any mutation, same rule as
            # the id check above: a short metadatas/embeddings list must
            # not IndexError mid-loop with earlier rows already updated
            # in memory and no journal entry written
            if metadatas is not None and len(metadatas) != len(ids):
                raise ValueError(
                    f"{len(ids)} ids but {len(metadatas)} metadatas"
                )
            if embeddings is not None:
                embeddings = np.asarray(embeddings, dtype=np.float32)
                if embeddings.ndim == 1:
                    embeddings = embeddings[None]
                if embeddings.shape != (len(ids), self.dim):
                    raise ValueError(
                        f"embedding shape {embeddings.shape} != "
                        f"({len(ids)}, {self.dim})"
                    )
            emb_slots: List[int] = []
            ops: List[dict] = []
            for i, (id_, slot) in enumerate(zip(ids, slots_all)):
                if metadatas is not None:
                    self._meta[slot] = metadatas[i]
                if embeddings is not None:
                    self._emb[slot] = embeddings[i]
                    if self._ivf_host is not None:
                        # vector changed — its nearest centroid may have
                        # too; -1 re-enters it through the repair pass
                        self._ivf_host["assign"][slot] = -1
                    emb_slots.append(slot)
                op = {"op": "update", "id": id_}
                if metadatas is not None:
                    op["metadata"] = metadatas[i]
                if embeddings is not None:
                    op["embedding"] = self._enc_emb(embeddings[i])
                ops.append(op)
            # one journal write + fsync for the whole batch, matching
            # add()/delete() — not one fsync per row
            self._journal(*ops)
            if emb_slots:
                self._patch_or_invalidate(
                    "update",
                    np.asarray(emb_slots, np.int64),
                    self._emb[emb_slots],
                )

    def delete(self, ids: Sequence[str]):
        with self._lock:
            # journal order + compaction reads self._emb
            self._drain_pending()
            deleted = []
            slots = []
            for id_ in ids:
                slot = self._slot.pop(id_, None)
                if slot is not None and self._alive[slot]:
                    self._alive[slot] = False
                    self._dead += 1
                    deleted.append(id_)
                    slots.append(slot)
            if deleted:
                gen0 = self._gen
                self._maybe_compact()
                if self._gen == gen0:
                    # no compaction — a validity-mask flip suffices
                    self._patch_or_invalidate(
                        "delete", np.asarray(slots, np.int64)
                    )
            self._journal(*({"op": "delete", "id": i} for i in deleted))

    def count(self) -> int:
        with self._lock:
            return self._n - self._dead

    def stats(self) -> dict:
        """Operational snapshot for /api/metrics: engine + occupancy +
        ANN-tier state (cluster count, live rows at last training, and
        whether the last build repaired or retrained) + last build
        timing. No reference equivalent — chroma exposes nothing."""
        with self._lock:
            cap = 0 if self._emb is None else self._emb.shape[0]
            out = {
                "engine": self.engine,
                "dim": self.dim,
                "live": self._n - self._dead,
                "slots": self._n,
                "tombstones": self._dead,
                "capacity": cap,
                "score_dtype": jnp.dtype(self.score_dtype).name,
                "coalescing": self._coalescer is not None,
                "device_ready": self._device is not None,
                "journal_ops": self._journal_len,
                # incremental mutation health: patched should dominate
                # rebuilds in steady state (index/patch.py)
                "patched_mutations": self._patched,
                "rebuild_mutations": self._patch_rebuilds,
                # device-resident adds whose host mirror/journal entry
                # is still deferred (drained at the next journaled op,
                # rebuild, save, or flush())
                "pending_host_syncs": len(self._pending),
            }
            h = self._ivf_host
            if h is not None:
                cents = h["cents"]
                n_clusters = (
                    sum(int(c.shape[0]) for c in cents)
                    if isinstance(cents, list)
                    else int(cents.shape[0])
                )
                out["ivf"] = {
                    "kind": h["kind"],
                    "clusters": n_clusters,
                    "built_live": int(h["built_live"]),
                    "last_mode": h.get("last_mode"),
                }
            lb = self._last_build
            if lb is not None:
                out["last_build"] = dict(lb)
        return out

    # -- search -------------------------------------------------------------

    def _engine_for(self, emb_copy: np.ndarray) -> str:
        """Effective engine for one build. With IMATCH_INDEX_ENGINE=auto
        the choice is capacity-aware per build: when the device copies
        this engine would pin (score dtype + fp32 rescore, divided over
        the mesh for sharded) exceed IMATCH_AUTO_HBM_FRAC (default 0.5)
        of per-device HBM, escalate to the tilemax-host tier — int8 in
        HBM, fp32 rescore on host, still exact — instead of OOMing as
        the corpus grows. Escalation only happens when the host tier's
        own single-chip int8 footprint is BOTH smaller than the current
        engine's per-device cost and itself within budget: on a wide
        mesh, 6/P bytes/chip sharded can already beat 1 byte/chip int8,
        and swapping into a larger footprint would be strictly worse.
        Non-auto engines are never overridden.

        Footprints use the capacity-padded buffer the engines actually
        upload (emb_copy), not the live count — the padding is what HBM
        has to hold."""
        eng = self.engine
        if not self._auto or eng not in ("tilemax", "sharded"):
            return eng
        budget = os.environ.get("IMATCH_DEVICE_BYTES_BUDGET")
        if budget is None:
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                budget = stats.get("bytes_limit")
            except Exception:
                budget = None
        if not budget:
            return eng
        score_bytes = jnp.dtype(
            jnp.bfloat16 if self.score_dtype == jnp.int8 else self.score_dtype
        ).itemsize
        per_device = emb_copy.size * (score_bytes + 4)
        if eng == "sharded":
            per_device //= max(1, len(jax.devices()))
        host_tier = emb_copy.size  # int8 scoring matrix on ONE chip
        frac = float(os.environ.get("IMATCH_AUTO_HBM_FRAC", "0.5"))
        limit = frac * float(budget)
        if per_device > limit and host_tier < per_device:
            if host_tier > limit:
                logger.warning(
                    "auto index engine: %.2f GB/device exceeds %.0f%% of "
                    "HBM and even the int8 host tier needs %.2f GB — "
                    "escalating anyway as the smaller footprint; consider "
                    "a larger mesh or IMATCH_INDEX_ENGINE=ivf-sharded",
                    per_device / 2**30,
                    frac * 100,
                    host_tier / 2**30,
                )
            else:
                logger.warning(
                    "auto index engine: %.2f GB/device exceeds %.0f%% of "
                    "HBM (%.2f GB) — escalating to tilemax-host for this "
                    "build",
                    per_device / 2**30,
                    frac * 100,
                    float(budget) / 2**30,
                )
            return "tilemax-host"
        return eng

    def _capture_ivf(self) -> Optional[dict]:
        """Copy of the IVF host state for an outside-lock build (caller
        must hold the lock). ``assign`` is copied because the repair
        pass writes into it while writers may mutate the original;
        ``cents`` is immutable once trained."""
        h = self._ivf_host
        if h is None:
            return None
        snap = dict(h)
        snap["assign"] = h["assign"].copy()
        return snap

    def _build_ivf(self, emb_copy, alive_copy, snap):
        """Single-device IVF build with incremental repair.

        When host state from a previous build exists and the live set
        has grown less than IMATCH_IVF_REBUILD_FRAC (default 0.3) since
        the last k-means, the build only assigns rows with no cluster
        yet (new adds, updated vectors) against the EXISTING centroids
        and re-packs the member lists — O(new rows) device work + one
        vectorized numpy pack instead of a full Lloyd run. Past the
        growth threshold the clustering is considered stale (sqrt(N)
        cluster sizing and centroid positions drift) and k-means reruns.

        Returns ``(state, host_state)``."""
        from imatch_tpu.index.ivf import (
            assign_rows,
            pack_ivf_stats,
            train_centroids,
        )

        cap = emb_copy.shape[0]
        live = int(alive_copy.sum())
        frac = float(os.environ.get("IMATCH_IVF_REBUILD_FRAC", "0.3"))
        if (
            snap is not None
            and snap.get("kind", "ivf") == "ivf"
            and snap["cents"].shape[1] == emb_copy.shape[1]
            and live <= snap["built_live"] * (1.0 + frac)
        ):
            assign = snap["assign"]
            if assign.shape[0] < cap:
                assign = np.concatenate(
                    [assign, np.full((cap - assign.shape[0],), -1, np.int32)]
                )
            else:
                assign = assign[:cap]
            assign[~alive_copy] = -1  # dead slots: reused slots must repair
            fresh = np.nonzero((assign == -1) & alive_copy)[0]
            if fresh.size:
                assign[fresh] = assign_rows(emb_copy[fresh], snap["cents"])
            try:
                state, pack_stats = pack_ivf_stats(
                    emb_copy, alive_copy, snap["cents"], assign
                )
            except (IndexError, ValueError) as e:
                # semantically-corrupt host state (e.g. a bad sidecar
                # that passed the load-time shape checks) must degrade
                # to a retrain, never poison the serving path
                logger.warning(
                    "IVF repair failed (%s) — retraining from scratch", e
                )
                snap = None
                return self._build_ivf(emb_copy, alive_copy, None)
            host = {
                "kind": "ivf",
                "cents": snap["cents"],
                "assign": assign,
                "built_live": snap["built_live"],
                "last_mode": "repair",
                **pack_stats,
            }
            return state, host
        cents = train_centroids(emb_copy, alive_copy)
        cents_np = np.asarray(cents, np.float32)
        assign = assign_rows(emb_copy, cents)
        # the streamed argmax assigns EVERY capacity slot — dead and
        # padding rows (zero vectors) land in some arbitrary cluster.
        # Stamp them unassigned, or rows added into those slots later
        # would be treated as already-placed by the repair pass and
        # packed into the wrong member list (invisible at low n_probe).
        assign[~alive_copy] = -1
        state, pack_stats = pack_ivf_stats(
            emb_copy, alive_copy, cents_np, assign
        )
        return state, {
            "kind": "ivf",
            "cents": cents_np,
            "assign": assign,
            "built_live": live,
            "last_mode": "train",
            **pack_stats,
        }

    def _build_device(
        self,
        emb_copy: np.ndarray,
        alive_copy: np.ndarray,
        ivf_snap: Optional[dict] = None,
    ):
        """Engine-specific prepared state from COPIES of the host
        buffers (jnp.asarray can alias numpy memory, and writers mutate
        the live buffers in place — aliasing would let a concurrent
        add() tear rows inside an in-flight query or a cached index).
        Runs OUTSIDE the store lock: at capacity scale the prepare is
        seconds of quantization/upload and must not block writers.

        Returns ``((engine_tag, state), ivf_host)`` — the tag records
        which engine built the state, so auto-escalated builds dispatch
        correctly in _run_engine even though self.engine still reads the
        default; ``ivf_host`` is the updated incremental-IVF host state
        (None for every other engine), installed by the caller under the
        same generation check as the device state."""
        t0 = time.perf_counter()
        dc, ivf_host = self._build_device_inner(
            emb_copy, alive_copy, ivf_snap
        )
        # info-only write, races just yield slightly stale stats();
        # dc[0] is the EFFECTIVE tag (auto may have escalated)
        self._last_build = {
            "engine": dc[0],
            "seconds": round(time.perf_counter() - t0, 3),
            "rows": int(emb_copy.shape[0]),
        }
        return dc, ivf_host

    def _build_device_inner(
        self,
        emb_copy: np.ndarray,
        alive_copy: np.ndarray,
        ivf_snap: Optional[dict] = None,
    ):
        eng = self._engine_for(emb_copy)
        if eng == "tilemax-host":
            from imatch_tpu.index.search import prepare_host_rescore_corpus

            # host-side quantize: ONLY the int8 matrix crosses to HBM
            # (the fp32 corpus would not fit); the copies stay host-side
            # for the rescore
            return (
                eng,
                prepare_host_rescore_corpus(emb_copy, alive_copy),
            ), None
        if eng == "sharded":
            from imatch_tpu.parallel.dist_search import prepare_sharded_corpus
            from imatch_tpu.parallel.mesh import make_mesh

            if self._mesh is None:
                self._mesh = make_mesh(model_parallel=1)
            dtype = (
                jnp.bfloat16
                if self.score_dtype == jnp.int8
                else self.score_dtype
            )
            return (
                eng,
                prepare_sharded_corpus(
                    emb_copy, alive_copy, mesh=self._mesh, score_dtype=dtype
                ),
            ), None
        emb = jnp.asarray(emb_copy)
        alive = jnp.asarray(alive_copy)
        if eng == "pallas":
            from imatch_tpu.ops.pallas.topk import prepare_corpus

            dtype = (
                jnp.bfloat16
                if self.score_dtype == jnp.int8
                else self.score_dtype
            )
            return (eng, prepare_corpus(emb, alive, score_dtype=dtype)), None
        if eng == "ivf":
            state, host = self._build_ivf(emb_copy, alive_copy, ivf_snap)
            return (eng, state), host
        if eng == "ivf-sharded":
            from imatch_tpu.parallel.dist_ivf import (
                prepare_sharded_ivf_incremental,
            )
            from imatch_tpu.parallel.mesh import make_mesh

            if self._mesh is None:
                self._mesh = make_mesh(model_parallel=1)
            snap = (
                ivf_snap
                if ivf_snap and ivf_snap.get("kind") == "ivf-sharded"
                else None
            )
            state, host = prepare_sharded_ivf_incremental(
                emb_copy, alive_copy, mesh=self._mesh, snap=snap
            )
            return (eng, state), host
        return (
            eng,
            prepare_device_corpus(emb, alive, score_dtype=self.score_dtype),
        ), None

    def _device_state(self):
        """Prepared device state; caller must hold the lock. Kept for
        non-query internal uses — the query path goes through
        _snapshot_for_query, which builds outside the lock. NOT
        donation-safe: a mutation after this returns may patch the state
        in place (buffer donation, index/patch.py) — don't hold the
        result across store mutations (benches/tests use it strictly
        read-only)."""
        if self._device is None:
            cap = 0 if self._emb is None else self._emb.shape[0]
            if cap == 0:
                return None
            self._drain_pending()  # rebuild reads the host mirror
            dc, ivf_host = self._build_device(
                self._emb.copy(), self._alive.copy(), self._capture_ivf()
            )
            self._device = dc
            if ivf_host is not None:
                self._ivf_host = ivf_host
        return self._device

    def _run_engine(self, q: np.ndarray, dc, k: int):
        """One device dispatch on the prepared corpus; returns device arrays
        (numpy for the tilemax-host tier — device_get passes it through).
        ``dc`` is _build_device's (engine_tag, state) pair."""
        eng, state = dc
        if eng == "tilemax-host":
            from imatch_tpu.index.search import host_rescore_topk

            return host_rescore_topk(q, state, k=k)
        if eng == "sharded":
            from imatch_tpu.parallel.dist_search import sharded_topk_prepared

            return sharded_topk_prepared(q, state, k=k)
        if eng == "pallas":
            from imatch_tpu.ops.pallas.topk import pallas_topk_prepared

            return pallas_topk_prepared(jnp.asarray(q), state, k=k)
        if eng == "ivf":
            from imatch_tpu.index.ivf import ivf_topk

            n_probe = int(os.environ.get("IMATCH_IVF_NPROBE", "8"))
            return ivf_topk(jnp.asarray(q), state, k=k, n_probe=n_probe)
        if eng == "ivf-sharded":
            from imatch_tpu.parallel.dist_ivf import sharded_ivf_topk

            n_probe = int(os.environ.get("IMATCH_IVF_NPROBE", "8"))
            return sharded_ivf_topk(q, state, k=k, n_probe=n_probe)
        return tilemax_topk(jnp.asarray(q), state, k=k)

    @staticmethod
    def _k_bucket(k: int) -> int:
        # bucket the static k so a growing corpus doesn't recompile the
        # query every time live-count changes below the requested limit
        return 1 << max(0, (k - 1)).bit_length()

    def _snapshot_for_query(self):
        """Consistent (device corpus, id/meta/doc lists) pair. Safe to
        read lock-free afterwards: ``add`` only appends (indices in the
        captured corpus stay valid), ``delete`` only flips the alive
        mask, and compaction *rebinds* the lists rather than mutating
        them — the captured references keep the layout the captured
        corpus was built from.

        The buffer COPY happens under the lock (consistency), but the
        engine prepare (quantize/tile/upload — seconds at capacity
        scale) runs OUTSIDE it and is installed with a generation
        check, so writers never wait on a rebuild."""
        with self._lock:
            live = self.count()
            dc = self._device
            ids_l, meta_l, docs_l = self._ids, self._meta, self._docs
            emb = alive = None
            gen = self._gen
            if dc is None:
                cap = 0 if self._emb is None else self._emb.shape[0]
                if cap == 0:
                    return live, None, ids_l, meta_l, docs_l
                self._drain_pending()  # rebuild reads the host mirror
                emb = self._emb.copy()
                alive = self._alive.copy()
                ivf_snap = self._capture_ivf()
            else:
                # holding a reference: mutations must not DONATE these
                # buffers out from under us (released in the caller's
                # finally via _release_snapshot)
                self._inflight += 1
        if dc is None:
            dc, ivf_host = self._build_device(emb, alive, ivf_snap)
            with self._lock:
                if self._gen == gen and self._device is None:
                    self._device = dc
                    if ivf_host is not None:
                        self._ivf_host = ivf_host
                # a concurrent mutation invalidated us: dc is still
                # consistent with the ids/meta captured above, so THIS
                # query uses it (and the stale-gen host state is
                # discarded); the next query rebuilds fresh. Either way
                # we now hold a state a later patch could donate.
                self._inflight += 1
        return live, dc, ids_l, meta_l, docs_l

    def _release_snapshot(self, dc):
        """Drop the in-flight hold taken by _snapshot_for_query (no-op
        for the empty-store case where no state was captured)."""
        if dc is None:
            return
        with self._lock:
            self._inflight -= 1

    def warm(
        self,
        n_results_list: Sequence[int] = (1, 10, 25, 50, 100, 1000),
        q_counts: Sequence[int] = (1,),
    ):
        """Pre-compile the query engine for the k buckets the serving
        layer uses (limit select 10/25/50/100/All→1000), so first user
        searches don't pay a jit compile. ``q_counts``: also compile
        these query-count buckets (the coalescer and /api/search/batch
        dispatch (Q, d) blocks; Q is pow2-bucketed like k)."""
        live, dc, _, _, _ = self._snapshot_for_query()
        try:
            if dc is None or live == 0:
                return
            seen = set()
            for qc in q_counts:
                q = np.zeros((self._k_bucket(qc), self.dim), np.float32)
                for nr in n_results_list:
                    k_c = self._k_bucket(min(nr, live))
                    if (q.shape[0], k_c) in seen:
                        continue
                    seen.add((q.shape[0], k_c))
                    jax.device_get(self._run_engine(q, dc, k_c))
        finally:
            self._release_snapshot(dc)

    def set_coalescing(self, enabled: bool):
        """Public toggle for the dynamic-batching front (see __init__);
        disabling stops the worker thread and releases its reference to
        this store."""
        if enabled and self._coalescer is None:
            from imatch_tpu.runtime.coalesce import QueryCoalescer

            self._coalescer = QueryCoalescer(self._query_impl)
        elif not enabled and self._coalescer is not None:
            self._coalescer.close()
            self._coalescer = None

    @property
    def coalescing(self) -> bool:
        return self._coalescer is not None

    def query(
        self,
        query_embeddings: Sequence[Sequence[float]],
        n_results: int = 10,
        include: Sequence[str] = ("metadatas", "distances"),
    ) -> dict:
        """Chroma-shaped result: lists-of-lists, ascending cosine distance.

        The device matmul runs OUTSIDE the store lock (the lock only
        guards the snapshot capture), so concurrent searches pipeline on
        the device instead of serializing behind one another, and writers
        are never blocked for a full query round-trip. With coalescing
        enabled concurrent single-row queries additionally share one
        batched dispatch (runtime/coalesce.py).

        ``query_embeddings`` may be a jax.Array still in flight (e.g.
        ClipEmbedder.embed_text_device output): the scoring matmul then
        chains onto it on device with no host materialization in between.

        Metrics: ``index.query`` times each REQUEST (including any
        coalescer queueing); ``index.dispatch`` times each engine call
        (== one coalesced batch).
        """
        if isinstance(query_embeddings, jax.Array):
            q = query_embeddings
        else:
            q = np.asarray(query_embeddings, dtype=np.float32)
        if q.ndim == 1:
            q = q[None]
        with METRICS.timer("index.query"):
            # single read: set_coalescing(False) can null the attribute
            # between a check and a call on another thread
            c = self._coalescer
            if q.shape[0] == 1 and c is not None:
                from imatch_tpu.runtime.coalesce import CoalescerClosed

                try:
                    return c.submit(q, n_results, tuple(include))
                except CoalescerClosed:
                    pass  # disabled concurrently — serve directly
            return self._query_impl(q, n_results, include)

    def _query_impl(
        self,
        q,
        n_results: int,
        include: Sequence[str],
    ) -> dict:
        qn = q.shape[0]
        live, dc, ids_l, meta_l, docs_l = self._snapshot_for_query()
        try:
            k = min(n_results, live)
            out = {
                "ids": [],
                "distances": [],
                "metadatas": [],
                "documents": [],
            }
            if live == 0 or k == 0:
                for key in out:
                    out[key] = [[] for _ in range(qn)]
                return self._strip_include(out, include)
            k_c = self._k_bucket(k)
            # bucket the query COUNT too: the engines are jit-compiled
            # per (Q, k) shape, so without this every distinct batch size
            # on /api/search/batch would pay a fresh XLA compile.
            # Zero-row padding is dropped below; worst-case extra score
            # work is <2x and only on already-batched requests.
            q_c = self._k_bucket(qn)
            if q_c != qn:
                pad = ((0, q_c - qn), (0, 0))
                q = (
                    jnp.pad(q, pad)
                    if isinstance(q, jax.Array)
                    else np.pad(q, pad)
                )
            with METRICS.timer("index.dispatch"), GATE.priority():
                # one transfer for both outputs: each np.asarray would be
                # its own blocking host round-trip (2x the tunnel RTT).
                # GATE.priority(): bulk streams (caption decode segments,
                # VQA/embed chunks) park at their next checkpoint while
                # this dispatch+fetch is in flight — searches never queue
                # behind a whole caption batch (runtime/scheduler.py).
                scores, idx = jax.device_get(self._run_engine(q, dc, k_c))
        finally:
            self._release_snapshot(dc)
        scores = scores[:qn, :k]
        idx = idx[:qn, :k]
        for qi in range(qn):
            row_ids, row_d, row_m, row_doc = [], [], [], []
            for s, i in zip(scores[qi], idx[qi]):
                if i < 0:
                    continue
                row_ids.append(ids_l[i])
                row_d.append(float(1.0 - s))  # chroma cosine distance
                row_m.append(meta_l[i])
                row_doc.append(docs_l[i])
            out["ids"].append(row_ids)
            out["distances"].append(row_d)
            out["metadatas"].append(row_m)
            out["documents"].append(row_doc)
        return self._strip_include(out, include)

    @staticmethod
    def _strip_include(out: dict, include: Sequence[str]) -> dict:
        """Drop keys the caller didn't ask for — ONE definition shared
        by the empty-store early return and the scored path, so the
        result's key set doesn't change with store occupancy."""
        for key in ("metadatas", "documents", "distances"):
            if key not in include:
                out.pop(key)
        return out

    # -- persistence --------------------------------------------------------

    def save(self, path: Optional[str] = None):
        """Atomic durable snapshot (compacted); resets the journal.

        Generation scheme: data files are written under new
        ``embeddings-<gen>.npy`` / ``records-<gen>.jsonl`` names and the
        manifest — replaced last, atomically — is the commit record
        pointing at them. A crash at any point leaves the previous
        generation fully intact (three independent os.replace calls over
        fixed names could pair a new embeddings file with old records).
        """
        path = path or self.persist_dir
        if path is None:
            raise ValueError("no path and no persist_dir")
        with self._lock:
            self._drain_pending()  # snapshot reads the host mirror
            os.makedirs(path, exist_ok=True)
            slots = [i for i in range(self._n) if self._alive[i]]
            gen = int(time.time() * 1e6)
            emb_name = f"embeddings-{gen}.npy"
            # .json = ONE array, parsed in a single json.loads at
            # restart (per-line jsonl cost ~2.4 s per 300k records of
            # parse overhead; load() still reads legacy .jsonl)
            rec_name = f"records-{gen}.json"
            # IVF sidecar: trained centroids + per-row assignments in
            # SNAPSHOT order, so a restarted ivf store repairs (assign
            # journal-replayed rows only) instead of re-running k-means
            # over the whole corpus. Optional — load() falls back to a
            # full build if absent or unreadable.
            # Sharded assignments are position-dependent (shard = slot
            # // rows), so the sharded sidecar is only valid when the
            # snapshot preserves slot positions — i.e. no tombstones.
            # The single-device kind is layout-independent (assignments
            # travel with their row).
            h = self._ivf_host
            ivf_name = (
                f"ivf-{gen}.npz"
                if h is not None
                and (
                    h.get("kind") == "ivf"
                    or (h.get("kind") == "ivf-sharded" and self._dead == 0)
                )
                else None
            )
            tmp = tempfile.mkdtemp(dir=path, prefix=".snapshot-")
            try:
                with open(os.path.join(tmp, emb_name), "wb") as f:
                    np.save(
                        f,
                        self._emb[slots]
                        if slots
                        else np.zeros((0, self.dim or 0), np.float32),
                    )
                    f.flush()
                    os.fsync(f.fileno())
                with open(
                    os.path.join(tmp, rec_name), "w", encoding="utf-8"
                ) as f:
                    json.dump(
                        [
                            {
                                "id": self._ids[s],
                                "metadata": self._meta[s],
                                "document": self._docs[s],
                            }
                            for s in slots
                        ],
                        f,
                    )
                    f.flush()
                    os.fsync(f.fileno())
                if ivf_name is not None:
                    ipath = os.path.join(tmp, ivf_name)
                    assign_slots = (
                        self._ivf_host["assign"][slots]
                        if slots
                        else np.zeros((0,), np.int32)
                    )
                    if self._ivf_host.get("kind") == "ivf-sharded":
                        payload = {
                            "kind": np.str_("ivf-sharded"),
                            "assign": assign_slots,
                            "dp": np.int64(self._ivf_host["dp"]),
                            "rows": np.int64(self._ivf_host["rows"]),
                        }
                        for si, c in enumerate(self._ivf_host["cents"]):
                            payload[f"cents_{si}"] = c
                    else:
                        payload = {
                            "kind": np.str_("ivf"),
                            "cents": self._ivf_host["cents"],
                            "assign": assign_slots,
                        }
                    # live rows at the LAST K-MEANS, not snapshot count:
                    # restoring the snapshot count would ratchet the
                    # retrain baseline upward across save/restart cycles
                    payload["built_live"] = np.int64(
                        self._ivf_host["built_live"]
                    )
                    with open(ipath, "wb") as f:
                        np.savez(f, **payload)
                        f.flush()
                        os.fsync(f.fileno())
                os.replace(
                    os.path.join(tmp, emb_name), os.path.join(path, emb_name)
                )
                os.replace(
                    os.path.join(tmp, rec_name), os.path.join(path, rec_name)
                )
                if ivf_name is not None:
                    os.replace(
                        os.path.join(tmp, ivf_name),
                        os.path.join(path, ivf_name),
                    )
                mpath = os.path.join(tmp, "manifest.json")
                manifest = {
                    "dim": self.dim,
                    "count": len(slots),
                    "embeddings": emb_name,
                    "records": rec_name,
                    "generation": gen,
                }
                if ivf_name is not None:
                    manifest["ivf"] = ivf_name
                with open(mpath, "w") as f:
                    json.dump(
                        manifest,
                        f,
                    )
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(mpath, os.path.join(path, "manifest.json"))
            finally:
                for leftover in os.listdir(tmp):
                    os.unlink(os.path.join(tmp, leftover))
                os.rmdir(tmp)
            journal = os.path.join(path, "journal.jsonl")
            if os.path.exists(journal):
                os.unlink(journal)
            self._journal_len = 0
            # garbage-collect superseded generations (and legacy names)
            for f in os.listdir(path):
                if (
                    f.startswith(("embeddings", "records", "ivf"))
                    and f not in (emb_name, rec_name, ivf_name or "")
                ):
                    try:
                        os.unlink(os.path.join(path, f))
                    except OSError:
                        pass

    @classmethod
    def load(cls, path: str, persist: bool = True) -> "VectorStore":
        """Rehydrate: snapshot first, then replay the journal. With
        ``persist`` the returned store keeps journaling into ``path``."""
        manifest_path = os.path.join(path, "manifest.json")
        store = cls()
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            store.dim = manifest["dim"]
            emb_file = manifest.get("embeddings", "embeddings.npy")
            rec_file = manifest.get("records", "records.jsonl")
            emb = np.load(os.path.join(path, emb_file))
            with open(os.path.join(path, rec_file), encoding="utf-8") as f:
                if rec_file.endswith(".jsonl"):
                    # legacy line-per-record snapshots
                    records = [
                        json.loads(line) for line in f if line.strip()
                    ]
                else:
                    records = json.load(f)
            count = manifest.get("count", len(records))
            if not (len(records) == count == emb.shape[0]):
                raise ValueError(
                    f"corrupt snapshot in {path}: manifest count {count}, "
                    f"{len(records)} records, {emb.shape[0]} embedding rows"
                )
            if records:
                store.add(
                    ids=[r["id"] for r in records],
                    embeddings=emb,
                    metadatas=[r["metadata"] for r in records],
                    documents=[r["document"] for r in records],
                )
            ivf_file = manifest.get("ivf")
            if ivf_file and store._emb is not None:
                # restore the IVF sidecar BEFORE journal replay so
                # replayed mutations are tracked as unassigned rows; a
                # corrupt/missing sidecar must never block a restart —
                # the next build just re-trains.
                try:
                    with np.load(os.path.join(path, ivf_file)) as z:
                        kind = str(z["kind"]) if "kind" in z else "ivf"
                        assign = np.asarray(z["assign"], np.int32)
                        built_live = (
                            int(z["built_live"])
                            if "built_live" in z
                            else len(records)
                        )
                        if kind == "ivf-sharded":
                            cents = [
                                np.asarray(z[f"cents_{si}"], np.float32)
                                for si in range(int(z["dp"]))
                            ]
                            extra = {
                                "dp": int(z["dp"]),
                                "rows": int(z["rows"]),
                            }
                            dim_ok = all(
                                c.ndim == 2 and c.shape[1] == store.dim
                                for c in cents
                            )
                        else:
                            cents = np.asarray(z["cents"], np.float32)
                            extra = {}
                            dim_ok = (
                                cents.ndim == 2
                                and cents.shape[1] == store.dim
                            )
                        max_c = (
                            max((c.shape[0] for c in cents), default=0)
                            if kind == "ivf-sharded"
                            else cents.shape[0]
                        )
                        range_ok = bool(
                            np.all(assign >= -1) and np.all(assign < max_c)
                        ) if assign.size else True
                    if dim_ok and range_ok and (
                        assign.shape[0] == len(records)
                    ):
                        full = np.full(
                            (store._emb.shape[0],), -1, np.int32
                        )
                        full[: assign.shape[0]] = assign
                        # for the sharded kind, the build-time structural
                        # check (dp/rows vs the current mesh and capacity,
                        # dist_ivf.prepare_sharded_ivf_incremental) decides
                        # whether this state is reusable; a mismatch just
                        # retrains. built_live restores the live count at
                        # the last k-means (legacy sidecars fall back to
                        # the snapshot count).
                        store._ivf_host = {
                            "kind": kind,
                            "cents": cents,
                            "assign": full,
                            "built_live": built_live,
                            **extra,
                        }
                except (OSError, ValueError, KeyError, zipfile.BadZipFile):
                    logger.warning(
                        "ignoring unreadable IVF sidecar %s", ivf_file
                    )
        journal = os.path.join(path, "journal.jsonl")
        replayed = 0
        if os.path.exists(journal):
            with open(journal, "rb") as bf:
                raw = bf.read()
            # Scan by byte offset so a torn tail (crash mid-append) can be
            # TRUNCATED, not just skipped — otherwise the next append glues
            # onto the fragment and every later op is lost on the restart
            # after that.
            good_end = 0
            torn = False
            pos = 0
            for chunk in raw.split(b"\n"):
                end = min(pos + len(chunk) + 1, len(raw))
                line = chunk.decode("utf-8", "replace").strip()
                if not line:
                    pos = good_end = end
                    continue
                try:
                    op = json.loads(line)
                except json.JSONDecodeError:
                    torn = True
                    break
                pos = good_end = end
                try:
                    if op["op"] == "add":
                        store.add(
                            ids=[op["id"]],
                            embeddings=[cls._dec_emb(op["embedding"])],
                            metadatas=[op.get("metadata")],
                            documents=[op.get("document")],
                        )
                    elif op["op"] == "update":
                        store.update(
                            ids=[op["id"]],
                            embeddings=[cls._dec_emb(op["embedding"])]
                            if "embedding" in op
                            else None,
                            metadatas=[op["metadata"]]
                            if "metadata" in op
                            else None,
                        )
                    elif op["op"] == "delete":
                        store.delete([op["id"]])
                    replayed += 1
                except (KeyError, ValueError):
                    continue  # idempotent replay: dup adds etc.
            if torn and persist:
                with open(journal, "r+b") as bf:
                    bf.truncate(good_end)
        if persist:
            store.persist_dir = path
            store._journal_len = replayed
        return store
