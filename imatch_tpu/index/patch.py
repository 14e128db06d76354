"""Incremental device-state patching: O(batch) index mutations.

Before this module, ANY ``add/update/delete`` on the ``VectorStore``
dropped the cached device state, and the next query paid a full host
copy + full corpus re-upload (``store._build_device``) — ~3 GB per
ingest batch at 1M x 512, the one place the design still lost to
hnswlib's incremental insert (/root/reference/backend/app/main.py:735).

The store's capacity-padded layout makes mutations patchable in place:

- **appends** land in fresh slots inside the already-uploaded padding,
  so the patch is a scatter of just the new rows into the live device
  buffers (plus the per-row quantize/cast the full prepare would do);
- **deletes** only flip validity-mask entries;
- **updates** scatter the changed rows.

Each patch is a jit'd functional update. When no in-flight query holds
a reference to the current state (the store tracks a refcount under its
lock), the input buffers are **donated** so XLA updates them in place —
true O(batch) HBM traffic. With readers in flight the same patch runs
without donation (an HBM-speed device copy — still orders of magnitude
cheaper than the host re-upload) and the old state stays valid for
them.

Engine coverage (``None`` return = caller falls back to a full
rebuild, which is always correct):

- ``tilemax`` (bf16/fp32/int8), ``pallas``, ``sharded``: append /
  delete / update. Quantize/cast per-row matches the full prepare
  bit-for-bit (same jit'd formulas), pinned in
  tests/test_incremental.py.
- ``tilemax-host``: append / delete. The int8 rows are quantized with
  the SAME numpy code as ``prepare_host_rescore_corpus``; the shared
  host fp32 matrix is appended in place (old snapshots cannot reach the
  new slots — their validity copy still masks them) and the host
  validity array is copy-on-write. Embedding updates fall back: an
  in-place rewrite of a live host row could tear under a concurrent
  lock-free rescore.
- ``ivf`` / ``ivf-sharded``: append (assign new rows against the
  EXISTING centroids — the FAISS add discipline — and scatter them into
  free member-table slots) and delete. Falls back when a row lands in a
  pruned cluster, a member list is full, or the live set outgrew the
  retrain threshold (the store checks staleness before calling).

Kill switch: ``IMATCH_INCREMENTAL=0`` restores invalidate-on-mutation.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imatch_tpu.index.search import HostRescoreCorpus


def enabled() -> bool:
    return os.environ.get("IMATCH_INCREMENTAL", "1").lower() not in (
        "0",
        "false",
        "no",
        "off",
    )


def _bucket(n: int) -> int:
    """pow2-bucket mutation batch sizes so patch jits don't recompile
    per batch size (same discipline as the store's k/Q buckets)."""
    return 1 << max(0, (n - 1)).bit_length()


def _pad_idx(idx: np.ndarray) -> np.ndarray:
    """Pad a slot array to its pow2 bucket by repeating the first entry.
    Duplicate scatter indices writing the SAME value are order-agnostic,
    so the padding is idempotent."""
    b = _bucket(idx.shape[0])
    if b == idx.shape[0]:
        return idx
    return np.concatenate(
        [idx, np.full((b - idx.shape[0],), idx[0], idx.dtype)]
    )


def _pad_rows(rows, b: int):
    """Pad a row batch to its pow2 bucket by repeating row 0 (idempotent
    under the duplicate-index scatter, same as _pad_idx). Device arrays
    pad with device ops — np.concatenate on a jax.Array would force a
    host round-trip, defeating the device-resident ingest path."""
    if rows.shape[0] == b:
        return rows
    if isinstance(rows, jax.Array):
        return jnp.concatenate(
            [rows, jnp.broadcast_to(rows[:1], (b - rows.shape[0],) + rows.shape[1:])]
        )
    return np.concatenate(
        [rows, np.repeat(rows[:1], b - rows.shape[0], axis=0)]
    )


def _rows_f32(rows, tag: str):
    """Normalize a mutation row batch to fp32 for the patch kernels.

    numpy input stays numpy (one contiguous cast). jax.Array input stays
    ON DEVICE for the engines whose patch is a pure device scatter
    (tilemax / sharded / pallas) — the whole point of the device-resident
    add (store.add with a jax.Array): the embeddings computed by the
    model never cross the link. Engines whose patch needs host-side work
    (tilemax-host numpy quantization, IVF centroid assignment + member
    bookkeeping) materialize here instead."""
    if isinstance(rows, jax.Array):
        if tag in ("tilemax", "sharded", "pallas"):
            return rows if rows.dtype == jnp.float32 else rows.astype(jnp.float32)
        return np.ascontiguousarray(jax.device_get(rows), np.float32)
    return np.ascontiguousarray(rows, np.float32)


# ---------------------------------------------------------------------------
# jit'd patch kernels, cached per (donate, variant, shardings)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dense_rows_fn(donate: bool, int8: bool, shardings=None):
    """scoring/exact/valid(+scale) scatter at idx <- rows/alive. The
    int8 branch mirrors search._prepare_device_corpus's per-row
    symmetric quantization exactly (same jit'd fp32 ops)."""

    def f(scoring, exact, valid, scale, idx, rows, alive):
        rows32 = rows.astype(jnp.float32)
        if int8:
            amax = jnp.max(jnp.abs(rows32), axis=1)
            sc = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
            q = jnp.clip(
                jnp.round(rows32 / sc[:, None]), -127, 127
            ).astype(jnp.int8)
            scoring = scoring.at[idx].set(q)
            scale = scale.at[idx].set(sc)
        else:
            scoring = scoring.at[idx].set(rows32.astype(scoring.dtype))
        exact = exact.at[idx].set(rows32)
        valid = valid.at[idx].set(alive)
        return scoring, exact, valid, scale

    kw = {}
    if shardings is not None:
        row_sh, v_sh = shardings
        kw["out_shardings"] = (row_sh, row_sh, v_sh, None)
    return jax.jit(f, donate_argnums=(0, 1, 2, 3) if donate else (), **kw)


@functools.lru_cache(maxsize=None)
def _shared_rows_fn(donate: bool, shardings=None):
    """fp32 score dtype: scoring and exact may alias one buffer (the
    prepare's astype is an identity under jit), so patch ONE array and
    let the caller share it — donating the same buffer twice would
    conflict."""

    def f(exact, valid, idx, rows, alive):
        exact = exact.at[idx].set(rows.astype(jnp.float32))
        valid = valid.at[idx].set(alive)
        return exact, valid

    kw = {}
    if shardings is not None:
        row_sh, v_sh = shardings
        kw["out_shardings"] = (row_sh, v_sh)
    return jax.jit(f, donate_argnums=(0, 1) if donate else (), **kw)


@functools.lru_cache(maxsize=None)
def _valid_fn(donate: bool, sharding=None):
    def f(valid, idx, val):
        return valid.at[idx].set(val)

    kw = {}
    if sharding is not None:
        kw["out_shardings"] = sharding
    return jax.jit(f, donate_argnums=(0,) if donate else (), **kw)


@functools.lru_cache(maxsize=None)
def _pallas_rows_fn(donate: bool, d: int):
    """Pallas PreparedCorpus rows: data cols [0:d], penalty col d
    (0 = valid; ops/pallas/topk.INVALID_PENALTY = masked)."""
    from imatch_tpu.ops.pallas.topk import INVALID_PENALTY

    def f(scoring, exact, vmask, idx, rows, alive):
        rows32 = rows.astype(jnp.float32)
        block = jnp.zeros((idx.shape[0], scoring.shape[1]), scoring.dtype)
        block = block.at[:, :d].set(rows32.astype(scoring.dtype))
        block = block.at[:, d].set(
            jnp.where(alive, 0.0, INVALID_PENALTY).astype(scoring.dtype)
        )
        scoring = scoring.at[idx].set(block)
        exact = exact.at[idx].set(rows32)
        flat = vmask.reshape(-1).at[idx].set(alive)
        return scoring, exact, flat.reshape(vmask.shape)

    return jax.jit(f, donate_argnums=(0, 1, 2) if donate else ())


@functools.lru_cache(maxsize=None)
def _pallas_valid_fn(donate: bool, d: int):
    from imatch_tpu.ops.pallas.topk import INVALID_PENALTY

    def f(scoring, vmask, idx, val):
        pen = jnp.where(val, 0.0, INVALID_PENALTY).astype(scoring.dtype)
        scoring = scoring.at[idx, d].set(pen)
        flat = vmask.reshape(-1).at[idx].set(val)
        return scoring, flat.reshape(vmask.shape)

    return jax.jit(f, donate_argnums=(0, 1) if donate else ())


@functools.lru_cache(maxsize=None)
def _host_tier_fn(donate: bool):
    """Device half of the tilemax-host patch: pre-quantized int8 rows +
    scales scatter (quantization runs in numpy to match
    prepare_host_rescore_corpus bit-for-bit)."""

    def f(scoring, valid, scale, idx, q, sc, alive):
        scoring = scoring.at[idx].set(q)
        scale = scale.at[idx].set(sc)
        valid = valid.at[idx].set(alive)
        return scoring, valid, scale

    return jax.jit(f, donate_argnums=(0, 1, 2) if donate else ())


@functools.lru_cache(maxsize=None)
def _ivf_append_fn(donate: bool):
    def f(members, corpus, valid, midx, mval, slots, rows):
        flat = members.reshape(-1).at[midx].set(mval)
        members = flat.reshape(members.shape)
        corpus = corpus.at[slots].set(rows.astype(corpus.dtype))
        valid = valid.at[slots].set(True)
        return members, corpus, valid

    return jax.jit(f, donate_argnums=(0, 1, 2) if donate else ())


@functools.lru_cache(maxsize=None)
def _ivf_sharded_append_fn(donate: bool, shardings=None):
    def f(members, corpus, valid, nonempty, s, c, pos, local, mval, rows):
        members = members.at[s, c, pos].set(mval)
        corpus = corpus.at[s, local].set(rows.astype(corpus.dtype))
        valid = valid.at[s, local].set(True)
        nonempty = nonempty.at[s, c].set(True)
        return members, corpus, valid, nonempty

    kw = {}
    if shardings is not None:
        kw["out_shardings"] = shardings
    return jax.jit(f, donate_argnums=(0, 1, 2, 3) if donate else (), **kw)


@functools.lru_cache(maxsize=None)
def _sharded2d_valid_fn(donate: bool, sharding=None):
    def f(valid, s, local, val):
        return valid.at[s, local].set(val)

    kw = {}
    if sharding is not None:
        kw["out_shardings"] = sharding
    return jax.jit(f, donate_argnums=(0,) if donate else (), **kw)


# ---------------------------------------------------------------------------
# per-engine dispatch
# ---------------------------------------------------------------------------


def _dense_patch(tag, state, slots, rows, alive_val, donate):
    """Shared rows-path for tilemax + sharded (DeviceCorpus /
    ShardedCorpus have the same scoring/exact/valid fields)."""
    b = _bucket(slots.shape[0])
    idx = _pad_idx(slots)
    rows_p = _pad_rows(rows, b)
    alive = np.full((b,), alive_val, bool)
    shardings = None
    if tag == "sharded":
        shardings = (state.scoring.sharding, state.valid.sharding)
        if isinstance(rows_p, jax.Array) and (
            rows_p.sharding.device_set != state.scoring.sharding.device_set
        ):
            # a batch committed elsewhere (e.g. the output of a
            # single-device jit'd model) can't enter the mesh-sharded
            # patch jit — jax raises "incompatible devices" and every
            # add would silently degrade to a full rebuild. Replicate
            # the (tiny) b x D batch over the index's mesh first.
            rows_p = jax.device_put(
                rows_p,
                jax.sharding.NamedSharding(
                    state.scoring.sharding.mesh, jax.sharding.PartitionSpec()
                ),
            )
    if state.scoring.dtype == jnp.float32:
        exact, valid = _shared_rows_fn(donate, shardings)(
            state.exact, state.valid, idx, rows_p, alive
        )
        return state._replace(scoring=exact, exact=exact, valid=valid)
    int8 = state.scoring.dtype == jnp.int8
    scale = getattr(state, "scale", None)
    if int8 and scale is None:
        return None
    scoring, exact, valid, scale = _dense_rows_fn(donate, int8, shardings)(
        state.scoring, state.exact, state.valid, scale, idx, rows_p, alive
    )
    if hasattr(state, "scale"):
        return state._replace(
            scoring=scoring, exact=exact, valid=valid, scale=scale
        )
    return state._replace(scoring=scoring, exact=exact, valid=valid)


def _host_tier_append(state: HostRescoreCorpus, slots, rows, donate):
    """tilemax-host append: numpy quantization identical to
    prepare_host_rescore_corpus, device scatter, in-place host fp32
    append (unreachable from old snapshots), copy-on-write host valid."""
    amax = np.abs(rows).max(axis=1)
    sc = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(rows / sc[:, None]), -127, 127).astype(np.int8)
    b = _bucket(slots.shape[0])
    idx = _pad_idx(slots)
    scoring, valid, scale = _host_tier_fn(donate)(
        state.scoring,
        state.valid,
        state.scale,
        idx,
        _pad_rows(q, b),
        _pad_rows(sc, b),
        np.ones((b,), bool),
    )
    # host side: rows first, THEN the validity copy that reveals them
    state.host_exact[slots] = rows
    host_valid = state.host_valid.copy()
    host_valid[slots] = True
    return state._replace(
        scoring=scoring,
        valid=valid,
        scale=scale,
        host_valid=host_valid,
    )


def _insert_positions(pr: np.ndarray, base_counts: np.ndarray) -> np.ndarray:
    """Member-table slot for each new row: its cluster's current fill
    plus its rank among same-batch rows landing in the same cluster."""
    order = np.argsort(pr, kind="stable")
    sorted_c = pr[order]
    if sorted_c.size:
        starts = np.r_[0, np.nonzero(np.diff(sorted_c))[0] + 1]
        lens = np.diff(np.r_[starts, sorted_c.size])
        within = np.arange(sorted_c.size) - np.repeat(starts, lens)
    else:
        within = np.zeros((0,), np.int64)
    pos = np.empty_like(within)
    pos[order] = within
    return base_counts + pos


def _ivf_append(state, host, slots, rows, donate):
    """Single-device IVF append. Returns (new_state, host_updates) or
    None. host_updates = (unpruned cluster ids for ``assign``, new
    pruned-space counts array)."""
    if host is None or "counts" not in host or "pruned_map" not in host:
        return None
    from imatch_tpu.index.ivf import assign_rows

    cl = assign_rows(rows, host["cents"])  # unpruned ids
    pr = host["pruned_map"][cl]
    if np.any(pr < 0):
        return None  # lands in a cluster pruned from the device table
    counts = host["counts"]
    m = state.members.shape[1]
    pos = _insert_positions(pr, counts[pr])
    if np.any(pos >= m):
        return None  # member table full for some cluster — repack
    b = _bucket(slots.shape[0])
    midx = _pad_idx((pr.astype(np.int64) * m + pos).astype(np.int32))
    mval = _pad_idx(slots.astype(np.int32))
    members, corpus, valid = _ivf_append_fn(donate)(
        state.members,
        state.corpus,
        state.valid,
        midx,
        mval,
        _pad_idx(slots),
        _pad_rows(rows, b),
    )
    new_counts = counts.copy()
    np.add.at(new_counts, pr, 1)
    new_state = state._replace(members=members, corpus=corpus, valid=valid)
    return new_state, (cl, new_counts)


def _ivf_sharded_append(state, host, slots, rows, donate):
    """Sharded IVF append: per-shard assignment against existing
    centroids, one scatter over the stacked shard arrays. Returns
    (new_state, host_updates); host_updates = (shard-LOCAL cluster ids
    for ``assign``, {shard: new counts array})."""
    if host is None or "counts" not in host:
        return None
    from imatch_tpu.index.ivf import assign_rows

    shard_rows = host["rows"]
    s_arr = (slots // shard_rows).astype(np.int32)
    local = (slots % shard_rows).astype(np.int32)
    cl = np.empty((slots.shape[0],), np.int32)
    for s in np.unique(s_arr):
        sel = s_arr == s
        cl[sel] = assign_rows(rows[sel], host["cents"][s])
    m_max = state.members.shape[2]
    counts_upd: dict = {}
    pos = np.empty((slots.shape[0],), np.int64)
    for s in np.unique(s_arr):
        sel = np.nonzero(s_arr == s)[0]
        counts = host["counts"][s]
        p = _insert_positions(cl[sel], counts[cl[sel]])
        if np.any(p >= m_max):
            return None
        pos[sel] = p
        nc = counts.copy()
        np.add.at(nc, cl[sel], 1)
        counts_upd[int(s)] = nc
    b = _bucket(slots.shape[0])
    shardings = (
        state.members.sharding,
        state.corpus.sharding,
        state.valid.sharding,
        state.nonempty.sharding,
    )
    members, corpus, valid, nonempty = _ivf_sharded_append_fn(
        donate, shardings
    )(
        state.members,
        state.corpus,
        state.valid,
        state.nonempty,
        _pad_idx(s_arr),
        _pad_idx(cl),
        _pad_idx(pos.astype(np.int32)),
        _pad_idx(local),
        _pad_idx(local),  # member tables hold LOCAL row ids
        _pad_rows(rows, b),
    )
    new_state = state._replace(
        members=members, corpus=corpus, valid=valid, nonempty=nonempty
    )
    return new_state, (cl, counts_upd)


# ---------------------------------------------------------------------------
# public API (store calls these under its lock)
# ---------------------------------------------------------------------------


def append_rows(
    dc, slots: np.ndarray, rows: np.ndarray, *, donate: bool, ivf_host=None
) -> Optional[Tuple[tuple, Optional[tuple]]]:
    """Patch freshly-appended rows into a prepared state. Returns
    ((tag, new_state), ivf_host_updates) or None to request a rebuild.
    ``slots`` are the store slot indices (contiguous from the old row
    count); ``rows`` the fp32 (b, D) embeddings."""
    tag, state = dc
    rows = _rows_f32(rows, tag)
    if tag in ("tilemax", "sharded"):
        new = _dense_patch(tag, state, slots, rows, True, donate)
        return None if new is None else ((tag, new), None)
    if tag == "pallas":
        b = _bucket(slots.shape[0])
        scoring, exact, vmask = _pallas_rows_fn(donate, state.exact.shape[1])(
            state.scoring,
            state.exact,
            state.vmask,
            _pad_idx(slots),
            _pad_rows(rows, b),
            np.ones((b,), bool),
        )
        return (
            (tag, state._replace(scoring=scoring, exact=exact, vmask=vmask)),
            None,
        )
    if tag == "tilemax-host":
        return ((tag, _host_tier_append(state, slots, rows, donate)), None)
    if tag == "ivf":
        res = _ivf_append(state, ivf_host, slots, rows, donate)
        return None if res is None else ((tag, res[0]), res[1])
    if tag == "ivf-sharded":
        res = _ivf_sharded_append(state, ivf_host, slots, rows, donate)
        return None if res is None else ((tag, res[0]), res[1])
    return None


def delete_rows(dc, slots: np.ndarray, *, donate: bool):
    """Flip validity-mask entries for tombstoned slots. Returns
    (tag, new_state) or None."""
    tag, state = dc
    idx = _pad_idx(slots)
    val = np.zeros((idx.shape[0],), bool)
    if tag in ("tilemax", "sharded", "ivf"):
        sh = state.valid.sharding if tag == "sharded" else None
        valid = _valid_fn(donate, sh)(state.valid, idx, val)
        return tag, state._replace(valid=valid)
    if tag == "pallas":
        scoring, vmask = _pallas_valid_fn(donate, state.exact.shape[1])(
            state.scoring, state.vmask, idx, val
        )
        return tag, state._replace(scoring=scoring, vmask=vmask)
    if tag == "tilemax-host":
        valid = _valid_fn(donate)(state.valid, idx, val)
        host_valid = state.host_valid.copy()
        host_valid[slots] = False
        return tag, state._replace(valid=valid, host_valid=host_valid)
    if tag == "ivf-sharded":
        shard_rows = state.corpus.shape[1]
        s_arr = _pad_idx((slots // shard_rows).astype(np.int32))
        local = _pad_idx((slots % shard_rows).astype(np.int32))
        valid = _sharded2d_valid_fn(donate, state.valid.sharding)(
            state.valid, s_arr, local, val
        )
        return tag, state._replace(valid=valid)
    return None


def update_rows(dc, slots: np.ndarray, rows: np.ndarray, *, donate: bool):
    """Scatter replaced embeddings into a prepared state (exact engines
    only — IVF member lists would go stale and the host tier could tear
    under concurrent lock-free rescores). Returns (tag, new_state) or
    None."""
    tag, state = dc
    rows = _rows_f32(rows, tag)
    if tag in ("tilemax", "sharded"):
        new = _dense_patch(tag, state, slots, rows, True, donate)
        return None if new is None else (tag, new)
    if tag == "pallas":
        b = _bucket(slots.shape[0])
        scoring, exact, vmask = _pallas_rows_fn(donate, state.exact.shape[1])(
            state.scoring,
            state.exact,
            state.vmask,
            _pad_idx(slots),
            _pad_rows(rows, b),
            np.ones((b,), bool),
        )
        return tag, state._replace(scoring=scoring, exact=exact, vmask=vmask)
    return None
