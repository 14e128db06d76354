"""Flat-file checkpointing for training state (checkpoint/resume).

The reference has no training and its only persistence is the vector
store (SURVEY.md §5); training here needs its own checkpoint/resume.
Format: one .npz per step holding every leaf of the TrainState pytree
keyed by its tree path, plus the step number — restore rebuilds the
exact pytree (params + optimizer state) and re-applies the mesh
shardings. Writes are atomic (tmp + rename); ``latest_step`` enables
crash-resume.
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Any, Optional

import jax
import numpy as np

from imatch_tpu.parallel.train import TrainState


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step)
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {
        _path_key(path): np.asarray(leaf) for path, leaf in leaves_with_paths
    }
    path = os.path.join(ckpt_dir, f"step_{step:08d}.npz")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for f in os.listdir(ckpt_dir)
        if (m := re.match(r"step_(\d+)\.npz$", f))
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    ckpt_dir: str,
    template: TrainState,
    step: Optional[int] = None,
    mesh=None,
    param_specs: Any = None,
) -> TrainState:
    """Rebuild a TrainState with the template's structure from disk.

    ``template`` supplies the pytree structure (from init_train_state);
    leaf values are replaced from the checkpoint. With ``mesh`` +
    ``param_specs`` the restored params are re-placed with their
    NamedShardings (opt_state follows params automatically on first use).
    """
    step = latest_step(ckpt_dir) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"step_{step:08d}.npz")
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, leaf in leaves_with_paths:
        key = _path_key(p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        want = np.shape(leaf)
        if arr.shape != want:
            # reshape only normalizes 0-d/() scalar storage; a different
            # structured shape means the checkpoint was saved under a
            # different config — silently reshaping a (512, 2048) into a
            # (2048, 512) template would load transposed garbage
            if arr.size == 1 and int(np.prod(want, dtype=np.int64)) == 1:
                arr = arr.reshape(want)
            else:
                raise ValueError(
                    f"checkpoint leaf {key} has shape {arr.shape}, "
                    f"template expects {want} — wrong config?"
                )
        new_leaves.append(arr)
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if mesh is not None and param_specs is not None:
        from jax.sharding import NamedSharding

        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            state.params,
            param_specs,
        )
        state = TrainState(state.step, params, state.opt_state)
    return state
