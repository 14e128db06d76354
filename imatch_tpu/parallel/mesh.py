"""Device mesh construction.

Axes:
- ``data``  — batch / corpus sharding (DP + index sharding). Collectives
  on this axis are all-gathers of embeddings / top-k candidates.
- ``model`` — tensor parallelism inside the towers (attention heads and
  MLP hidden dim). Collectives are the usual TP reduce-scatters that XLA
  SPMD derives from the param specs in sharding.py.

On real hardware ``jax.devices()`` enumerates a slice in ICI-contiguous
order, so a (data, model) reshape keeps the model axis on the fastest
links; in tests the same code runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_MODEL = "model"


def mesh_shape_for(
    n_devices: int, model_parallel: int = 1
) -> Tuple[int, int]:
    """Split ``n_devices`` into (data, model) with ``model`` innermost."""
    if n_devices % model_parallel:
        raise ValueError(
            f"{n_devices} devices not divisible by model_parallel="
            f"{model_parallel}"
        )
    return (n_devices // model_parallel, model_parallel)


def make_mesh(
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (AXIS_DATA, AXIS_MODEL),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    dp, mp = mesh_shape_for(len(devices), model_parallel)
    grid = np.asarray(devices, dtype=object).reshape(dp, mp)
    return Mesh(grid, axis_names)
