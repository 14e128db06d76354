"""TPU compute ops: Pallas kernels with XLA fallbacks.

Each op exposes an ``impl`` switch: ``"xla"`` (pure jnp, runs everywhere),
``"pallas"`` (Mosaic TPU kernel; interpreted on CPU for tests), or
``"auto"`` (pallas on TPU, xla elsewhere).
"""

import jax


def default_impl(impl: str = "auto") -> str:
    """Resolve an impl choice to a concrete backend."""
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"
