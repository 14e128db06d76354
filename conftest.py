# Root conftest: configure JAX for CPU testing with a virtual 8-device mesh
# BEFORE jax is imported anywhere. Multi-chip sharding tests (shard_map/pjit)
# run against this fake mesh, per the standard JAX pattern for testing
# distributed code without a cluster.
import os
import sys

# Force CPU even if the env preselects the TPU platform: unit tests need
# deterministic fp32 numerics and fast compiles; bench.py uses the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
