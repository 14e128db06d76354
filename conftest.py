# Root conftest: force tests onto CPU with a virtual 8-device mesh.
# Multi-chip sharding tests (shard_map/pjit) run against this fake mesh,
# the standard JAX pattern for testing distributed code without a cluster.
#
# NOTE: this environment's jax build ignores the JAX_PLATFORMS env var (an
# 'axon' TPU plugin self-registers), so the platform must be selected via
# jax.config. XLA_FLAGS is still read from the environment at backend init.
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# This host has one core; 8 virtual devices' collective threads can
# starve past XLA:CPU's default 40s rendezvous termination (intermittent
# "Termination timeout ... Exiting to ensure a consistent program state"
# fatals under full-suite load). Give them room.
if "collective_call_terminate_timeout" not in _flags:
    _flags += " --xla_cpu_collective_call_terminate_timeout_seconds=600"
os.environ["XLA_FLAGS"] = _flags

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("IMATCH_WARMUP", "0")  # no background compiles in tests

import jax

jax.config.update("jax_platforms", "cpu")
