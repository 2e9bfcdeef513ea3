"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding tests run against virtual devices
(``--xla_force_host_platform_device_count``), the analog of multi-node testing
without a cluster (SURVEY.md §4).  Benchmarks (bench.py) run on real TPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
