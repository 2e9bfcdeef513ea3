"""Test configuration: force an 8-device virtual CPU mesh before any test
imports jax.

Multi-chip sharding tests run against virtual CPU devices — the analog of
multi-node testing without a cluster (SURVEY.md §4).  Benchmarks (bench.py)
run on the real TPU.

NOTE: jax 0.9's CPU plugin ignores ``--xla_force_host_platform_device_count``
(and the axon sitecustomize partially imports jax at interpreter start), so
the reliable route is ``jax.config.update('jax_num_cpu_devices', ...)``
before first backend use.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# AOT program serialization (solver/aot.py) is OFF under pytest: exporting
# every stage program and compiling the round-tripped StableHLO roughly
# DOUBLES cold-cache compile work across the suite (measured: the fast tier
# went 11 min -> >27 min).  The dedicated round-trip test (tests/test_aot.py)
# opts back in; bench.py on the TPU keeps it on, where it pays off (the
# round-3 capture burned 824 s of per-process tracing for a 53.5 s solve).
os.environ.setdefault("UUO_AOT", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: the solver programs take minutes to build; reuse
# them across test sessions.  Lives INSIDE the repo (gitignored): $HOME was
# observed wiped between sessions on this host (2026-08-18), and a cold cache
# is what pushed the fast test tier past its 10-minute budget.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "xla_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
# threshold 1.0 s: the ~0.5 s/compile RPC cost that justifies caching EVERY
# compile is a property of the tunneled TPU backend (bench.py/tools set 0.0
# there); CPU-local tiny compiles are ~ms, so caching them would only bloat
# the dir (3.4 GB already) and add per-program load IO to every test run.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
