"""Test harness config.

All tests run on a virtual 8-device CPU mesh (SURVEY.md §4 "Distributed
without a cluster"): env vars must be set before jax is imported anywhere.
Pallas kernels run with interpret=True on CPU (each kernel module exposes an
``interpret`` escape hatch). The single-chip TPU smoke path is exercised by
bench.py / __graft_entry__.py outside pytest.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

# The axon TPU plugin initializes (and dials its device tunnel) during jax
# start-up even under JAX_PLATFORMS=cpu; when the tunnel is slow or wedged
# that silently adds minutes to EVERY jax process — including the CPU
# subprocesses the bench-contract and multihost tests spawn (measured:
# `jax.devices()` 2.7 s without the plugin vs >100 s with it during a
# tunnel stall). CPU tests must never touch the plugin: record the
# original PYTHONPATH for the chip-gated tests (test_bench_contract
# _tpu_env restores it), then scrub the plugin from this process and from
# inherited child environments.
os.environ.setdefault("W2T_TPU_PYTHONPATH", os.environ.get("PYTHONPATH", ""))
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p
)
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin's sitecustomize can trump JAX_PLATFORMS from the env;
# the in-process config update always wins
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is compile-dominated (cold run
# ~17 min, mostly XLA:CPU builds of the same detector/tracker jits), so
# repeat runs reuse compiled executables from disk. Keyed by backend +
# jaxlib version, safe across the virtual 8-device mesh. The dir is
# gitignored; delete it to force a cold run.
_cache_dir = os.environ.get(
    "W2T_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
