"""Test harness config.

All tests run on a virtual 8-device CPU mesh (SURVEY.md §4 "Distributed
without a cluster"): env vars must be set before jax is imported anywhere.
Pallas kernels run with interpret=True on CPU (each kernel module exposes an
``interpret`` escape hatch). The single-chip TPU smoke path is exercised by
bench.py / __graft_entry__.py outside pytest.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
