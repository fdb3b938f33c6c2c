"""Multi-host (multi-process) initialization — the DCN rung of C28.

SURVEY.md §2.3: "DCN: out of scope for the v5e-8 target but
``jax.distributed.initialize()`` is the hook." This module IS that hook,
made concrete: call :func:`initialize_multihost` once per process before
any jax computation, then build the global mesh with
:func:`make_global_mesh` — the 'data' axis spans processes in process-major
order, so the per-step gradient psum decomposes into an ICI all-reduce
within each host's slice plus one DCN hop between hosts (the slow link
carries one fragment per step, the scaling-book layout for pure DP).

Training with `cli train --sharded` picks this up automatically when the
coordinator env vars are present; single-process behavior is unchanged
otherwise. Verified by a real two-process CPU smoke test
(tests/distributed/test_multihost.py) — each process owns half the global
devices and a global-mesh psum sees all of them.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from waymo_2d_tracking_tpu.parallel.sharding import DATA_AXIS  # noqa: F401 (re-export)

_ENV_COORD = "W2T_COORDINATOR"       # host:port of process 0
_ENV_NPROC = "W2T_NUM_PROCESSES"
_ENV_PID = "W2T_PROCESS_ID"


def multihost_env_present() -> bool:
    return _ENV_COORD in os.environ


def initialize_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or W2T_* env vars.

    Returns True if multi-process mode was initialized. Must run before the
    first jax computation in the process. No-op (False) when neither args
    nor env are present — single-process runs stay untouched.
    """
    coordinator = coordinator or os.environ.get(_ENV_COORD)
    if coordinator is None:
        return False
    num_processes = int(num_processes or os.environ[_ENV_NPROC])
    process_id = int(
        process_id if process_id is not None else os.environ[_ENV_PID]
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global_mesh(model_parallel: int = 1):
    """Mesh over ALL processes' devices (jax.devices() is global after
    initialize). Data axis is process-major: contiguous per-process blocks,
    so intra-host reduction rides ICI and only the inter-host step crosses
    DCN."""
    from waymo_2d_tracking_tpu.parallel.sharding import make_mesh

    return make_mesh(model_parallel=model_parallel, devices=jax.devices())
