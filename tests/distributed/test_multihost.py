"""Real two-process multi-host smoke test (C28 DCN rung).

Spawns TWO separate python processes, each with 4 virtual CPU devices,
connected through jax.distributed's TCP coordinator — the same mechanism a
multi-host TPU pod uses over DCN. Each process builds the GLOBAL 8-device
mesh via parallel.multihost, runs a psum over 'data', and checks the result
covers all 8 global shards (proving cross-process collectives, not just
local ones).
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

_CHILD = textwrap.dedent(
    """
    import os, sys
    import numpy as np

    # 4 local CPU devices per process; must be set before jax import
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    from waymo_2d_tracking_tpu.parallel import multihost as mh
    from waymo_2d_tracking_tpu.parallel.sharding import DATA_AXIS, batch_sharding

    assert mh.initialize_multihost(), "env not picked up"
    pid = jax.process_index()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()          # global view
    assert len(jax.local_devices()) == 4

    mesh = mh.make_global_mesh()
    assert mesh.devices.size == 8

    # global psum: each process contributes its process_index+1 on its local
    # shards; total over 8 shards must be 4*1 + 4*2 = 12 in BOTH processes
    from jax.sharding import NamedSharding, PartitionSpec as P

    local = np.full((4, 1), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), local, (8, 1)
    )

    @jax.jit
    def total(x):
        return jnp.sum(x)

    got = float(total(arr))
    assert got == 12.0, got
    print(f"proc{pid}: global psum ok ({got})", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_global_mesh_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        # keep the axon TPU plugin's sitecustomize out of the children: it
        # initializes a backend before our jax.distributed.initialize runs,
        # freezing process_count at 1
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["W2T_COORDINATOR"] = f"127.0.0.1:{port}"
        env["W2T_NUM_PROCESSES"] = "2"
        env["W2T_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = REPO
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-3000:]}"
    combined = "".join(o for o, _ in outs)
    assert "proc0: global psum ok (12.0)" in combined
    assert "proc1: global psum ok (12.0)" in combined
