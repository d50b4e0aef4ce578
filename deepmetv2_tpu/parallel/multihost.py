"""Multi-host launch + cross-process data feed.

The reference has no distributed backend at all (SURVEY.md §2c; reference
train.py:72 picks a single CUDA device).  Here multi-host runs are the
standard JAX recipe: every process calls :func:`initialize`, builds the
same global ``Mesh`` over ``jax.devices()`` (all processes' devices), and
feeds its *local* shard of each batch through
:func:`local_batch_to_global`; GSPMD inserts the cross-host collectives.

Real TPU pods: ``initialize()`` with no arguments — JAX auto-detects the
coordinator from the TPU metadata.  Fake clusters for tests/CI:
``initialize(coordinator="localhost:<port>", num_processes=K,
process_id=p, cpu_devices_per_process=d)`` gives every process ``d``
virtual CPU devices and gloo collectives between them
(tests/test_multihost.py drives a 2-process cluster this way).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from deepmetv2_tpu.data.batching import EventBatch
from deepmetv2_tpu.parallel.mesh import batch_sharding


def force_cpu_devices(n: int) -> None:
    """Force the CPU backend with ``n`` virtual devices.  Must run before
    the first JAX computation.  Raises if XLA_FLAGS already pins a
    DIFFERENT virtual-device count (silently running on the wrong mesh
    size is worse than failing)."""
    flags = os.environ.get("XLA_FLAGS", "")
    marker = "xla_force_host_platform_device_count"
    if marker in flags:
        import re

        m = re.search(marker + r"=(\d+)", flags)
        if m and int(m.group(1)) != n:
            raise RuntimeError(
                f"XLA_FLAGS already sets {marker}={m.group(1)}, "
                f"requested {n}")
    else:
        os.environ["XLA_FLAGS"] = (flags + f" --{marker}={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_devices_per_process: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` wrapper.

    Must run before any other JAX call in the process.  With
    ``cpu_devices_per_process`` set, forces the CPU backend with that many
    virtual devices and gloo collectives — the multi-process fake-cluster
    mode (SURVEY.md §4's distributed test strategy).
    """
    if cpu_devices_per_process is not None:
        force_cpu_devices(cpu_devices_per_process)

    import jax

    if cpu_devices_per_process is not None:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    kwargs = {}
    if coordinator is not None:
        kwargs.update(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs/artifacts."""
    import jax

    return jax.process_index() == 0


def local_batch_to_global(local_batch: EventBatch, mesh,
                          shard_nodes: bool = False) -> EventBatch:
    """Assemble each process's local EventBatch rows into global arrays.

    Every process passes its own ``B_local`` events; the result is a
    global ``B_local * process_count`` batch sharded over the ``data``
    mesh axis (process p owns rows [p·B_local, (p+1)·B_local) — matching
    the mesh's device enumeration order).
    """
    import jax

    shardings = batch_sharding(mesh, shard_nodes)

    def conv(x, sh):
        lx = np.asarray(x)
        global_shape = (lx.shape[0] * jax.process_count(),) + lx.shape[1:]
        return jax.make_array_from_process_local_data(sh, lx, global_shape)

    return jax.tree_util.tree_map(conv, local_batch, shardings)
