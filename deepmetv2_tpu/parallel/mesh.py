"""Device mesh + sharding layer.

The reference is strictly single-GPU (train.py:72; no torch.distributed
anywhere).  Scaling here is a new capability, built the XLA way: a
``Mesh`` with a ``data`` axis (events) and a ``node`` axis (graph/node
partition within an event), PartitionSpecs on the EventBatch pytree, and
XLA-inserted collectives.  No wire protocol is written — the framework's
"communication layer" is this partitioning layer (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepmetv2_tpu.data.batching import EventBatch

DATA_AXIS = "data"
NODE_AXIS = "node"


def make_mesh(
    n_data: Optional[int] = None,
    n_node: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with (data, node) axes.  ``n_data=None`` uses all remaining
    devices on the data axis."""
    devices = list(devices) if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_node
    assert n_data * n_node <= len(devices), (
        f"mesh {n_data}x{n_node} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_node]).reshape(n_data, n_node)
    return Mesh(grid, (DATA_AXIS, NODE_AXIS))


def batch_sharding(mesh: Mesh, shard_nodes: bool = False) -> EventBatch:
    """PartitionSpecs for an EventBatch: events over ``data``; optionally
    the padded node axis over ``node`` (edge-partitioned mode)."""
    n = NODE_AXIS if shard_nodes else None
    return EventBatch(
        x_cont=NamedSharding(mesh, P(DATA_AXIS, n, None)),
        x_cat=NamedSharding(mesh, P(DATA_AXIS, n, None)),
        mask=NamedSharding(mesh, P(DATA_AXIS, n)),
        y=NamedSharding(mesh, P(DATA_AXIS, None)),
        num_valid=NamedSharding(mesh, P(DATA_AXIS)),
    )


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch: EventBatch, mesh: Mesh,
                shard_nodes: bool = False) -> EventBatch:
    """Place an EventBatch onto the mesh (host → sharded device buffers)."""
    shardings = batch_sharding(mesh, shard_nodes)
    return jax.tree_util.tree_map(jax.device_put, batch, shardings)
