"""Edge-partitioning context — routes the model's EdgeConv calls through
the halo-exchange sharded path without changing model code.

``with edge_partitioning(mesh): ...`` during tracing makes
``ops.edgeconv()`` dispatch WindowGraph aggregations to
parallel/halo.window_edgeconv_linear_sharded.  The context is entered
inside each compiled step function (so it is active exactly when that
step's trace runs); separate step closures never share jit caches, so the
thread-local cannot leak across configurations.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

from jax.sharding import Mesh

_TLS = threading.local()


class EdgePartitioning:
    def __init__(self, mesh: Mesh, node_axis: str = "node",
                 data_axis: Optional[str] = "data", interpret: bool = False):
        self.mesh = mesh
        self.node_axis = node_axis
        self.data_axis = data_axis
        self.interpret = interpret


def current() -> Optional[EdgePartitioning]:
    return getattr(_TLS, "ctx", None)


@contextlib.contextmanager
def edge_partitioning(mesh: Mesh, node_axis: str = "node",
                      data_axis: Optional[str] = "data",
                      interpret: bool = False):
    prev = current()
    _TLS.ctx = EdgePartitioning(mesh, node_axis, data_axis, interpret)
    try:
        yield _TLS.ctx
    finally:
        _TLS.ctx = prev


def xla_window_forced() -> bool:
    return getattr(_TLS, "xla_window", False)


@contextlib.contextmanager
def force_xla_window():
    """While tracing a GSPMD-sharded program (jit with in_shardings, e.g.
    the data-parallel train/eval steps), Pallas-backed formulations must
    be swapped for their XLA equivalents: ``pallas_call`` has no SPMD
    partitioning rule, so a sharded-operand trace would fail to partition
    (or silently replicate) the kernel.  Gates both the WindowGraph
    aggregation (ops/edgeconv.py) and the DRN's fused dynamic-graph build
    (ops/dyn_graph._fused_available); the dense XLA forms partition along
    the batch axis for free.  (Recovering the Pallas kernels under dp
    means wrapping them in a shard_map over the data axis — future
    work.)"""
    prev = xla_window_forced()
    _TLS.xla_window = True
    try:
        yield
    finally:
        _TLS.xla_window = prev
