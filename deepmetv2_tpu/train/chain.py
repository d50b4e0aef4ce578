"""Multi-step chained device programs — amortizing per-step dispatch.

The reference dispatches one device program per batch (reference
train.py:39-54), so its epoch rate is bounded by host dispatch latency —
measured here as a 5,371 vs 229 events/s gap between the compiled step
and the fed epoch (BENCH_r03, ~35 ms tunnel dispatch per 1.5 ms step;
even on local hardware, per-step dispatch dominates sub-2 ms steps).

Here K consecutive same-shape batches are stacked host-side into one
pytree with a leading chain axis, and the K optimizer steps run as ONE
compiled program: ``lax.scan`` over the stacked batches with the
TrainState as (donated) carry.  One dispatch + one scalar fetch per K
steps; the loss trajectory is bit-identical to K sequential dispatches
(tests/test_chain.py) because the scan body is exactly the per-step
program.

Pieces:

* :func:`stack_batches` / :func:`chain_batches` — host-side grouping of
  consecutive same-shape batches (chains never span a bucket-shape
  change; each distinct (shape, chain-length) pair compiles once);
* :func:`make_chained` — wraps an unjitted step core
  (train/step.train_step_core, drn_train_step_core, or the dp cores)
  into a callable that jits one scan program per chain length, with
  optional mesh shardings (the stacked batch gets a leading
  no-partition axis prepended to each leaf's PartitionSpec).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np

from deepmetv2_tpu.data.batching import EventBatch


def stack_batches(batches: Sequence[EventBatch]) -> EventBatch:
    """Stack same-shape EventBatches along a new leading chain axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


def chain_length(stacked: EventBatch) -> int:
    return jax.tree_util.tree_leaves(stacked)[0].shape[0]


def chain_batches(it, k: int) -> Iterator[EventBatch]:
    """Group consecutive same-shape batches from ``it`` into stacked
    chains of length <= ``k``.  Order is preserved exactly (chains are
    consecutive runs), so the optimizer-step sequence is unchanged; a
    shape change (bucket boundary) or the end of the epoch flushes a
    shorter chain."""
    if k <= 1:
        yield from it
        return
    pend: list = []
    key = None

    def shapes(b):
        return tuple(np.asarray(leaf).shape
                     for leaf in jax.tree_util.tree_leaves(b))

    for b in it:
        kb = shapes(b)
        if pend and kb != key:
            yield stack_batches(pend)
            pend = []
        pend.append(b)
        key = kb
        if len(pend) == k:
            yield stack_batches(pend)
            pend = []
    if pend:
        yield stack_batches(pend)


def prepend_chain_axis(shardings):
    """Batch shardings for a stacked chain: each leaf's PartitionSpec gets
    a leading unpartitioned (chain) axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def one(ns: NamedSharding):
        return NamedSharding(ns.mesh, P(None, *ns.spec))

    return jax.tree_util.tree_map(one, shardings)


def make_chained(
    core: Callable,
    *,
    state_sharding=None,
    batch_shardings=None,
    loss_sharding=None,
) -> Callable:
    """``(state, stacked_batches) -> (state, losses[K])`` running K steps
    of ``core`` as one scanned program.  Jits lazily, one program per
    chain length (a full epoch uses at most two lengths per bucket shape:
    K and one remainder).  ``state_sharding``/``batch_shardings`` add
    mesh shardings for the data-parallel path (state replicated, batches
    sharded per parallel.mesh.batch_sharding with the chain axis
    unpartitioned)."""
    cache: Dict[int, Callable] = {}

    def chained(state, stacked):
        return jax.lax.scan(core, state, stacked)

    def run(state, stacked):
        k = chain_length(stacked)
        if k not in cache:
            kwargs = {}
            if state_sharding is not None:
                kwargs["in_shardings"] = (
                    state_sharding, prepend_chain_axis(batch_shardings))
                kwargs["out_shardings"] = (
                    state_sharding, loss_sharding or state_sharding)
            cache[k] = jax.jit(chained, donate_argnums=(0,), **kwargs)
        return cache[k](state, stacked)

    return run


def make_chained_train_step(cfg, model: str = "graphmet", mesh=None,
                            graph_force=None, shard_nodes: bool = False,
                            interpret: bool = False):
    """Chained counterpart of train/step.make_train_step /
    make_drn_train_step and the mesh steps in parallel/{dp,ep}.py.
    ``mesh`` selects the mesh cores (events sharded over the data axis
    inside each scanned step); ``shard_nodes=True`` additionally shards
    the node axis and runs the edge-partitioned cores — the
    flagship window core with halo exchange (parallel/ep.py) or the
    node-sharded DRN core with its distributed graph build
    (parallel/dyn.py)."""
    from deepmetv2_tpu.train.step import (drn_train_step_core,
                                          make_optimizer, train_step_core)

    opt = make_optimizer(cfg)
    if mesh is None:
        core = (drn_train_step_core(cfg, opt, graph_force)
                if model == "drn" else train_step_core(cfg, opt))
        return make_chained(core)
    from deepmetv2_tpu.parallel.mesh import batch_sharding, replicate

    if shard_nodes:
        if model == "drn":
            from deepmetv2_tpu.parallel.dyn import drn_ep_train_step_core

            core = drn_ep_train_step_core(cfg, opt, mesh)
        else:
            from deepmetv2_tpu.parallel.ep import ep_train_step_core

            core = ep_train_step_core(cfg, opt, mesh, interpret)
    else:
        from deepmetv2_tpu.parallel.dp import (dp_drn_train_step_core,
                                               dp_train_step_core)

        core = (dp_drn_train_step_core(cfg, opt) if model == "drn"
                else dp_train_step_core(cfg, opt))
    return make_chained(
        core,
        state_sharding=replicate(mesh),
        batch_shardings=batch_sharding(mesh, shard_nodes=shard_nodes),
        loss_sharding=replicate(mesh),
    )
