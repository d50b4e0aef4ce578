"""Edge-partitioned DynamicEdgeConv — node-sharded dynamic-graph message
passing (SURVEY.md §5: distributed dynamic-kNN at scale; reference
capability model/dynamic_reduction_network.py:86,94 re-built for a mesh).

Dynamic graphs change per layer/step, so unlike the radius-window path
(parallel/halo.py) there is no static halo: every round needs

  1. a distributed top-k graph build — ``knn_graph_sharded``
     (parallel/knn.py): each node shard all-gathers the feature block,
     computes its query rows' distances, local exact top-k; neighbor
     indices are GLOBAL node positions;
  2. a sharded neighbor-feature fetch — ``gather_neighbors_sharded``
     below: one ``all_gather`` of the (small) feature block per round,
     then a local dense gather of the shard's [n_loc, K] global indices.

Everything between those two collectives (edge MLP, edge BatchNorm,
aggregation, normalized-cut coarsening, global pooling) is ordinary
masked dense math that GSPMD partitions along the sharded node axis.

``drn_apply_sharded`` runs the FULL DynamicReductionNetwork forward this
way by injecting both primitives into models/drn.drn_apply — numerically
identical to the single-device forward (tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepmetv2_tpu.config import Config, DRNConfig
from deepmetv2_tpu.data.batching import EventBatch, Neighborhood
from deepmetv2_tpu.parallel.knn import (knn_graph_sharded,
                                        knn_graph_sharded_ring)
from deepmetv2_tpu.parallel.mesh import DATA_AXIS, NODE_AXIS


def gather_neighbors_sharded(
    x: jnp.ndarray,        # [B, N, D], N sharded over NODE_AXIS
    nbr: Neighborhood,     # idx [B, N, K] GLOBAL ids, sharded like x
    *,
    mesh: Mesh,
) -> jnp.ndarray:          # [B, N, K, D] sharded like x
    """Neighbor-feature fetch for globally-indexed sharded neighbor lists:
    all-gather the feature block over the node axis (one collective), then
    each shard gathers its own query rows locally."""

    def body(xs, idx):
        xg = jax.lax.all_gather(xs, NODE_AXIS, axis=1, tiled=True)  # [B,N,D]
        B, Q, K = idx.shape
        flat = jnp.take_along_axis(
            xg, idx.reshape(B, Q * K)[..., None], axis=1)
        return flat.reshape(B, Q, K, xg.shape[-1])

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(DATA_AXIS, NODE_AXIS, None),
                  P(DATA_AXIS, NODE_AXIS, None)),
        out_specs=P(DATA_AXIS, NODE_AXIS, None, None),
        check_vma=False,
    )(x, nbr.idx)


def _knn_fn(cfg: DRNConfig, mesh: Mesh, ring: bool):
    """``ring=True`` swaps in the ring-pipelined top-k (O(n_loc) per-chip
    memory, for events larger than one chip); both are exact."""
    build = knn_graph_sharded_ring if ring else knn_graph_sharded
    return lambda h, m: build(h, m, k=cfg.k, mesh=mesh)


def drn_apply_sharded(params, state, x, mask, train: bool, cfg: DRNConfig,
                      mesh: Mesh, ring: bool = False):
    """Node-sharded DynamicReductionNetwork forward (see module docstring).
    Call under ``jit`` with the node axis of ``x``/``mask`` sharded over
    ``mesh[NODE_AXIS]`` (parallel.mesh.batch_sharding(shard_nodes=True))."""
    from deepmetv2_tpu.models.drn import drn_apply

    return drn_apply(
        params, state, x, mask, train, cfg,
        knn_fn=_knn_fn(cfg, mesh, ring),
        gather_fn=functools.partial(gather_neighbors_sharded, mesh=mesh),
    )


def drn_net_apply_sharded(params, state, batch: EventBatch, train: bool,
                          cfg: DRNConfig, mesh: Mesh, ring: bool = False):
    """Node-sharded DRN forward with the output head applied."""
    from deepmetv2_tpu.models.drn import drn_net_apply

    return drn_net_apply(
        params, state, batch, train, cfg,
        knn_fn=_knn_fn(cfg, mesh, ring),
        gather_fn=functools.partial(gather_neighbors_sharded, mesh=mesh),
    )


def drn_ep_train_step_core(cfg: Config, opt, mesh: Mesh):
    """Unjitted edge-partitioned DRN step body — jitted standalone by
    :func:`make_drn_ep_train_step`, or scanned over a stacked chain of
    batches by train/chain.py (the sharded apply is an ordinary traced
    function, so it scans like the other cores)."""
    import optax

    from deepmetv2_tpu.train.loss import drn_loss_fn
    from deepmetv2_tpu.train.step import TrainState

    def step(state: TrainState, batch: EventBatch):
        def objective(params):
            pred, new_bn = drn_net_apply_sharded(
                params, state.bn_state, batch, True, cfg.drn, mesh,
                ring=cfg.drn.ring_knn)
            return drn_loss_fn(pred, batch, cfg.drn.head), new_bn

        (loss, new_bn), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bn, new_opt, state.step + 1), loss

    return step


def make_drn_ep_train_step(cfg: Config, mesh: Mesh):
    """Edge-partitioned DRN train step: events shard over ``data``, the
    padded node axis over ``node``; the per-round graph build and neighbor
    fetch run as the two collectives above, gradients reduce via GSPMD."""
    from deepmetv2_tpu.parallel.mesh import batch_sharding, replicate
    from deepmetv2_tpu.train.step import make_optimizer

    step = drn_ep_train_step_core(cfg, make_optimizer(cfg), mesh)
    rep = replicate(mesh)
    bsh = batch_sharding(mesh, shard_nodes=True)
    return jax.jit(step, in_shardings=(rep, bsh), out_shardings=(rep, rep),
                   donate_argnums=(0,))
