"""Data-parallel training step over a device mesh.

Events (the batch axis) are sharded over the ``data`` mesh axis; parameters
and optimizer state are replicated.  Gradients are reduced by XLA-inserted
collectives (the mean over the batch inside loss_fn spans the sharded axis,
so the psum over ICI is generated automatically by GSPMD — nothing manual).

BatchNorm statistics: batchnorm_apply reduces over (batch, node) axes; with
the batch axis sharded, GSPMD turns those sums into cross-replica psums, so
batch statistics are computed over the *global* batch — matching the
reference's single-device semantics exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh

from deepmetv2_tpu.config import Config
from deepmetv2_tpu.data.batching import EventBatch
from deepmetv2_tpu.parallel.mesh import batch_sharding, replicate
from deepmetv2_tpu.train.step import TrainState, make_optimizer
from deepmetv2_tpu.models.graph_met import net_apply
from deepmetv2_tpu.train.loss import loss_fn
from deepmetv2_tpu.train.step import build_graph


def make_dp_train_step(cfg: Config, mesh: Mesh, shard_nodes: bool = False):
    """jit-compiled data-parallel train step with explicit shardings."""
    opt = make_optimizer(cfg)
    rep = replicate(mesh)
    bsh = batch_sharding(mesh, shard_nodes=shard_nodes)

    def step(state: TrainState, batch: EventBatch) -> Tuple[TrainState, jax.Array]:
        batch, nbr = build_graph(batch, cfg)

        def objective(params):
            w, new_bn = net_apply(params, state.bn_state, batch, nbr,
                                  train=True, cfg=cfg.model)
            return loss_fn(w, batch), new_bn

        (loss, new_bn), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bn, new_opt, state.step + 1), loss

    return jax.jit(
        step,
        in_shardings=(rep, bsh),       # state replicated, batch sharded
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_drn_dp_train_step(cfg: Config, mesh: Mesh):
    """Data-parallel train step for the DRN family: events shard over the
    ``data`` axis; the per-round feature-space kNN, coarsening, and
    pooling are all per-event, so they shard trivially, while the edge
    BatchNorm statistics span the global batch via GSPMD psums."""
    from deepmetv2_tpu.models.drn import drn_net_apply
    from deepmetv2_tpu.train.loss import drn_loss_fn

    opt = make_optimizer(cfg)
    rep = replicate(mesh)
    bsh = batch_sharding(mesh)

    def step(state: TrainState, batch: EventBatch):
        def objective(params):
            pred, new_bn = drn_net_apply(params, state.bn_state, batch,
                                         train=True, cfg=cfg.drn)
            return drn_loss_fn(pred, batch), new_bn

        (loss, new_bn), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bn, new_opt, state.step + 1), loss

    return jax.jit(
        step,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
