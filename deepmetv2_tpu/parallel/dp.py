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


def dp_train_step_core(cfg: Config, opt):
    """Unjitted data-parallel step body — jitted with shardings by
    :func:`make_dp_train_step`, or scanned by train/chain.make_chained."""

    def step(state: TrainState, batch: EventBatch) -> Tuple[TrainState, jax.Array]:
        from deepmetv2_tpu.parallel import context as pctx

        # GSPMD-sharded trace: WindowGraph aggregation must take the XLA
        # window formulation (pallas_call has no SPMD partitioning rule)
        with pctx.force_xla_window():
            batch, nbr = build_graph(batch, cfg)

            def objective(params):
                w, new_bn = net_apply(params, state.bn_state, batch, nbr,
                                      train=True, cfg=cfg.model)
                return loss_fn(w, batch), new_bn

            (loss, new_bn), grads = jax.value_and_grad(
                objective, has_aux=True)(state.params)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bn, new_opt, state.step + 1), loss

    return step


def make_dp_train_step(cfg: Config, mesh: Mesh, shard_nodes: bool = False):
    """jit-compiled data-parallel train step with explicit shardings."""
    rep = replicate(mesh)
    bsh = batch_sharding(mesh, shard_nodes=shard_nodes)
    return jax.jit(
        dp_train_step_core(cfg, make_optimizer(cfg)),
        in_shardings=(rep, bsh),       # state replicated, batch sharded
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_dp_eval_step(cfg: Config, mesh: Mesh):
    """Data-parallel eval step (reference per-epoch eval, train.py:118):
    events shard over the ``data`` axis so evaluation scales with the mesh
    instead of serializing onto one chip.  Weights come back sharded over
    ``data`` (metrics decompose per event downstream)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from deepmetv2_tpu.parallel.mesh import DATA_AXIS
    from deepmetv2_tpu.train.step import eval_step_body

    rep = replicate(mesh)
    bsh = batch_sharding(mesh)
    out_sh = (NamedSharding(mesh, P(DATA_AXIS, None)),   # weights [B, N]
              rep,                                        # loss
              NamedSharding(mesh, P(DATA_AXIS)))          # edges [B]
    body = eval_step_body(cfg)

    def step(params, bn_state, batch):
        from deepmetv2_tpu.parallel import context as pctx

        with pctx.force_xla_window():   # see make_dp_train_step
            return body(params, bn_state, batch)

    return jax.jit(step, in_shardings=(rep, rep, bsh), out_shardings=out_sh)


def make_drn_dp_eval_step(cfg: Config, mesh: Mesh):
    """Data-parallel DRN eval step: per-event MET estimates [B, 2] sharded
    over the ``data`` axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from deepmetv2_tpu.models.drn import drn_net_apply
    from deepmetv2_tpu.parallel.mesh import DATA_AXIS
    from deepmetv2_tpu.train.loss import drn_loss_fn, drn_met_vector

    rep = replicate(mesh)
    bsh = batch_sharding(mesh)

    def eval_step(params, bn_state, batch: EventBatch):
        import jax.numpy as jnp
        from deepmetv2_tpu.parallel import context as pctx

        with pctx.force_xla_window():   # see make_drn_dp_train_step
            pred, _ = drn_net_apply(params, bn_state, batch, train=False,
                                    cfg=cfg.drn)
        v_met = drn_met_vector(pred, cfg.drn.head)
        return v_met, drn_loss_fn(pred, batch, cfg.drn.head), jnp.zeros(
            (batch.batch_size,), jnp.int32)

    out_sh = (NamedSharding(mesh, P(DATA_AXIS, None)), rep,
              NamedSharding(mesh, P(DATA_AXIS)))
    return jax.jit(eval_step, in_shardings=(rep, rep, bsh),
                   out_shardings=out_sh)


def make_drn_dp_train_step(cfg: Config, mesh: Mesh):
    """Data-parallel train step for the DRN family: events shard over the
    ``data`` axis; the per-round feature-space kNN, coarsening, and
    pooling are all per-event, so they shard trivially, while the edge
    BatchNorm statistics span the global batch via GSPMD psums."""
    rep = replicate(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        dp_drn_train_step_core(cfg, make_optimizer(cfg)),
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def dp_drn_train_step_core(cfg: Config, opt):
    """Unjitted data-parallel DRN step body (see dp_train_step_core)."""
    from deepmetv2_tpu.models.drn import drn_net_apply
    from deepmetv2_tpu.train.loss import drn_loss_fn

    def step(state: TrainState, batch: EventBatch):
        from deepmetv2_tpu.parallel import context as pctx

        # GSPMD-sharded trace: the DRN's dynamic-graph build must take the
        # composed XLA formulation (see ops/dyn_graph._fused_available)
        with pctx.force_xla_window():
            def objective(params):
                pred, new_bn = drn_net_apply(params, state.bn_state, batch,
                                             train=True, cfg=cfg.drn)
                return drn_loss_fn(pred, batch, cfg.drn.head), new_bn

            (loss, new_bn), grads = jax.value_and_grad(
                objective, has_aux=True)(state.params)
            updates, new_opt = opt.update(grads, state.opt_state,
                                          state.params)
            import optax
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_bn, new_opt,
                              state.step + 1), loss

    return step
