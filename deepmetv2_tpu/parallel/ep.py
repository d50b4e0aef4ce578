"""Edge-partitioned training step — data x node mesh with halo exchange.

The full multi-chip training configuration: events shard over the ``data``
axis, each event's (eta-sorted, padded) node axis shards over ``node``.
EdgeConv aggregations run through the halo-exchange window path
(parallel/halo.py); dense per-node ops shard trivially; BatchNorm/loss
reductions span both axes via GSPMD-inserted collectives.  Numerics match
the single-device window-mode step exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import optax
from jax.sharding import Mesh

from deepmetv2_tpu.config import Config
from deepmetv2_tpu.data.batching import EventBatch
from deepmetv2_tpu.models.graph_met import net_apply
from deepmetv2_tpu.parallel.context import edge_partitioning
from deepmetv2_tpu.parallel.mesh import batch_sharding, replicate
from deepmetv2_tpu.train.loss import loss_fn
from deepmetv2_tpu.train.step import TrainState, build_graph, make_optimizer


def ep_train_step_core(cfg: Config, opt, mesh: Mesh,
                       interpret: bool = False):
    """Unjitted edge-partitioned step body ``(state, batch) ->
    (state, loss)`` — jitted standalone by :func:`make_ep_train_step`, or
    scanned over a stacked chain of batches by train/chain.py (the
    ``edge_partitioning`` context is a trace-time switch, so it applies
    equally inside a scan body)."""
    if cfg.graph.mode != "window":
        cfg = dataclasses.replace(
            cfg, graph=dataclasses.replace(cfg.graph, mode="window"))

    def step(state: TrainState, batch: EventBatch) -> Tuple[TrainState, jax.Array]:
        with edge_partitioning(mesh, interpret=interpret):
            batch2, graph = build_graph(batch, cfg)

            def objective(params):
                w, new_bn = net_apply(params, state.bn_state, batch2, graph,
                                      train=True, cfg=cfg.model)
                return loss_fn(w, batch2), new_bn

            (loss, new_bn), grads = jax.value_and_grad(
                objective, has_aux=True)(state.params)
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_bn, new_opt,
                              state.step + 1), loss

    return step


def make_ep_train_step(cfg: Config, mesh: Mesh, interpret: bool = False):
    """jit-compiled edge-partitioned train step.

    ``cfg.graph.mode`` is forced to 'window' (the halo path requires the
    implicit sorted-window representation).
    """
    step = ep_train_step_core(cfg, make_optimizer(cfg), mesh, interpret)
    rep = replicate(mesh)
    bsh = batch_sharding(mesh, shard_nodes=True)
    return jax.jit(
        step,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
