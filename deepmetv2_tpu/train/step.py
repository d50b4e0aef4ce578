"""Jit-compiled train/eval steps.

The reference's per-step pipeline (train.py:39-54) — slice features, build
the radius graph, forward, loss, backward, AdamW — is compiled here into a
single XLA program per (bucket, batch-size) shape: graph construction,
message passing, loss, gradient, and optimizer update all fuse on device
with zero host synchronization except the scalar loss fetch.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from deepmetv2_tpu.config import Config
from deepmetv2_tpu.data.batching import EventBatch, Neighborhood
from deepmetv2_tpu.models.graph_met import net_apply
from deepmetv2_tpu.ops.graph import radius_graph
from deepmetv2_tpu.train.loss import drn_loss_fn, drn_met_vector, loss_fn


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AdamW exactly as the reference configures it (train.py:75: lr 1e-3;
    torch defaults betas (0.9, 0.999), eps 1e-8, weight_decay 0.01).
    Learning rate is injected so the host-side plateau controller
    (schedule.py) can adjust it between epochs without recompiling.
    Optional global-norm gradient clipping (off by default for reference
    parity) is chained in front of AdamW when configured."""
    adamw = optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.optim.lr,
        b1=cfg.optim.betas[0],
        b2=cfg.optim.betas[1],
        eps=cfg.optim.eps,
        weight_decay=cfg.optim.weight_decay,
    )
    if cfg.optim.grad_clip_norm is not None:
        return optax.chain(
            optax.clip_by_global_norm(cfg.optim.grad_clip_norm), adamw)
    return adamw


def init_train_state(params, bn_state, cfg: Config) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Write the plateau-controlled lr into the injected hyperparams.
    With grad clipping the optimizer is a chain — find the element that
    carries the injected hyperparams."""
    opt_state = state.opt_state
    elems = (opt_state,) if hasattr(opt_state, "hyperparams") else opt_state
    for el in elems:
        if hasattr(el, "hyperparams"):
            el.hyperparams["learning_rate"] = jnp.asarray(
                lr, el.hyperparams["learning_rate"].dtype)
    return state._replace(opt_state=opt_state)


def build_graph(batch: EventBatch, cfg: Config):
    """Per-batch graph in (eta, phi) — reference train.py:44-48.

    Returns ``(batch, graph)``: in 'window' mode the batch comes back
    eta-sorted (losses/metrics are permutation-invariant per event) and the
    graph is implicit; in 'neighbor_list' mode the batch is unchanged and
    the graph is an explicit capped-degree Neighborhood.
    """
    if cfg.graph.mode == "window":
        from deepmetv2_tpu.ops.window import WindowGraph

        if not cfg.graph.presorted:
            from deepmetv2_tpu.data.sorting import sort_by_eta

            batch, _ = sort_by_eta(batch)
        phi = jnp.arctan2(batch.x_cont[..., 1], batch.x_cont[..., 0])
        etaphi = jnp.stack([batch.x_cont[..., 3], phi], axis=-1)
        return batch, WindowGraph(etaphi, batch.mask, r=cfg.graph.delta_r,
                                  halo=cfg.graph.window_halo)

    phi = jnp.arctan2(batch.x_cont[..., 1], batch.x_cont[..., 0])
    etaphi = jnp.stack([batch.x_cont[..., 3], phi], axis=-1)
    wrap = (0.0, 2 * jnp.pi) if cfg.graph.phi_wraparound else None
    return batch, radius_graph(
        etaphi, batch.mask,
        r=cfg.graph.delta_r,
        k=cfg.graph.max_neighbors,
        loop=cfg.graph.self_loops,
        wrap_axes=wrap,
    )


def train_step_core(cfg: Config, opt):
    """Unjitted train-step body ``(state, batch) -> (state, loss)`` — jitted
    standalone by :func:`make_train_step`, or scanned over a stacked chain
    of batches by train/chain.py (one device program per K steps)."""

    def core(state: TrainState, batch: EventBatch) -> Tuple[TrainState, jnp.ndarray]:
        batch, nbr = build_graph(batch, cfg)

        def objective(params):
            w, new_bn = net_apply(params, state.bn_state, batch, nbr,
                                  train=True, cfg=cfg.model)
            return loss_fn(w, batch), new_bn

        (loss, new_bn), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bn, new_opt, state.step + 1), loss

    return core


def make_train_step(cfg: Config):
    return jax.jit(train_step_core(cfg, make_optimizer(cfg)),
                   donate_argnums=(0,))


def eval_step_body(cfg: Config):
    """Unjitted eval-step body returning weights in the CALLER's candidate
    order.

    In window mode the forward runs on the eta-sorted batch; the weights
    are unsorted back through the inverse permutation so downstream
    consumers (resolution metrics, plt_weight histograms — reference
    evaluate.py:103, plt_weight.py:124-131) can pair them with their own
    per-candidate features.  ``make_eval_step`` jits this for one device;
    parallel.dp.make_dp_eval_step jits it with mesh shardings."""

    def eval_step(params, bn_state, batch: EventBatch):
        if cfg.graph.mode == "window" and not cfg.graph.presorted:
            from deepmetv2_tpu.data.sorting import sort_by_eta

            gbatch, perm = sort_by_eta(batch)
            _, nbr = build_graph(gbatch, cfg)
            w, _ = net_apply(params, bn_state, gbatch, nbr, train=False,
                             cfg=cfg.model)
            loss = loss_fn(w, gbatch)
            inv = jnp.argsort(perm, axis=1)
            w = jnp.take_along_axis(w, inv, axis=1)
            return w, loss, jnp.zeros((batch.batch_size,), jnp.int32)

        gbatch, nbr = build_graph(batch, cfg)
        w, _ = net_apply(params, bn_state, gbatch, nbr, train=False,
                         cfg=cfg.model)
        edges = (nbr.num_edges() if isinstance(nbr, Neighborhood)
                 else jnp.zeros((batch.batch_size,), jnp.int32))
        return w, loss_fn(w, gbatch), edges

    return eval_step


def make_eval_step(cfg: Config):
    """Single-device jitted eval step (see eval_step_body)."""
    return jax.jit(eval_step_body(cfg))


def make_bn_refresh_step(cfg: Config, model: str = "graphmet"):
    """One "precise-BN" pass: forward with train=True batch statistics,
    returning only the updated BatchNorm state (parameters untouched).
    Used by fit() before validation when cfg.train.bn_refresh_batches > 0."""
    if model == "drn":
        from deepmetv2_tpu.models.drn import drn_net_apply

        @jax.jit
        def refresh(params, bn_state, batch: EventBatch):
            _, new_bn = drn_net_apply(params, bn_state, batch, train=True,
                                      cfg=cfg.drn)
            return new_bn
    else:
        @jax.jit
        def refresh(params, bn_state, batch: EventBatch):
            gbatch, nbr = build_graph(batch, cfg)
            _, new_bn = net_apply(params, bn_state, gbatch, nbr, train=True,
                                  cfg=cfg.model)
            return new_bn

    return refresh


def make_drn_train_step(cfg: Config, graph_force=None):
    """Train step for the DynamicReductionNetwork family.  No radius graph
    is built — the DRN rebuilds feature-space kNN graphs internally per
    reduction round (reference model/dynamic_reduction_network.py:86,94).
    ``graph_force`` pins the dynamic-graph strategy ('fused'/'composed',
    ops/dyn_graph.py) — bench/debug knob; None auto-selects."""
    return jax.jit(
        drn_train_step_core(cfg, make_optimizer(cfg), graph_force),
        donate_argnums=(0,))


def drn_train_step_core(cfg: Config, opt, graph_force=None):
    """Unjitted DRN train-step body (see :func:`train_step_core`)."""
    from deepmetv2_tpu.models.drn import drn_net_apply

    def core(state: TrainState, batch: EventBatch):
        def objective(params):
            pred, new_bn = drn_net_apply(params, state.bn_state, batch,
                                         train=True, cfg=cfg.drn,
                                         graph_force=graph_force)
            return drn_loss_fn(pred, batch, cfg.drn.head), new_bn

        (loss, new_bn), grads = jax.value_and_grad(objective, has_aux=True)(
            state.params
        )
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bn, new_opt, state.step + 1), loss

    return core


def make_drn_eval_step(cfg: Config):
    """Eval step for the DRN: returns the cartesian MET estimate [B, 2],
    the loss, and a zero edge count (the dynamic graphs are internal)."""
    from deepmetv2_tpu.models.drn import drn_net_apply

    @jax.jit
    def eval_step(params, bn_state, batch: EventBatch):
        pred, _ = drn_net_apply(params, bn_state, batch, train=False,
                                cfg=cfg.drn)
        v_met = drn_met_vector(pred, cfg.drn.head)
        return v_met, drn_loss_fn(pred, batch, cfg.drn.head), jnp.zeros(
            (batch.batch_size,), jnp.int32)

    return eval_step
