"""Train / evaluate drivers — reference train.py:34-145, evaluate.py:31-164.

Library-level loops; the CLIs in deepmetv2_tpu/cli wrap these with argparse.
Artifact contract matches the reference exactly: ``loss.log`` CSV,
``metrics_val_{best,last}.json``, ``{best,last}.resolutions`` (lz4+pickle),
``{best,last}.ckpt``.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from typing import Dict, Optional, Tuple

import numpy as np

from deepmetv2_tpu.config import Config
from deepmetv2_tpu.data.loader import PaddedLoader
from deepmetv2_tpu.train import metrics as metrics_mod
from deepmetv2_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from deepmetv2_tpu.train.schedule import ReduceLROnPlateau
from deepmetv2_tpu.train.step import (
    TrainState,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)
from deepmetv2_tpu.utils import artifacts
from deepmetv2_tpu.utils.logging import RunningAverage, StepTimer


def train_one_epoch(state, train_step, loader: PaddedLoader, epoch: int,
                    log_every: int = 50, verbose: bool = True, place=None,
                    chain: int = 1):
    """One pass over the training set (reference train.py:34-60).

    Unlike the reference's per-step ``loss.item()`` device sync
    (train.py:54), losses stay on device until the epoch ends — steps
    pipeline back-to-back and the host never blocks the TPU.  Batches are
    staged onto the device double-buffered (``prefetch_to_device``);
    ``place`` overrides the placement for mesh training.  A
    :class:`~deepmetv2_tpu.train.resident.ResidentFeed` ``loader`` skips
    staging entirely: the epoch replays from device memory (its stacks are
    already chained and placed; ``chain``/``place`` are ignored).

    ``chain > 1``: ``train_step`` must be a chained step
    (train/chain.make_chained_train_step) — consecutive same-shape
    batches are stacked and each chain of up to ``chain`` optimizer steps
    runs as ONE device program, returning its per-step losses."""
    from deepmetv2_tpu.data.loader import prefetch_to_device
    from deepmetv2_tpu.train.chain import chain_batches
    from deepmetv2_tpu.train.resident import ResidentFeed

    losses = []
    avg = RunningAverage()
    timer = StepTimer()
    timer.start()
    resident = isinstance(loader, ResidentFeed)
    if resident:
        feed_iter = iter(loader)
        total = sum(k for k, _ in loader.meta) if loader.meta else len(loader)
    else:
        feed = chain_batches(loader, chain) if chain > 1 else loader
        feed_iter = prefetch_to_device(feed, place=place)
        total = len(loader)
    done = 0
    for i, batch in enumerate(feed_iter):
        state, loss = train_step(state, batch)
        losses.append(loss)            # device scalar(s) — no sync
        k = loss.shape[0] if loss.ndim else 1
        done += k
        if resident and loader.meta:
            # host-side staging metadata: never read staged device arrays
            # back for accounting (a D2H round-trip per step)
            timer.update(num_edges=0, num_nodes=loader.meta[i][1])
        else:
            timer.update(num_edges=0,
                         num_nodes=int(np.sum(np.asarray(batch.num_valid))))
        if verbose and done // log_every > (done - k) // log_every:
            import jax.numpy as jnp
            avg.update(float(jnp.mean(loss)))  # sync at the log cadence
            r = timer.rates()
            print(f"  epoch {epoch} step {done}/{total} "
                  f"loss {avg():.3f} ({r['steps_per_s'] * k:.2f} it/s)")
    import jax.numpy as jnp
    # one stacked transfer — per-scalar float() fetches are latency-bound
    # through remote-device links (hundreds of round-trips per epoch)
    mean_loss = (float(jnp.mean(jnp.concatenate(
        [jnp.atleast_1d(l) for l in losses]))) if losses else float("inf"))
    if verbose:
        print(f"Training epoch: {epoch:02d}, MSE: {mean_loss:.4f}")
    return state, mean_loss


def evaluate(params, bn_state, eval_step, loader: PaddedLoader,
             cfg: Config, verbose: bool = True, model: str = "graphmet",
             place=None) -> Tuple[Dict[str, float], Dict]:
    """Full validation pass + qT-binned resolution summary
    (reference evaluate.py:31-164).  ``model`` selects how the eval step's
    first output is interpreted: per-candidate weights ('graphmet') or a
    direct cartesian MET estimate ('drn')."""
    from deepmetv2_tpu.data.loader import prefetch_to_device
    from deepmetv2_tpu.train.resident import ResidentFeed

    losses = []
    arrs, qts, evs = [], [], []
    has_deepmet = False
    feed = (iter(loader) if isinstance(loader, ResidentFeed)
            else prefetch_to_device(loader, place=place))
    for batch in feed:
        w, loss, _ = eval_step(params, bn_state, batch)
        losses.append(loss)           # device scalar; stacked at the end
        has_deepmet = bool(batch.y.shape[1] > 6)
        v_met = (w if model == "drn"
                 else metrics_mod._neg_weighted_met(w, batch))
        arr, qt = metrics_mod._decompose_all(v_met, batch.y, has_deepmet)
        arrs.append(arr)              # device arrays — no host sync here
        qts.append(qt)
        evs.append(batch.num_valid)
    if arrs:
        resolutions_arr, qt_arr = metrics_mod.finalize_resolutions(
            arrs, qts, evs, has_deepmet)
    else:
        resolutions_arr, qt_arr = {}, np.zeros((0,))

    hists = metrics_mod.resolution_histograms(
        resolutions_arr, qt_arr,
        max_qt=cfg.train.qt_max,
        bin_width=cfg.train.qt_bin_width,
        hist_bins=cfg.train.qt_hist_bins,
    )
    import jax.numpy as jnp
    metrics_mean = {"loss": float(jnp.mean(jnp.stack(losses)))
                    if losses else float("inf")}
    if verbose:
        print("- Eval metrics : " +
              " ; ".join(f"{k}: {v:05.3f}" for k, v in metrics_mean.items()))
    return metrics_mean, hists


def make_sharded_eval(cfg: Config, mesh, model: str = "graphmet"):
    """(eval_step, eval_place) for mesh evaluation — data-parallel over the
    mesh's data axis (node-axis sharding buys nothing for the forward-only
    pass at these sizes).  Odd-sized batches are padded with empty events
    (``num_valid == 0``, excluded from loss/metrics — train/loss.py,
    train/metrics.finalize_resolutions) up to a data-axis multiple, so
    EVERY batch shards over the mesh: no single-device fallback."""
    from deepmetv2_tpu.data.batching import pad_batch_events
    from deepmetv2_tpu.parallel.dp import (make_dp_eval_step,
                                           make_drn_dp_eval_step)
    from deepmetv2_tpu.parallel.mesh import DATA_AXIS, shard_batch

    raw_eval = (make_drn_dp_eval_step(cfg, mesh) if model == "drn"
                else make_dp_eval_step(cfg, mesh))
    n_data = mesh.shape[DATA_AXIS]

    def _pad_to_axis(b):
        rem = b.batch_size % n_data
        return pad_batch_events(b, b.batch_size + n_data - rem) if rem else b

    def eval_place(b):
        return shard_batch(_pad_to_axis(b), mesh, False)

    def eval_step(params, bn_state, batch):
        with mesh:
            return raw_eval(params, bn_state,
                            shard_batch(_pad_to_axis(batch), mesh, False))

    return eval_step, eval_place


def fit(
    state: TrainState,
    cfg: Config,
    train_loader: PaddedLoader,
    val_loader: PaddedLoader,
    ckpt_dir: str,
    restore_file: Optional[str] = None,
    epochs: Optional[int] = None,
    verbose: bool = True,
    model: str = "graphmet",
    mesh=None,
    shard_nodes: bool = False,
) -> TrainState:
    """Full training driver (reference train.py:62-145).  ``model``
    selects the family: 'graphmet' (flagship weight regressor) or 'drn'
    (DynamicReductionNetwork direct MET head).

    ``mesh`` (a ``jax.sharding.Mesh`` from parallel.mesh.make_mesh) trains
    multi-chip: data-parallel over the ``data`` axis, and with
    ``shard_nodes=True`` edge-partitioned over the ``node`` axis (window
    mode, halo exchange).  Evaluation is data-parallel over the same mesh
    (per-event metric decomposition shards trivially); odd-sized eval
    batches are padded with empty events to a data-axis multiple so they
    stay sharded (see make_sharded_eval).

    Multi-host safe: on a multi-process cluster every process computes,
    but only process 0 writes checkpoints/logs/artifacts."""
    import jax

    primary = jax.process_index() == 0
    verbose = verbose and primary
    if primary:
        os.makedirs(ckpt_dir, exist_ok=True)
    # Multi-step chained programs (train/chain.py): K same-shape batches
    # per dispatch, for every single-process path — single-device,
    # data-parallel, and both edge-partitioned cores (halo-exchange
    # window and node-sharded DRN scan like any other core).
    # Multi-process runs stay per-step.
    chain = (max(1, cfg.train.chain_steps)
             if jax.process_count() == 1 else 1)
    if mesh is not None:
        from deepmetv2_tpu.parallel.dp import (make_dp_train_step,
                                               make_drn_dp_train_step)
        from deepmetv2_tpu.parallel.dyn import make_drn_ep_train_step
        from deepmetv2_tpu.parallel.ep import make_ep_train_step
        from deepmetv2_tpu.parallel.mesh import batch_sharding, shard_batch
        if chain > 1:
            from deepmetv2_tpu.train.chain import (make_chained_train_step,
                                                   prepend_chain_axis)
            raw_step = make_chained_train_step(cfg, model, mesh,
                                               shard_nodes=shard_nodes)
            chain_sh = prepend_chain_axis(batch_sharding(mesh, shard_nodes))

            def place_chain(b):
                return jax.tree_util.tree_map(jax.device_put, b, chain_sh)

            def train_step(state, stacked):
                with mesh:
                    return raw_step(state, place_chain(stacked))

            train_place = place_chain
        else:
            if model == "drn":
                raw_step = (make_drn_ep_train_step(cfg, mesh) if shard_nodes
                            else make_drn_dp_train_step(cfg, mesh))
            else:
                raw_step = (make_ep_train_step(cfg, mesh) if shard_nodes
                            else make_dp_train_step(cfg, mesh))

            def train_step(state, batch):
                with mesh:
                    return raw_step(state,
                                    shard_batch(batch, mesh, shard_nodes))

            # prefetch placement: stage batches pre-sharded so the steps'
            # internal shard_batch/device_put is a no-op
            def train_place(b):
                return shard_batch(b, mesh, shard_nodes)

        eval_step, eval_place = make_sharded_eval(cfg, mesh, model)
    elif chain > 1:
        from deepmetv2_tpu.train.chain import make_chained_train_step
        from deepmetv2_tpu.train.step import make_drn_eval_step
        train_step = make_chained_train_step(cfg, model)
        eval_step = (make_drn_eval_step(cfg) if model == "drn"
                     else make_eval_step(cfg))
        train_place = eval_place = None
    elif model == "drn":
        from deepmetv2_tpu.train.step import (make_drn_eval_step,
                                              make_drn_train_step)
        train_step = make_drn_train_step(cfg)
        eval_step = make_drn_eval_step(cfg)
        train_place = eval_place = None
    else:
        train_step = make_train_step(cfg)
        eval_step = make_eval_step(cfg)
        train_place = eval_place = None
    # Device-resident epoch feeds (train/resident.py): stage the memoized
    # epoch into HBM once and replay it — per-epoch host->device staging
    # (the measured feed bound: 366.6 vs 5,376 events/s, BENCH_r04)
    # drops to zero after epoch 1.  Single-process only: a multi-process
    # global device_put needs per-host addressable shards, which is the
    # streaming shard_batch path.
    host_train_loader = train_loader        # bn-refresh reads host batches
    if cfg.train.resident_feed and jax.process_count() == 1:
        from deepmetv2_tpu.train.resident import ResidentFeed

        train_loader = ResidentFeed(train_loader, chain=chain,
                                    place=train_place)
        val_loader = ResidentFeed(val_loader, chain=1, place=eval_place)
    scheduler = ReduceLROnPlateau(
        lr=cfg.optim.lr,
        factor=cfg.optim.plateau_factor,
        patience=cfg.optim.plateau_patience,
        threshold=cfg.optim.plateau_threshold,
    )

    first_epoch = 0
    best_validation_loss = 1e8  # reference train.py:78
    if restore_file is not None:
        path = osp.join(ckpt_dir, restore_file + ".ckpt")
        state, payload = load_checkpoint(path, template=state, scheduler=scheduler)
        first_epoch = payload["epoch"]
        if verbose:
            print(f"Restarting training from epoch {first_epoch}")
        best_json = osp.join(ckpt_dir, "metrics_val_best.json")
        if osp.exists(best_json):
            import json
            with open(best_json) as f:
                best_validation_loss = json.load(f)["loss"]

    if primary:  # reproducibility: the exact resolved config of this run
        with open(osp.join(ckpt_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())

    loss_log = (open(osp.join(ckpt_dir, "loss.log"),
                     "a" if restore_file else "w")
                if primary else open(os.devnull, "w"))
    if not restore_file:
        loss_log.write("# loss log for training starting at "
                       + time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()) + "\n")
        loss_log.write("epoch, loss, val_loss\n")
        loss_log.flush()

    n_epochs = epochs if epochs is not None else cfg.train.epochs
    refresh_step = None
    for epoch in range(first_epoch + 1, n_epochs + 1):
        if verbose:
            print(f"Current best loss: {best_validation_loss}")
            print(f"Learning rate: {scheduler.lr}")

        state, train_loss = train_one_epoch(state, train_step, train_loader,
                                            epoch, verbose=verbose,
                                            place=train_place, chain=chain)

        if cfg.train.bn_refresh_batches > 0:
            # precise-BN: re-estimate running statistics under the CURRENT
            # parameters before validating (see TrainConfig.bn_refresh_batches)
            if refresh_step is None:
                from deepmetv2_tpu.train.step import make_bn_refresh_step
                refresh_step = make_bn_refresh_step(cfg, model)
            bn = state.bn_state
            for i, rb in enumerate(host_train_loader):
                if i >= cfg.train.bn_refresh_batches:
                    break
                bn = refresh_step(state.params, bn, rb)
            state = state._replace(bn_state=bn)
        new_lr = scheduler.step(train_loss)        # reference train.py:58
        state = set_learning_rate(state, new_lr)

        if primary:
            save_checkpoint(state, scheduler, epoch, is_best=False,
                            checkpoint_dir=ckpt_dir)

        test_metrics, resolutions = evaluate(
            state.params, state.bn_state, eval_step, val_loader, cfg,
            verbose=verbose, model=model, place=eval_place)
        validation_loss = test_metrics["loss"]
        loss_log.write(f"{epoch},{train_loss:.2f},{validation_loss:.2f}\n")
        loss_log.flush()

        if validation_loss <= best_validation_loss:
            if verbose:
                print("Found new best loss!")
            best_validation_loss = validation_loss
            if primary:
                save_checkpoint(state, scheduler, epoch, is_best=True,
                                checkpoint_dir=ckpt_dir)
                artifacts.save_dict_to_json(
                    test_metrics, osp.join(ckpt_dir, "metrics_val_best.json"))
                artifacts.save(resolutions,
                               osp.join(ckpt_dir, "best.resolutions"))

        if primary:
            artifacts.save_dict_to_json(
                test_metrics, osp.join(ckpt_dir, "metrics_val_last.json"))
            artifacts.save(resolutions, osp.join(ckpt_dir, "last.resolutions"))

    loss_log.close()
    return state
