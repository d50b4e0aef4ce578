"""Training-stack tests: jitted step, plateau schedule, checkpoint/resume,
full fit() driver with the reference artifact contract."""

import json
import os.path as osp

import numpy as np
import jax
import pytest

from deepmetv2_tpu.config import Config, DataConfig, GraphConfig, TrainConfig
from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
from deepmetv2_tpu.models import graph_met_init
from deepmetv2_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from deepmetv2_tpu.train.loop import evaluate, fit, train_one_epoch
from deepmetv2_tpu.train.schedule import ReduceLROnPlateau
from deepmetv2_tpu.train.step import (
    init_train_state,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)
from deepmetv2_tpu.utils import artifacts


def _small_cfg():
    return Config(
        graph=GraphConfig(max_neighbors=32),
        data=DataConfig(batch_size=4, node_buckets=(128,)),
        train=TrainConfig(epochs=2),
    )


@pytest.fixture(scope="module")
def loaders():
    events = synthetic_events(24, seed=0, n_min=20, n_max=100)
    return fetch_dataloader(events=events, batch_size=4, validation_split=0.25,
                            buckets=(128,))


class TestScheduler:
    def test_reduces_after_patience(self):
        s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2, threshold=0.05)
        for loss in [10.0, 10.0, 10.0, 10.0]:
            lr = s.step(loss)
        # first step sets best; 3 bad epochs > patience 2 -> reduce
        assert lr == 0.5

    def test_relative_threshold(self):
        s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=0, threshold=0.05)
        s.step(100.0)
        # 96 is NOT better than 100*(1-0.05)=95 -> bad epoch -> reduce
        assert s.step(96.0) == 0.5
        # 40 is better than best*0.95 -> no reduce
        assert s.step(40.0) == 0.5
        assert s.best == 40.0

    def test_matches_reference_config_never_fires(self):
        # patience 500 over 100 epochs: lr never changes (reference behavior)
        s = ReduceLROnPlateau(lr=1e-3, patience=500)
        for e in range(100):
            lr = s.step(1000.0 + e)
        assert lr == 1e-3


class TestTrainStep:
    def test_loss_decreases(self, loaders):
        cfg = _small_cfg()
        params, bn_state = graph_met_init(jax.random.PRNGKey(0))
        state = init_train_state(params, bn_state, cfg)
        step = make_train_step(cfg)

        first = last = None
        for epoch in range(4):
            state, mean_loss = train_one_epoch(state, step, loaders["train"],
                                               epoch, verbose=False)
            if first is None:
                first = mean_loss
            last = mean_loss
        assert np.isfinite(last)
        assert last < first, f"loss did not decrease: {first} -> {last}"

    def test_set_learning_rate(self, loaders):
        cfg = _small_cfg()
        params, bn_state = graph_met_init(jax.random.PRNGKey(0))
        state = init_train_state(params, bn_state, cfg)
        state = set_learning_rate(state, 1e-5)
        assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(1e-5)


class TestEvaluate:
    def test_metrics_and_hists(self, loaders):
        cfg = _small_cfg()
        params, bn_state = graph_met_init(jax.random.PRNGKey(1))
        eval_step = make_eval_step(cfg)
        metrics, hists = evaluate(params, bn_state, eval_step, loaders["test"],
                                  cfg, verbose=False)
        assert np.isfinite(metrics["loss"])
        assert set(hists.keys()) == {"MET", "pfMET", "puppiMET",
                                     "deepMETResponse", "deepMETResolution"}
        for key, sub in hists.items():
            assert set(sub.keys()) == {"u_perp_resolution",
                                       "u_perp_scaled_resolution",
                                       "u_par_resolution",
                                       "u_par_scaled_resolution", "R"}
            w, edges = sub["R"]
            assert w.shape == (40,)
            assert edges.shape == (41,)


class TestEvalWindowModeOrdering:
    def test_window_eval_weights_in_caller_order(self, loaders):
        """Window-mode eval must return weights aligned with the caller's
        (unsorted) candidate order — resolution metrics pair w with px/py
        elementwise (reference model/net.py:129-133)."""
        import dataclasses

        cfg_nl = _small_cfg()
        cfg_nl = dataclasses.replace(
            cfg_nl, graph=GraphConfig(max_neighbors=128))  # uncapped
        cfg_win = dataclasses.replace(
            cfg_nl, graph=GraphConfig(mode="window", window_halo=128))
        params, bn = graph_met_init(jax.random.PRNGKey(3))
        step_nl = make_eval_step(cfg_nl)
        step_win = make_eval_step(cfg_win)
        for batch in loaders["test"]:
            w1, l1, _ = step_nl(params, bn, batch)
            w2, l2, _ = step_win(params, bn, batch)
            np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
            np.testing.assert_allclose(np.asarray(w1)[np.asarray(batch.mask)],
                                       np.asarray(w2)[np.asarray(batch.mask)],
                                       rtol=1e-4, atol=1e-5)
            break


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, loaders):
        cfg = _small_cfg()
        params, bn_state = graph_met_init(jax.random.PRNGKey(2))
        state = init_train_state(params, bn_state, cfg)
        step = make_train_step(cfg)
        state, _ = train_one_epoch(state, step, loaders["train"], 1, verbose=False)

        sched = ReduceLROnPlateau(lr=1e-3)
        sched.step(42.0)
        save_checkpoint(state, sched, epoch=7, is_best=False,
                        checkpoint_dir=str(tmp_path))

        sched2 = ReduceLROnPlateau(lr=999.0)
        template = init_train_state(*graph_met_init(jax.random.PRNGKey(3)), cfg)
        restored, payload = load_checkpoint(
            str(tmp_path / "last.ckpt"), template=template, scheduler=sched2)
        assert payload["epoch"] == 7
        assert sched2.best == 42.0
        assert sched2.lr == 1e-3
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_restored_training_continues(self, tmp_path, loaders):
        cfg = _small_cfg()
        state = init_train_state(*graph_met_init(jax.random.PRNGKey(4)), cfg)
        step = make_train_step(cfg)
        state, _ = train_one_epoch(state, step, loaders["train"], 1, verbose=False)
        sched = ReduceLROnPlateau(lr=1e-3)
        save_checkpoint(state, sched, 1, False, str(tmp_path))
        restored, _ = load_checkpoint(str(tmp_path / "last.ckpt"))
        _, loss = train_one_epoch(restored, step, loaders["train"], 2, verbose=False)
        assert np.isfinite(loss)


class TestFit:
    def test_full_driver_artifacts(self, tmp_path, loaders):
        cfg = _small_cfg()
        state = init_train_state(*graph_met_init(jax.random.PRNGKey(5)), cfg)
        fit(state, cfg, loaders["train"], loaders["test"], str(tmp_path),
            epochs=2, verbose=False)

        for f in ["last.ckpt", "best.ckpt", "loss.log",
                  "metrics_val_best.json", "metrics_val_last.json",
                  "best.resolutions", "last.resolutions"]:
            assert osp.exists(osp.join(str(tmp_path), f)), f

        with open(osp.join(str(tmp_path), "metrics_val_best.json")) as f:
            best = json.load(f)
        assert "loss" in best

        res = artifacts.load(osp.join(str(tmp_path), "best.resolutions"))
        assert "MET" in res and "u_perp_resolution" in res["MET"]

        lines = open(osp.join(str(tmp_path), "loss.log")).read().strip().split("\n")
        assert lines[1] == "epoch, loss, val_loss"
        assert len(lines) == 4  # header x2 + 2 epochs

    def test_resume(self, tmp_path, loaders):
        cfg = _small_cfg()
        state = init_train_state(*graph_met_init(jax.random.PRNGKey(6)), cfg)
        fit(state, cfg, loaders["train"], loaders["test"], str(tmp_path),
            epochs=1, verbose=False)
        state2 = init_train_state(*graph_met_init(jax.random.PRNGKey(7)), cfg)
        fit(state2, cfg, loaders["train"], loaders["test"], str(tmp_path),
            restore_file="last", epochs=2, verbose=False)
        lines = open(osp.join(str(tmp_path), "loss.log")).read().strip().split("\n")
        # header x2 + epoch1 + epoch2(resumed)
        assert len(lines) == 4


class TestDRNTraining:
    """The DRN family trains end-to-end through the same driver
    (reference kept its DRN Net commented out, model/net.py:12-37; here it
    is a first-class --model choice)."""

    def test_drn_loss_and_grad(self, loaders):
        from deepmetv2_tpu.models.drn import drn_init
        from deepmetv2_tpu.train.loss import drn_loss_fn, drn_met_vector
        from deepmetv2_tpu.models.drn import drn_net_apply

        cfg = _small_cfg()
        params, bn = drn_init(jax.random.PRNGKey(0), cfg.drn)
        batch = next(iter(loaders["train"]))

        def obj(p):
            pred, _ = drn_net_apply(p, bn, batch, train=True, cfg=cfg.drn)
            return drn_loss_fn(pred, batch)

        loss, grads = jax.value_and_grad(obj)(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)

        pred, _ = drn_net_apply(params, bn, batch, train=False, cfg=cfg.drn)
        v = drn_met_vector(pred)
        met = np.hypot(np.asarray(v)[:, 0], np.asarray(v)[:, 1])
        assert np.all(met >= 0)

    def test_drn_training_moves_params_every_epoch(self, tmp_path, loaders):
        """Regression guard for the frozen-training failure class (a
        150-epoch polar-head run froze with ~1e-11 gradients inside one
        epoch): with the cartesian head, parameters must keep moving and
        the train loss must drop across a few epochs."""
        import dataclasses
        from deepmetv2_tpu.models.drn import drn_init
        from deepmetv2_tpu.train.loop import train_one_epoch
        from deepmetv2_tpu.train.step import make_drn_train_step

        cfg = _small_cfg()
        cfg = dataclasses.replace(
            cfg, drn=dataclasses.replace(cfg.drn, head="cartesian",
                                         output_scale=50.0))
        state = init_train_state(*drn_init(jax.random.PRNGKey(3), cfg.drn),
                                 cfg)
        step = make_drn_train_step(cfg)
        losses, snaps = [], []
        for epoch in range(1, 4):
            snaps.append(jax.tree_util.tree_map(
                lambda a: np.asarray(a).copy(), state.params))
            state, mean_loss = train_one_epoch(
                state, step, loaders["train"], epoch, verbose=False)
            losses.append(mean_loss)
        final = jax.tree_util.tree_map(
            lambda a: np.asarray(a), state.params)
        for prev in snaps[1:]:      # every later epoch changed the params
            moved = sum(
                float(np.abs(a - b).max()) for a, b in zip(
                    jax.tree_util.tree_leaves(prev),
                    jax.tree_util.tree_leaves(final)))
            assert moved > 1e-6, "parameters stopped moving mid-training"
        assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    def test_drn_fit_driver(self, tmp_path, loaders):
        from deepmetv2_tpu.models.drn import drn_init

        cfg = _small_cfg()
        state = init_train_state(*drn_init(jax.random.PRNGKey(1), cfg.drn), cfg)
        fit(state, cfg, loaders["train"], loaders["test"], str(tmp_path),
            epochs=1, verbose=False, model="drn")
        for f in ["last.ckpt", "best.resolutions", "loss.log"]:
            assert osp.exists(osp.join(str(tmp_path), f)), f
        res = artifacts.load(osp.join(str(tmp_path), "best.resolutions"))
        assert "MET" in res


class TestBNRefresh:
    def test_refresh_updates_only_bn(self, tmp_path):
        """Precise-BN pass before eval: bn stats change, params don't."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
        from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
        from deepmetv2_tpu.models import graph_met_init
        from deepmetv2_tpu.train.loop import fit
        from deepmetv2_tpu.train.step import init_train_state

        events = synthetic_events(8, seed=21, n_min=20, n_max=60)
        loaders = fetch_dataloader(events=events, batch_size=4,
                                   validation_split=0.25, buckets=(64,))
        cfg = Config(graph=GraphConfig(max_neighbors=16),
                     data=DataConfig(batch_size=4, node_buckets=(64,)))
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, bn_refresh_batches=2))
        state = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
        out = fit(state, cfg, loaders["train"], loaders["test"],
                  str(tmp_path), epochs=1, verbose=False)
        assert int(jax.tree_util.tree_leaves(out.bn_state)[-1].sum()) != 0
