"""Batch-inference CLI: writes per-event MET estimates (+ weights for the
flagship model) for ALL events, with dataset positions for re-ordering."""

import os.path as osp

import numpy as np
import jax

from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
from deepmetv2_tpu.models import graph_met_init
from deepmetv2_tpu.train.loop import fit
from deepmetv2_tpu.train.step import init_train_state


def _train_tiny(tmp_path, model="graphmet", epochs=1):
    events = synthetic_events(12, seed=0, n_min=20, n_max=100)
    loaders = fetch_dataloader(events=events, batch_size=4,
                               validation_split=0.25, buckets=(128,))
    cfg = Config(graph=GraphConfig(max_neighbors=32),
                 data=DataConfig(batch_size=4, node_buckets=(128,)))
    if model == "drn":
        from deepmetv2_tpu.models.drn import drn_init
        init = drn_init(jax.random.PRNGKey(0), cfg.drn)
    else:
        init = graph_met_init(jax.random.PRNGKey(0))
    state = init_train_state(*init, cfg)
    fit(state, cfg, loaders["train"], loaders["test"], str(tmp_path),
        epochs=epochs, verbose=False, model=model)


class TestPredictCLI:
    def test_graphmet_predictions(self, tmp_path):
        from deepmetv2_tpu.cli.predict import main

        _train_tiny(tmp_path)
        out = osp.join(str(tmp_path), "pred.npz")
        assert main(["--ckpts", str(tmp_path), "--restore_file", "last",
                     "--synthetic", "10", "--batch_size", "4",
                     "--out", out]) == 0
        z = np.load(out)
        assert len(z["met"]) == 10
        # rows are un-permuted to input order
        np.testing.assert_array_equal(z["event_index"], np.arange(10))
        expect = synthetic_events(10, seed=42)
        np.testing.assert_array_equal(
            z["n_valid"], [x.shape[0] for x, _ in expect])
        np.testing.assert_allclose(
            z["met"], np.hypot(z["met_x"], z["met_y"]), rtol=1e-6)
        assert z["weights"].shape[0] == 10
        w = z["weights"]
        nv = z["n_valid"]
        for i in range(10):   # weights are sigmoid outputs on real rows
            assert np.all((w[i, :nv[i]] > 0) & (w[i, :nv[i]] < 1))

    def test_drn_predictions(self, tmp_path):
        from deepmetv2_tpu.cli.predict import main

        _train_tiny(tmp_path, model="drn")
        out = osp.join(str(tmp_path), "pred.npz")
        assert main(["--ckpts", str(tmp_path), "--restore_file", "last",
                     "--synthetic", "10", "--batch_size", "4",
                     "--model", "drn", "--out", out]) == 0
        z = np.load(out)
        assert len(z["met"]) == 10 and "weights" not in z
        assert np.all(z["met"] >= 0)
