"""Plotting layer + CLI smoke tests (headless matplotlib)."""

import os.path as osp

import numpy as np
import jax
import pytest

from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
from deepmetv2_tpu.models import graph_met_init
from deepmetv2_tpu.plotting import (
    compute_weight_summary,
    plot_resolutions,
    plot_weight_summary,
)
from deepmetv2_tpu.train.step import make_eval_step
from deepmetv2_tpu.utils import artifacts

REF_RES = "/root/reference/ckpts_dytt/best.resolutions"


class TestResolutionPlots:
    def test_plots_reference_artifact(self, tmp_path):
        if not osp.exists(REF_RES):
            pytest.skip("reference artifact absent")
        res = artifacts.load(REF_RES)
        written = plot_resolutions(res, str(tmp_path) + "/ref_")
        assert len(written) == 5
        for w in written:
            assert osp.exists(w) and osp.getsize(w) > 1000

    def test_plots_own_artifact(self, tmp_path):
        from deepmetv2_tpu.train.loop import evaluate

        cfg = Config(graph=GraphConfig(max_neighbors=16),
                     data=DataConfig(node_buckets=(128,)))
        events = synthetic_events(12, seed=0, n_min=20, n_max=100)
        loaders = fetch_dataloader(events=events, batch_size=4,
                                   validation_split=0.5, buckets=(128,))
        params, bn_state = graph_met_init(jax.random.PRNGKey(0))
        eval_step = make_eval_step(cfg)
        _, hists = evaluate(params, bn_state, eval_step, loaders["test"],
                            cfg, verbose=False)
        written = plot_resolutions(hists, str(tmp_path) + "/own_")
        assert len(written) == 5


class TestWeightSummary:
    def test_summary_layout_and_plots(self, tmp_path):
        cfg = Config(graph=GraphConfig(max_neighbors=16),
                     data=DataConfig(node_buckets=(128,)))
        events = synthetic_events(12, seed=1, n_min=20, n_max=100)
        loaders = fetch_dataloader(events=events, batch_size=6,
                                   validation_split=0.5, buckets=(128,))
        params, bn_state = graph_met_init(jax.random.PRNGKey(1))
        eval_step = make_eval_step(cfg)
        summary = compute_weight_summary(eval_step, params, bn_state,
                                         loaders["test"], cfg)
        # reference weight.plt layout (plt_weight.py:191-199)
        assert set(summary.keys()) == {
            "bin_edges", "weight_pt_hist", "weight_eta_hist",
            "weight_puppi_hist", "weight_CH_hist", "weight_qT_hist"}
        assert set(summary["weight_pt_hist"].keys()) == {
            "HF Candidate", "Electron", "Muon", "Gamma",
            "Neutral Hadron", "Charged Hadron"}
        assert set(summary["weight_puppi_hist"].keys()) == {
            "HF Candidate", "Gamma", "Neutral Hadron"}
        assert set(summary["weight_qT_hist"].keys()) == {
            "TrueMET", "GraphMET", "PFMET", "PUPPIMET",
            "DeepMETResponse", "DeepMETResolution"}
        # mean weights are in [0, 1]
        for vals in summary["weight_pt_hist"].values():
            assert np.all((vals >= 0) & (vals <= 1))
        # artifact roundtrip + plots
        artifacts.save(summary, str(tmp_path / "weight.plt"))
        back = artifacts.load(str(tmp_path / "weight.plt"))
        assert set(back.keys()) == set(summary.keys())
        written = plot_weight_summary(summary, str(tmp_path) + "/w_")
        assert len(written) == 5
