"""Device-resident epoch feed (train/resident.py): replaying the staged
epoch from device memory must be bit-identical to streaming per-step
dispatch — same losses, same loss.log — and must stage each stack ONCE."""

import dataclasses

import jax
import numpy as np

from deepmetv2_tpu.config import Config, DataConfig, TrainConfig
from deepmetv2_tpu.data import collate, fetch_dataloader, synthetic_events
from deepmetv2_tpu.models import graph_met_init
from deepmetv2_tpu.train.loop import fit
from deepmetv2_tpu.train.resident import ResidentFeed
from deepmetv2_tpu.train.step import init_train_state


def _loaders(n_events=40, seed=13, bs=4, cap=64):
    events = synthetic_events(n_events, seed=seed, n_min=8, n_max=cap - 1)
    return fetch_dataloader(events=events, batch_size=bs,
                            validation_split=0.2, buckets=(cap,))


class TestResidentFeed:
    def test_stages_once_and_replays_same_arrays(self):
        ld = _loaders()["train"]
        calls = []

        def counting_place(tree):
            calls.append(1)
            return jax.device_put(tree)

        feed = ResidentFeed(ld, chain=3, place=counting_place)
        first = list(feed)
        n_stage = len(calls)
        assert n_stage == len(first) > 0
        second = list(feed)
        assert len(calls) == n_stage          # no re-staging on epoch 2
        for a, b in zip(first, second):       # identical device arrays
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b)):
                assert x is y
        # staging metadata: one (chain_len, node_count) pair per stack
        assert len(feed.meta) == len(first)
        assert feed.nbytes() > 0

    def test_max_bytes_falls_back_to_streaming(self):
        ld = _loaders()["train"]
        feed = ResidentFeed(ld, chain=2, max_bytes=16)  # absurdly small
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            stacks = list(feed)
        assert feed.nbytes() == 0 and feed.meta == []
        # still yields the full epoch (streamed)
        assert len(stacks) == len(ResidentFeed(ld, chain=2))

    def test_fit_resident_matches_streaming(self, tmp_path):
        """End-to-end: fit() with the resident feed (default) must produce
        the SAME loss.log as the streaming feed (resident_feed=False) —
        the round-5 acceptance gate for the feed redesign."""
        cfg = Config(data=DataConfig(batch_size=4, node_buckets=(64,)),
                     train=TrainConfig(epochs=2, chain_steps=3))
        loaders = _loaders()
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(3)), cfg)
        fit(st, cfg, loaders["train"], loaders["test"],
            str(tmp_path / "res"), verbose=False)

        cfg_s = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, resident_feed=False))
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(3)), cfg_s)
        fit(st, cfg_s, loaders["train"], loaders["test"],
            str(tmp_path / "str"), verbose=False)

        log_r = (tmp_path / "res" / "loss.log").read_text().splitlines()[2:]
        log_s = (tmp_path / "str" / "loss.log").read_text().splitlines()[2:]
        assert log_r == log_s and len(log_r) == 2

    def test_multi_bucket_epoch(self, tmp_path):
        """Mixed bucket sizes: chains never span a shape change, and the
        resident replay covers every stack — fit() output matches the
        streaming feed on a multi-bucket dataset."""
        events = (synthetic_events(16, seed=3, n_min=8, n_max=60)
                  + synthetic_events(16, seed=4, n_min=70, n_max=120)
                  + synthetic_events(8, seed=5, n_min=8, n_max=60))
        loaders = fetch_dataloader(events=events, batch_size=4,
                                   validation_split=0.2, buckets=(64, 128))
        cfg = Config(data=DataConfig(batch_size=4, node_buckets=(64, 128)),
                     train=TrainConfig(epochs=2, chain_steps=4))
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(7)), cfg)
        fit(st, cfg, loaders["train"], loaders["test"],
            str(tmp_path / "res"), verbose=False)

        cfg_s = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, resident_feed=False))
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(7)), cfg_s)
        fit(st, cfg_s, loaders["train"], loaders["test"],
            str(tmp_path / "str"), verbose=False)

        log_r = (tmp_path / "res" / "loss.log").read_text().splitlines()[2:]
        log_s = (tmp_path / "str" / "loss.log").read_text().splitlines()[2:]
        assert log_r == log_s and len(log_r) == 2

    def test_resume_under_resident_feed(self, tmp_path):
        """Checkpoint resume (reference train.py:92-98) with the resident
        feed active: a 2+2-epoch restored run writes the same number of
        epochs as an uninterrupted 4-epoch run and continues from the
        checkpointed state (loss.log appends, no epoch renumbering)."""
        cfg = Config(data=DataConfig(batch_size=4, node_buckets=(64,)),
                     train=TrainConfig(epochs=2, chain_steps=3))
        loaders = _loaders()
        ck = str(tmp_path / "resume")
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(9)), cfg)
        fit(st, cfg, loaders["train"], loaders["test"], ck, verbose=False)

        cfg4 = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=4))
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(9)), cfg4)
        fit(st, cfg4, loaders["train"], loaders["test"], ck,
            restore_file="last", verbose=False)

        lines = [l for l in open(f"{ck}/loss.log").read().splitlines()
                 if l and not l.startswith(("#", "epoch"))]
        assert [int(l.split(",")[0]) for l in lines] == [1, 2, 3, 4]

    def test_fit_resident_mesh_dp(self, tmp_path):
        """Resident feed under a data-parallel mesh: staged stacks carry the
        chained dp shardings and the run matches the streaming mesh run."""
        from deepmetv2_tpu.parallel.mesh import make_mesh

        cfg = Config(data=DataConfig(batch_size=8, node_buckets=(64,)),
                     train=TrainConfig(epochs=1, chain_steps=2))
        loaders = _loaders(n_events=32, bs=8)
        mesh = make_mesh(n_data=4, n_node=1)
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(5)), cfg)
        fit(st, cfg, loaders["train"], loaders["test"],
            str(tmp_path / "res"), verbose=False, mesh=mesh)

        cfg_s = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, resident_feed=False))
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(5)), cfg_s)
        fit(st, cfg_s, loaders["train"], loaders["test"],
            str(tmp_path / "str"), verbose=False, mesh=mesh)

        log_r = (tmp_path / "res" / "loss.log").read_text().splitlines()[2:]
        log_s = (tmp_path / "str" / "loss.log").read_text().splitlines()[2:]
        assert log_r == log_s and len(log_r) == 1
