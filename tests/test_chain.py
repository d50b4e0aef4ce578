"""Multi-step chained device programs (train/chain.py): the scanned chain
must reproduce the sequential per-step dispatch EXACTLY — same losses,
same final parameters — while cutting dispatches K-fold."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepmetv2_tpu.config import Config, DataConfig, DRNConfig, TrainConfig
from deepmetv2_tpu.data import collate, fetch_dataloader, synthetic_events
from deepmetv2_tpu.models import graph_met_init
from deepmetv2_tpu.models.drn import drn_init
from deepmetv2_tpu.train.chain import (chain_batches, make_chained_train_step,
                                       stack_batches)
from deepmetv2_tpu.train.step import (init_train_state, make_drn_train_step,
                                      make_train_step)


def _batches(n, seed=0, n_max=64, bs=4):
    events = synthetic_events(n * bs, seed=seed, n_min=8, n_max=n_max - 1)
    return [collate(events[i * bs:(i + 1) * bs], buckets=(n_max,))
            for i in range(n)]


def _leaves_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestChainBatches:
    def test_groups_consecutive_same_shape(self):
        bs = _batches(5, n_max=64) + _batches(2, seed=9, n_max=128) + \
            _batches(1, seed=11, n_max=64)
        chains = list(chain_batches(iter(bs), 3))
        lens = [jax.tree_util.tree_leaves(c)[0].shape[0] for c in chains]
        # 5 of shape A -> 3 + 2; 2 of shape B -> 2; 1 of shape A -> 1
        assert lens == [3, 2, 2, 1]
        # order preserved exactly
        flat = []
        for c in chains:
            k = jax.tree_util.tree_leaves(c)[0].shape[0]
            for j in range(k):
                flat.append(jax.tree_util.tree_map(lambda a: a[j], c))
        for want, got in zip(bs, flat):
            _leaves_equal(want, got)

    def test_chain_one_passes_through(self):
        bs = _batches(3)
        assert list(chain_batches(iter(bs), 1)) == bs


class TestChainedGraphMet:
    def test_bit_identical_to_sequential(self):
        cfg = Config(data=DataConfig(batch_size=4, node_buckets=(64,)))
        bs = _batches(7, seed=3)

        step = make_train_step(cfg)
        st_seq = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
        seq_losses = []
        for b in bs:
            st_seq, l = step(st_seq, b)
            seq_losses.append(float(l))

        chained = make_chained_train_step(cfg)
        st_ch = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
        ch_losses = []
        for stacked in chain_batches(iter(bs), 3):   # chains of 3, 3, 1
            st_ch, ls = chained(st_ch, stacked)
            ch_losses.extend(np.asarray(ls).tolist())

        np.testing.assert_array_equal(np.asarray(seq_losses),
                                      np.asarray(ch_losses))
        _leaves_equal(st_seq.params, st_ch.params)
        _leaves_equal(st_seq.bn_state, st_ch.bn_state)
        _leaves_equal(st_seq.opt_state, st_ch.opt_state)


class TestChainedDrn:
    def test_bit_identical_to_sequential(self):
        cfg = Config(data=DataConfig(batch_size=4, node_buckets=(64,)),
                     drn=DRNConfig(hidden_dim=16, k=4, head="cartesian",
                                   output_scale=50.0))
        bs = _batches(5, seed=5)

        step = make_drn_train_step(cfg)
        st_seq = init_train_state(*drn_init(jax.random.PRNGKey(1), cfg.drn),
                                  cfg)
        seq_losses = []
        for b in bs:
            st_seq, l = step(st_seq, b)
            seq_losses.append(float(l))

        chained = make_chained_train_step(cfg, model="drn")
        st_ch = init_train_state(*drn_init(jax.random.PRNGKey(1), cfg.drn),
                                 cfg)
        ch_losses = []
        for stacked in chain_batches(iter(bs), 2):
            st_ch, ls = chained(st_ch, stacked)
            ch_losses.extend(np.asarray(ls).tolist())

        np.testing.assert_array_equal(np.asarray(seq_losses),
                                      np.asarray(ch_losses))
        _leaves_equal(st_seq.params, st_ch.params)


class TestChainedDataParallel:
    def test_matches_sequential_dp(self):
        from deepmetv2_tpu.parallel.dp import make_dp_train_step
        from deepmetv2_tpu.parallel.mesh import make_mesh, shard_batch
        from deepmetv2_tpu.train.chain import prepend_chain_axis
        from deepmetv2_tpu.parallel.mesh import batch_sharding

        cfg = Config(data=DataConfig(batch_size=8, node_buckets=(64,)))
        bs = _batches(4, seed=7, bs=8)
        mesh = make_mesh(n_data=4, n_node=1)

        step = make_dp_train_step(cfg, mesh)
        st_seq = init_train_state(*graph_met_init(jax.random.PRNGKey(2)), cfg)
        seq_losses = []
        with mesh:
            for b in bs:
                st_seq, l = step(st_seq, shard_batch(b, mesh))
                seq_losses.append(float(l))

        chained = make_chained_train_step(cfg, mesh=mesh)
        chain_sh = prepend_chain_axis(batch_sharding(mesh))
        st_ch = init_train_state(*graph_met_init(jax.random.PRNGKey(2)), cfg)
        ch_losses = []
        with mesh:
            for stacked in chain_batches(iter(bs), 2):
                placed = jax.tree_util.tree_map(jax.device_put, stacked,
                                                chain_sh)
                st_ch, ls = chained(st_ch, placed)
                ch_losses.extend(np.asarray(ls).tolist())

        np.testing.assert_allclose(np.asarray(seq_losses),
                                   np.asarray(ch_losses), rtol=1e-6)
        for x, y in zip(jax.tree_util.tree_leaves(st_seq.params),
                        jax.tree_util.tree_leaves(st_ch.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)


class TestChainedEdgePartitioned:
    def test_matches_sequential_ep(self):
        """Chained edge-partitioned steps (node axis sharded, halo
        exchange inside the scanned core) must reproduce the sequential
        EP dispatch — the configuration r4 left per-step (weak #6)."""
        from deepmetv2_tpu.config import GraphConfig
        from deepmetv2_tpu.parallel.ep import make_ep_train_step
        from deepmetv2_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                 shard_batch)
        from deepmetv2_tpu.train.chain import prepend_chain_axis

        cfg = Config(graph=GraphConfig(mode="window", window_halo=64),
                     data=DataConfig(batch_size=4, node_buckets=(128,)))
        bs = _batches(4, seed=17, n_max=128, bs=4)
        mesh = make_mesh(n_data=2, n_node=2)

        step = make_ep_train_step(cfg, mesh, interpret=True)
        st_seq = init_train_state(*graph_met_init(jax.random.PRNGKey(4)),
                                  cfg)
        seq_losses = []
        with mesh:
            for b in bs:
                st_seq, l = step(st_seq,
                                 shard_batch(b, mesh, shard_nodes=True))
                seq_losses.append(float(l))

        chained = make_chained_train_step(cfg, mesh=mesh, shard_nodes=True,
                                          interpret=True)
        chain_sh = prepend_chain_axis(batch_sharding(mesh,
                                                     shard_nodes=True))
        st_ch = init_train_state(*graph_met_init(jax.random.PRNGKey(4)),
                                 cfg)
        ch_losses = []
        with mesh:
            for stacked in chain_batches(iter(bs), 2):
                placed = jax.tree_util.tree_map(jax.device_put, stacked,
                                                chain_sh)
                st_ch, ls = chained(st_ch, placed)
                ch_losses.extend(np.asarray(ls).tolist())

        np.testing.assert_allclose(np.asarray(seq_losses),
                                   np.asarray(ch_losses), rtol=1e-6)
        for x, y in zip(jax.tree_util.tree_leaves(st_seq.params),
                        jax.tree_util.tree_leaves(st_ch.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)


class TestChainedDrnEdgePartitioned:
    def test_matches_sequential_drn_ep(self):
        """Chained node-sharded DRN steps (distributed graph build inside
        the scanned core) must reproduce the sequential dispatch."""
        from deepmetv2_tpu.parallel.dyn import make_drn_ep_train_step
        from deepmetv2_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                 shard_batch)
        from deepmetv2_tpu.train.chain import prepend_chain_axis

        cfg = Config(data=DataConfig(batch_size=4, node_buckets=(64,)),
                     drn=DRNConfig(hidden_dim=16, k=4, head="cartesian",
                                   output_scale=50.0))
        bs = _batches(4, seed=23)
        mesh = make_mesh(n_data=2, n_node=2)

        step = make_drn_ep_train_step(cfg, mesh)
        st_seq = init_train_state(*drn_init(jax.random.PRNGKey(6), cfg.drn),
                                  cfg)
        seq_losses = []
        with mesh:
            for b in bs:
                st_seq, l = step(st_seq,
                                 shard_batch(b, mesh, shard_nodes=True))
                seq_losses.append(float(l))

        chained = make_chained_train_step(cfg, model="drn", mesh=mesh,
                                          shard_nodes=True)
        chain_sh = prepend_chain_axis(batch_sharding(mesh,
                                                     shard_nodes=True))
        st_ch = init_train_state(*drn_init(jax.random.PRNGKey(6), cfg.drn),
                                 cfg)
        ch_losses = []
        with mesh:
            for stacked in chain_batches(iter(bs), 2):
                placed = jax.tree_util.tree_map(jax.device_put, stacked,
                                                chain_sh)
                st_ch, ls = chained(st_ch, placed)
                ch_losses.extend(np.asarray(ls).tolist())

        np.testing.assert_allclose(np.asarray(seq_losses),
                                   np.asarray(ch_losses), rtol=1e-6)
        for x, y in zip(jax.tree_util.tree_leaves(st_seq.params),
                        jax.tree_util.tree_leaves(st_ch.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)


class TestChainedFit:
    def test_fit_uses_chained_path(self, tmp_path):
        """End-to-end: fit() with chain_steps > 1 must produce the SAME
        loss.log as chain_steps = 1."""
        from deepmetv2_tpu.train.loop import fit

        events = synthetic_events(40, seed=13, n_min=8, n_max=63)
        cfg = Config(data=DataConfig(batch_size=4, node_buckets=(64,)),
                     train=TrainConfig(epochs=2, chain_steps=3))
        loaders = fetch_dataloader(events=events, batch_size=4,
                                   validation_split=0.2, buckets=(64,))
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(3)), cfg)
        fit(st, cfg, loaders["train"], loaders["test"],
            str(tmp_path / "ch"), verbose=False)

        cfg1 = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, chain_steps=1))
        st = init_train_state(*graph_met_init(jax.random.PRNGKey(3)), cfg1)
        fit(st, cfg1, loaders["train"], loaders["test"],
            str(tmp_path / "seq"), verbose=False)

        log_ch = (tmp_path / "ch" / "loss.log").read_text().splitlines()[2:]
        log_seq = (tmp_path / "seq" / "loss.log").read_text().splitlines()[2:]
        assert log_ch == log_seq and len(log_ch) == 2
