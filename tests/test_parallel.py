"""Distribution-layer tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepmetv2_tpu.config import Config, GraphConfig, DataConfig
from deepmetv2_tpu.data import collate, synthetic_events
from deepmetv2_tpu.models import graph_met_init
from deepmetv2_tpu.parallel.dp import make_dp_train_step
from deepmetv2_tpu.parallel.mesh import make_mesh, shard_batch
from deepmetv2_tpu.train.step import init_train_state, make_train_step


def _cfg():
    return Config(graph=GraphConfig(max_neighbors=16),
                  data=DataConfig(node_buckets=(128,)))


def _batch(n_events):
    events = synthetic_events(n_events, seed=0, n_min=20, n_max=100)
    return collate(events, buckets=(128,), pad_events_to=n_events)


class TestMesh:
    def test_make_mesh_shapes(self):
        assert make_mesh(n_data=8).shape == {"data": 8, "node": 1}
        assert make_mesh(n_data=4, n_node=2).shape == {"data": 4, "node": 2}
        assert make_mesh(n_node=2).shape == {"data": 4, "node": 2}


class TestDataParallel:
    def test_dp_matches_single_device(self):
        """One DP step on 8 devices must equal the single-device step."""
        cfg = _cfg()
        batch = _batch(8)
        params, bn_state = graph_met_init(jax.random.PRNGKey(0))
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

        # both steps donate their input state, so each needs its own buffers
        s_single = init_train_state(copy(params), copy(bn_state), cfg)
        single_step = make_train_step(cfg)
        s1, loss1 = single_step(s_single, batch)

        mesh = make_mesh(n_data=8)
        s_dp = init_train_state(copy(params), copy(bn_state), cfg)
        with mesh:
            sharded = shard_batch(batch, mesh)
            dp_step = make_dp_train_step(cfg, mesh)
            s2, loss2 = dp_step(s_dp, sharded)

        assert np.isclose(float(loss1), float(loss2), rtol=1e-5)
        # BatchNorm running stats match tightly: global-batch statistics are
        # linear reductions, insensitive to cross-device summation order.
        for a, b in zip(jax.tree_util.tree_leaves(s1.bn_state),
                        jax.tree_util.tree_leaves(s2.bn_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        # Params after ONE Adam step are ill-conditioned w.r.t. float
        # reduction order (update ~ g/sqrt(g^2) amplifies 1e-7 differences
        # for near-zero grads), so compare with an absolute tolerance of a
        # fraction of the lr (1e-3).
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)

    def test_node_sharded_step_runs(self):
        """data x node mesh: full step compiles + executes with the padded
        node axis sharded."""
        cfg = _cfg()
        batch = _batch(4)
        params, bn_state = graph_met_init(jax.random.PRNGKey(1))
        mesh = make_mesh(n_data=4, n_node=2)
        state = init_train_state(params, bn_state, cfg)
        with mesh:
            sharded = shard_batch(batch, mesh, shard_nodes=True)
            step = make_dp_train_step(cfg, mesh, shard_nodes=True)
            state, loss = step(state, sharded)
        assert np.isfinite(float(loss))


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (4, 512)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestFitWithMesh:
    """fit() drives multi-chip training directly (cli --mesh): dp and
    edge-partitioned configurations on the virtual 8-device mesh."""

    def test_fit_dp_mesh(self, tmp_path):
        import dataclasses
        import os.path as osp

        from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
        from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
        from deepmetv2_tpu.models import graph_met_init
        from deepmetv2_tpu.parallel.mesh import make_mesh
        from deepmetv2_tpu.train.loop import fit
        from deepmetv2_tpu.train.step import init_train_state

        events = synthetic_events(16, seed=3, n_min=20, n_max=100)
        loaders = fetch_dataloader(events=events, batch_size=4,
                                   validation_split=0.25, buckets=(128,))
        cfg = Config(graph=GraphConfig(max_neighbors=32),
                     data=DataConfig(batch_size=4, node_buckets=(128,)))
        mesh = make_mesh(n_data=4, n_node=1)
        state = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
        fit(state, cfg, loaders["train"], loaders["test"], str(tmp_path),
            epochs=1, verbose=False, mesh=mesh)
        assert osp.exists(osp.join(str(tmp_path), "last.ckpt"))

    def test_fit_ep_mesh(self, tmp_path):
        import os.path as osp

        from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
        from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
        from deepmetv2_tpu.models import graph_met_init
        from deepmetv2_tpu.parallel.mesh import make_mesh
        from deepmetv2_tpu.train.loop import fit
        from deepmetv2_tpu.train.step import init_train_state

        events = synthetic_events(8, seed=4, n_min=150, n_max=255)
        loaders = fetch_dataloader(events=events, batch_size=2,
                                   validation_split=0.25, buckets=(256,))
        cfg = Config(graph=GraphConfig(mode="window", window_halo=64),
                     data=DataConfig(batch_size=2, node_buckets=(256,)))
        mesh = make_mesh(n_data=2, n_node=2)
        state = init_train_state(*graph_met_init(jax.random.PRNGKey(1)), cfg)
        fit(state, cfg, loaders["train"], loaders["test"], str(tmp_path),
            epochs=1, verbose=False, mesh=mesh, shard_nodes=True)
        assert osp.exists(osp.join(str(tmp_path), "last.ckpt"))


class TestShardedKNN:
    """Distributed dynamic-kNN: node-sharded exact top-k equals the
    single-device feature-space build (SURVEY §5 distributed top-k)."""

    def test_matches_single_device(self):
        import numpy as np
        import jax.numpy as jnp

        from deepmetv2_tpu.ops.graph import knn_graph
        from deepmetv2_tpu.parallel.knn import knn_graph_sharded
        from deepmetv2_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(0)
        B, N, D, k = 4, 64, 8, 5
        x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        mask = jnp.asarray(rng.random((B, N)) < 0.9)

        ref = knn_graph(x, mask, k=k)
        mesh = make_mesh(n_data=2, n_node=4)
        with mesh:
            got = jax.jit(
                lambda x, m: knn_graph_sharded(x, m, k=k, mesh=mesh)
            )(x, mask)

        np.testing.assert_array_equal(np.asarray(ref.mask),
                                      np.asarray(got.mask))
        # neighbor SETS must match; within-row order may differ on
        # near-ties because the two builds round distances differently
        ri = np.where(np.asarray(ref.mask), np.asarray(ref.idx), 1 << 20)
        gi = np.where(np.asarray(got.mask), np.asarray(got.idx), 1 << 20)
        np.testing.assert_array_equal(np.sort(ri, axis=-1),
                                      np.sort(gi, axis=-1))


class TestDRNDataParallel:
    def test_drn_dp_step_matches_single_device(self):
        import numpy as np

        from deepmetv2_tpu.config import Config, DataConfig
        from deepmetv2_tpu.data import collate, synthetic_events
        from deepmetv2_tpu.models.drn import drn_init
        from deepmetv2_tpu.parallel.dp import make_drn_dp_train_step
        from deepmetv2_tpu.parallel.mesh import make_mesh, shard_batch
        from deepmetv2_tpu.train.step import (init_train_state,
                                              make_drn_train_step)

        events = synthetic_events(8, seed=5, n_min=20, n_max=60)
        batch = collate(events, buckets=(64,), pad_events_to=8)
        cfg = Config(data=DataConfig(batch_size=8, node_buckets=(64,)))

        state1 = init_train_state(*drn_init(jax.random.PRNGKey(2)), cfg)
        _, loss1 = make_drn_train_step(cfg)(state1, batch)

        mesh = make_mesh(n_data=4, n_node=1)
        state2 = init_train_state(*drn_init(jax.random.PRNGKey(2)), cfg)
        with mesh:
            sb = shard_batch(batch, mesh)
            _, loss2 = make_drn_dp_train_step(cfg, mesh)(state2, sb)

        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


class TestDataParallelEval:
    def test_dp_eval_matches_single_device(self):
        """Sharded per-epoch eval (fit with a mesh, reference train.py:118)
        must reproduce single-device weights and loss exactly."""
        from deepmetv2_tpu.parallel.dp import make_dp_eval_step
        from deepmetv2_tpu.train.step import make_eval_step

        cfg = _cfg()
        batch = _batch(8)
        params, bn_state = graph_met_init(jax.random.PRNGKey(3))

        w1, loss1, _ = make_eval_step(cfg)(params, bn_state, batch)
        mesh = make_mesh(n_data=8)
        with mesh:
            w2, loss2, _ = make_dp_eval_step(cfg, mesh)(
                params, bn_state, shard_batch(batch, mesh))

        assert np.isclose(float(loss1), float(loss2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                   rtol=1e-5, atol=1e-6)

    def test_fit_dp_mesh_eval_metrics_match(self, tmp_path):
        """fit(mesh=...) end-to-end: the sharded eval path produces the
        same validation loss as a single-device evaluate() on the same
        params."""
        from deepmetv2_tpu.data import fetch_dataloader
        from deepmetv2_tpu.train.loop import evaluate, fit
        from deepmetv2_tpu.train.step import make_eval_step

        events = synthetic_events(16, seed=7, n_min=20, n_max=100)
        loaders = fetch_dataloader(events=events, batch_size=4,
                                   validation_split=0.25, buckets=(128,))
        cfg = Config(graph=GraphConfig(max_neighbors=32),
                     data=DataConfig(batch_size=4, node_buckets=(128,)))
        mesh = make_mesh(n_data=4, n_node=1)
        state = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
        state = fit(state, cfg, loaders["train"], loaders["test"],
                    str(tmp_path), epochs=1, verbose=False, mesh=mesh)
        import json
        import os.path as osp
        with open(osp.join(str(tmp_path), "metrics_val_last.json")) as f:
            sharded_loss = json.load(f)["loss"]
        single, _ = evaluate(state.params, state.bn_state,
                             make_eval_step(cfg), loaders["test"], cfg,
                             verbose=False)
        assert np.isclose(sharded_loss, single["loss"], rtol=1e-5)


class TestShardedDynamicEdgeConv:
    """Edge-partitioned DynamicEdgeConv (parallel/dyn.py): the FULL
    node-sharded DRN forward — distributed top-k per round + all-gather
    neighbor fetch — must match the single-device forward."""

    def test_drn_forward_matches_single_device(self):
        from deepmetv2_tpu.config import DRNConfig
        from deepmetv2_tpu.models.drn import drn_init, drn_net_apply
        from deepmetv2_tpu.parallel.dyn import drn_net_apply_sharded
        from deepmetv2_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

        events = synthetic_events(4, seed=11, n_min=40, n_max=63)
        batch = collate(events, buckets=(64,), pad_events_to=4)
        dcfg = DRNConfig(hidden_dim=16, k=4)
        params, state = drn_init(jax.random.PRNGKey(4), dcfg)

        want, _ = drn_net_apply(params, state, batch, train=False, cfg=dcfg)

        mesh = make_mesh(n_data=2, n_node=4)
        rep = replicate(mesh)
        bsh = batch_sharding(mesh, shard_nodes=True)
        with mesh:
            sb = jax.tree_util.tree_map(jax.device_put, batch, bsh)
            got, _ = jax.jit(
                lambda p, s, b: drn_net_apply_sharded(p, s, b, False, dcfg,
                                                      mesh),
                in_shardings=(rep, rep, bsh),
            )(params, state, sb)

        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_drn_ep_train_step_runs(self):
        from deepmetv2_tpu.config import Config, DataConfig, DRNConfig
        from deepmetv2_tpu.models.drn import drn_init
        from deepmetv2_tpu.parallel.dyn import make_drn_ep_train_step
        from deepmetv2_tpu.parallel.mesh import make_mesh, shard_batch
        from deepmetv2_tpu.train.step import init_train_state

        events = synthetic_events(4, seed=12, n_min=40, n_max=63)
        batch = collate(events, buckets=(64,), pad_events_to=4)
        cfg = Config(drn=DRNConfig(hidden_dim=16, k=4),
                     data=DataConfig(batch_size=4, node_buckets=(64,)))
        mesh = make_mesh(n_data=2, n_node=4)
        state = init_train_state(*drn_init(jax.random.PRNGKey(5), cfg.drn),
                                 cfg)
        with mesh:
            sb = shard_batch(batch, mesh, shard_nodes=True)
            state, loss = make_drn_ep_train_step(cfg, mesh)(state, sb)
        assert np.isfinite(float(loss))


class TestFitDRNMesh:
    def test_fit_drn_dp_mesh(self, tmp_path):
        """fit() trains + evaluates the DRN family over a dp mesh."""
        import os.path as osp

        from deepmetv2_tpu.config import Config, DataConfig, DRNConfig
        from deepmetv2_tpu.data import fetch_dataloader
        from deepmetv2_tpu.models.drn import drn_init
        from deepmetv2_tpu.train.loop import fit
        from deepmetv2_tpu.train.step import init_train_state

        events = synthetic_events(16, seed=8, n_min=20, n_max=60)
        loaders = fetch_dataloader(events=events, batch_size=4,
                                   validation_split=0.25, buckets=(64,))
        cfg = Config(drn=DRNConfig(hidden_dim=16, k=4, head="cartesian",
                                   output_scale=100.0),
                     data=DataConfig(batch_size=4, node_buckets=(64,)))
        mesh = make_mesh(n_data=4, n_node=1)
        state = init_train_state(*drn_init(jax.random.PRNGKey(6), cfg.drn),
                                 cfg)
        fit(state, cfg, loaders["train"], loaders["test"], str(tmp_path),
            epochs=1, verbose=False, model="drn", mesh=mesh)
        assert osp.exists(osp.join(str(tmp_path), "last.ckpt"))


class TestRingKNN:
    """Ring-pipelined distributed kNN: exact vs the single-device build,
    O(n_loc) memory — the scaling path for events larger than one chip."""

    def test_matches_single_device(self):
        from deepmetv2_tpu.ops.graph import knn_graph
        from deepmetv2_tpu.parallel.knn import knn_graph_sharded_ring
        from deepmetv2_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(2)
        B, N, D, k = 4, 64, 8, 5
        x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        mask = jnp.asarray(rng.random((B, N)) < 0.9)

        ref = knn_graph(x, mask, k=k)
        mesh = make_mesh(n_data=2, n_node=4)
        with mesh:
            got = jax.jit(
                lambda x, m: knn_graph_sharded_ring(x, m, k=k, mesh=mesh)
            )(x, mask)

        np.testing.assert_array_equal(np.asarray(ref.mask),
                                      np.asarray(got.mask))
        ri = np.where(np.asarray(ref.mask), np.asarray(ref.idx), 1 << 20)
        gi = np.where(np.asarray(got.mask), np.asarray(got.idx), 1 << 20)
        np.testing.assert_array_equal(np.sort(ri, axis=-1),
                                      np.sort(gi, axis=-1))

    def test_loop_true_includes_self(self):
        from deepmetv2_tpu.parallel.knn import knn_graph_sharded_ring
        from deepmetv2_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 32, 4)).astype(np.float32))
        mask = jnp.ones((2, 32), bool)
        mesh = make_mesh(n_data=2, n_node=4)
        with mesh:
            got = jax.jit(lambda x, m: knn_graph_sharded_ring(
                x, m, k=3, mesh=mesh, loop=True))(x, mask)
        # self-distance is 0 -> self must be among the 3 nearest
        idx = np.asarray(got.idx)
        for b in range(2):
            for i in range(32):
                assert i in idx[b, i]


class TestShardedEvalRemainder:
    def test_odd_batch_pads_and_matches_single_device(self):
        """A batch whose size does not divide the data axis must still run
        sharded (padded with empty events) and reproduce the single-device
        loss and weights exactly."""
        from deepmetv2_tpu.train.loop import make_sharded_eval
        from deepmetv2_tpu.train.step import make_eval_step

        cfg = _cfg()
        batch = _batch(6)              # 6 events on a 4-wide data axis
        params, bn_state = graph_met_init(jax.random.PRNGKey(5))

        w1, loss1, _ = make_eval_step(cfg)(params, bn_state, batch)
        mesh = make_mesh(n_data=4, n_node=1)
        eval_step, eval_place = make_sharded_eval(cfg, mesh)
        w2, loss2, _ = eval_step(params, bn_state, batch)

        assert w2.shape[0] == 8        # padded to the data-axis multiple
        assert np.isclose(float(loss1), float(loss2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2)[:6],
                                   rtol=1e-5, atol=1e-6)
        # the placement path pads identically and shards over the mesh
        placed = eval_place(batch)
        assert placed.batch_size == 8
        assert int(np.sum(np.asarray(placed.num_valid)[6:])) == 0

    def test_pad_batch_events_semantics(self):
        from deepmetv2_tpu.data.batching import pad_batch_events

        b = _batch(3)
        p = pad_batch_events(b, 8)
        assert p.batch_size == 8
        np.testing.assert_array_equal(np.asarray(p.x_cont[:3]),
                                      np.asarray(b.x_cont))
        assert not np.any(np.asarray(p.mask[3:]))
        assert np.all(np.asarray(p.num_valid[3:]) == 0)
        # no-op when already large enough
        assert pad_batch_events(b, 3) is b


class TestBackendDispatch:
    def test_xla_path_on_non_tpu(self, monkeypatch):
        """The Mosaic window kernel is TPU-only: any other backend (CPU
        here, GPU hypothetically) must route to the XLA formulation."""
        from deepmetv2_tpu.ops import edgeconv as ec

        assert ec._on_tpu() is False          # conftest pins CPU
        monkeypatch.setattr(jax, "default_backend", lambda: "gpu")
        assert ec._on_tpu() is False
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert ec._on_tpu() is True
