"""Halo-exchange edge-partitioned EdgeConv tests (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepmetv2_tpu.data import collate, synthetic_events
from deepmetv2_tpu.data.sorting import required_halo, sort_by_eta
from deepmetv2_tpu.ops.window import WindowGraph, window_edgeconv_linear
from deepmetv2_tpu.parallel.halo import (
    window_edgeconv_linear_sharded,
    window_max_sharded,
)
from deepmetv2_tpu.parallel.mesh import make_mesh


def _setup(n_events=2, cap=512, seed=0):
    events = synthetic_events(n_events, seed=seed, n_min=cap - 128,
                              n_max=cap - 1)
    batch = collate(events, buckets=(cap,))
    batch, _ = sort_by_eta(batch)
    phi = jnp.arctan2(batch.x_cont[..., 1], batch.x_cont[..., 0])
    etaphi = jnp.stack([batch.x_cont[..., 3], phi], axis=-1)
    return batch, etaphi


class TestHaloSharded:
    @pytest.mark.parametrize("n_node", [2, 4])
    def test_matches_single_device(self, n_node):
        rng = np.random.default_rng(0)
        batch, etaphi = _setup()
        H = 8
        x = jnp.asarray(rng.normal(
            size=(batch.batch_size, batch.max_nodes, H)).astype(np.float32))
        x = jnp.where(batch.mask[..., None], x, 0.0)
        w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
        halo = required_halo(batch, 0.4)
        g = WindowGraph(etaphi, batch.mask, r=0.4, halo=halo)

        want = window_edgeconv_linear(x, g, w, b, reduction="max", tile=64)

        mesh = make_mesh(n_data=2, n_node=n_node)
        with mesh:
            got = jax.jit(lambda x: window_edgeconv_linear_sharded(
                x, g, w, b, mesh=mesh, interpret=True))(x)
        np.testing.assert_allclose(
            np.asarray(got)[np.asarray(batch.mask)],
            np.asarray(want)[np.asarray(batch.mask)],
            rtol=1e-5, atol=1e-5)

    def test_grad_matches_single_device(self):
        rng = np.random.default_rng(1)
        batch, etaphi = _setup(seed=1)
        H = 4
        x = jnp.asarray(rng.normal(
            size=(batch.batch_size, batch.max_nodes, H)).astype(np.float32))
        x = jnp.where(batch.mask[..., None], x, 0.0)
        w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
        b = jnp.zeros((H,), jnp.float32)
        halo = required_halo(batch, 0.4)
        g = WindowGraph(etaphi, batch.mask, r=0.4, halo=halo)
        mask3 = batch.mask[..., None]
        mesh = make_mesh(n_data=2, n_node=4)

        def f_single(x, w):
            out = window_edgeconv_linear(x, g, w, b, reduction="max", tile=64)
            return jnp.sum(jnp.where(mask3, out, 0.0) ** 2)

        def f_shard(x, w):
            out = window_edgeconv_linear_sharded(x, g, w, b, mesh=mesh,
                                                 interpret=True)
            return jnp.sum(jnp.where(mask3, out, 0.0) ** 2)

        g1 = jax.grad(f_single, argnums=(0, 1))(x, w)
        with mesh:
            g2 = jax.jit(jax.grad(f_shard, argnums=(0, 1)))(x, w)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("overlap", [True, False])
    def test_overlap_schedule_matches_single_device(self, overlap):
        """The split (interior ‖ exchange, then boundary strips) schedule
        must be numerically identical to exchange-then-compute and to the
        single-device window max."""
        from deepmetv2_tpu.ops.window import window_max_xla

        rng = np.random.default_rng(3)
        B, N, H, halo = 2, 512, 4, 64           # n_loc=256 >= 2*halo
        eta = np.sort(rng.uniform(-4, 4, (B, N)).astype(np.float32), axis=1)
        phi = rng.uniform(-np.pi, np.pi, (B, N)).astype(np.float32)
        pos = jnp.asarray(np.stack([eta, phi], -1))
        c = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        mesh = make_mesh(n_data=1, n_node=2)
        with mesh:
            m = jax.jit(lambda c: window_max_sharded(
                c, pos, r2=0.16, halo=halo, mesh=mesh, data_axis=None,
                interpret=True, overlap=overlap))(c)
        want = window_max_xla(c, pos, jnp.ones((B, N), bool), 0.16, halo)
        np.testing.assert_allclose(np.asarray(m), np.asarray(want), rtol=1e-6)

    def test_overlap_grad_matches_serial(self):
        rng = np.random.default_rng(4)
        B, N, H, halo = 1, 512, 4, 64
        eta = np.sort(rng.uniform(-4, 4, (B, N)).astype(np.float32), axis=1)
        pos = jnp.asarray(np.stack([eta, np.zeros_like(eta)], -1))
        c = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        mesh = make_mesh(n_data=1, n_node=4)

        def loss(c, ov):
            m = window_max_sharded(c, pos, r2=0.16, halo=halo, mesh=mesh,
                                   data_axis=None, interpret=True, overlap=ov)
            return jnp.sum(jnp.where(jnp.isfinite(m), m, 0.0) ** 2)

        with mesh:
            g_ov = jax.jit(jax.grad(lambda c: loss(c, True)))(c)
            g_ser = jax.jit(jax.grad(lambda c: loss(c, False)))(c)
        np.testing.assert_allclose(np.asarray(g_ov), np.asarray(g_ser),
                                   rtol=1e-5, atol=1e-6)

    def test_overlap_interior_independent_of_collectives(self):
        """The load-bearing property of the split schedule: the interior
        window aggregation must have NO data dependency on the ppermute
        results, so XLA's async-collective scheduler is free to overlap the
        exchange with it (VERDICT r2 #2).  Verified on the jaxpr dependency
        graph: the middle operand of the output stitch (the interior rows)
        must not transitively depend on any ppermute output."""
        rng = np.random.default_rng(5)
        B, N, H, halo = 1, 512, 4, 64
        eta = np.sort(rng.uniform(-4, 4, (B, N)).astype(np.float32), axis=1)
        pos = jnp.asarray(np.stack([eta, np.zeros_like(eta)], -1))
        c = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        mesh = make_mesh(n_data=1, n_node=2)
        with mesh:
            jaxpr = jax.make_jaxpr(lambda c: window_max_sharded(
                c, pos, r2=0.16, halo=halo, mesh=mesh, data_axis=None,
                interpret=True, overlap=True))(c)

        def find_inner(jx):
            """The shard_map body jaxpr (the one containing ppermute)."""
            for eqn in jx.eqns:
                for v in eqn.params.values():
                    sub = getattr(v, "jaxpr", v)
                    if hasattr(sub, "eqns"):
                        if any(e.primitive.name == "ppermute"
                               for e in sub.eqns):
                            return sub
                        deeper = find_inner(sub)
                        if deeper is not None:
                            return deeper
            return None

        inner = find_inner(jaxpr.jaxpr)
        assert inner is not None, "no ppermute found in the traced program"
        producers = {v: e for e in inner.eqns for v in e.outvars}
        perm_vars = {v for e in inner.eqns if e.primitive.name == "ppermute"
                     for v in e.outvars}

        def ancestors(var):
            from jax._src.core import Literal

            seen, stack = set(), [var]
            while stack:
                v = stack.pop()
                if isinstance(v, Literal):
                    continue
                e = producers.get(v)
                if e is None or id(e) in seen:
                    continue
                seen.add(id(e))
                yield e
                stack.extend(iv for iv in e.invars
                             if not isinstance(iv, Literal))
            return

        stitch = producers[inner.outvars[0]]
        assert stitch.primitive.name == "concatenate" and len(stitch.invars) == 3
        interior_deps = {v for e in ancestors(stitch.invars[1])
                         for v in e.outvars}
        assert not (interior_deps & perm_vars), (
            "interior compute depends on a ppermute result — the overlap "
            "schedule has been serialized")
        # sanity: the boundary strips DO consume the exchange
        strip_deps = {v for e in ancestors(stitch.invars[0])
                      for v in e.outvars}
        assert strip_deps & perm_vars

    def test_boundary_shards_masked(self):
        """Nodes near the global start/end must not see phantom neighbors
        from the ring wrap (ppermute fill)."""
        # all nodes at identical positions -> everyone within radius of
        # everyone inside its window; shard boundaries must reproduce the
        # single-device result exactly (ring ends see NO phantom data)
        from deepmetv2_tpu.ops.window import window_max_xla

        B, N, H, halo = 1, 256, 4, 128
        c = jnp.asarray(np.random.default_rng(2).normal(
            size=(B, N, H)).astype(np.float32))
        pos = jnp.zeros((B, N, 2), jnp.float32)
        mesh = make_mesh(n_data=1, n_node=2)   # n_loc = 128 = halo
        with mesh:
            m = jax.jit(lambda c: window_max_sharded(
                c, pos, r2=0.16, halo=halo, mesh=mesh, data_axis=None,
                interpret=True))(c)
        want = window_max_xla(c, pos, jnp.ones((B, N), bool), 0.16, halo)
        np.testing.assert_allclose(np.asarray(m), np.asarray(want), rtol=1e-6)


class TestEdgePartitionedStep:
    def test_cell_order_ep_matches_single_device(self):
        """The fast (cell-sorted) layout composes with edge partitioning
        (VERDICT r2 #4): the ±halo exchange is row-order-agnostic given
        halo >= the order's in-radius span, so the cell order just needs
        its own (wider) span as the halo.  Exactness vs the single-device
        presorted window step."""
        from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
        from deepmetv2_tpu.data import collate, synthetic_events
        from deepmetv2_tpu.data.sorting import (cell_sort_batch,
                                                required_span_batch)
        from deepmetv2_tpu.models import graph_met_init
        from deepmetv2_tpu.parallel.ep import make_ep_train_step
        from deepmetv2_tpu.parallel.mesh import make_mesh, shard_batch
        from deepmetv2_tpu.train.step import init_train_state, make_train_step

        events = synthetic_events(4, seed=9, n_min=896, n_max=1023)
        batch = cell_sort_batch(collate(events, buckets=(1024,)), r=0.4)
        halo = max(64, -(-required_span_batch(batch, 0.4) // 64) * 64)
        n_node = 2
        assert 1024 // n_node >= halo, "shard must cover the cell span"
        cfg = Config(graph=GraphConfig(mode="window", window_halo=halo,
                                       presorted=True),
                     data=DataConfig(node_buckets=(1024,)))
        params, bn_state = graph_met_init(jax.random.PRNGKey(9))
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

        s1 = init_train_state(copy(params), copy(bn_state), cfg)
        s1, loss1 = make_train_step(cfg)(s1, batch)

        mesh = make_mesh(n_data=2, n_node=n_node)
        s2 = init_train_state(copy(params), copy(bn_state), cfg)
        with mesh:
            sharded = shard_batch(batch, mesh, shard_nodes=True)
            ep = make_ep_train_step(cfg, mesh, interpret=True)
            s2, loss2 = ep(s2, sharded)

        assert np.isclose(float(loss1), float(loss2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)

    def test_matches_single_device_window_step(self):
        from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
        from deepmetv2_tpu.models import graph_met_init
        from deepmetv2_tpu.parallel.ep import make_ep_train_step
        from deepmetv2_tpu.parallel.mesh import make_mesh, shard_batch
        from deepmetv2_tpu.train.step import init_train_state, make_train_step

        cfg = Config(graph=GraphConfig(mode="window", window_halo=128),
                     data=DataConfig(node_buckets=(1024,)))
        batch, _ = _setup(n_events=4, cap=1024, seed=7)
        params, bn_state = graph_met_init(jax.random.PRNGKey(7))
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

        s1 = init_train_state(copy(params), copy(bn_state), cfg)
        single = make_train_step(cfg)
        s1, loss1 = single(s1, batch)

        mesh = make_mesh(n_data=2, n_node=4)
        s2 = init_train_state(copy(params), copy(bn_state), cfg)
        with mesh:
            sharded = shard_batch(batch, mesh, shard_nodes=True)
            ep = make_ep_train_step(cfg, mesh, interpret=True)
            s2, loss2 = ep(s2, sharded)

        assert np.isclose(float(loss1), float(loss2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s1.bn_state),
                        jax.tree_util.tree_leaves(s2.bn_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
