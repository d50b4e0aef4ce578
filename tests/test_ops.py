"""Unit tests: graph construction, segment ops, EdgeConv vs numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepmetv2_tpu.data.batching import Neighborhood
from deepmetv2_tpu.ops import (
    edgeconv_linear,
    edgeconv_mlp,
    knn_graph,
    masked_max,
    masked_mean,
    masked_sum,
    neighbor_reduce,
    radius_graph,
    to_undirected,
)

from tests import oracles


def _rand_event(rng, n, d=2):
    return rng.normal(size=(n, d)).astype(np.float32)


def _nbr_sets(nbr: Neighborhood, b: int):
    """Neighbor lists as python sets per node."""
    idx = np.asarray(nbr.idx[b])
    mask = np.asarray(nbr.mask[b])
    return [set(idx[i][mask[i]].tolist()) for i in range(idx.shape[0])]


class TestRadiusGraph:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        n, pad = 37, 64
        pos = np.zeros((2, pad, 2), np.float32)
        mask = np.zeros((2, pad), bool)
        events = []
        for b in range(2):
            ev = _rand_event(rng, n) * 1.5
            events.append(ev)
            pos[b, :n] = ev
            mask[b, :n] = True

        nbr = radius_graph(jnp.asarray(pos), jnp.asarray(mask), r=0.7, k=16)
        for b in range(2):
            oracle = oracles.radius_neighbors(events[b], 0.7, loop=True, max_k=16)
            got = _nbr_sets(nbr, b)
            for i in range(n):
                assert got[i] == set(oracle[i]), f"event {b} node {i}"
            # padded nodes have no neighbors
            for i in range(n, pad):
                assert got[i] == set()

    def test_self_loop_flag(self):
        rng = np.random.default_rng(1)
        pos = jnp.asarray(_rand_event(rng, 8)[None])
        mask = jnp.ones((1, 8), bool)
        with_loop = radius_graph(pos, mask, r=10.0, k=8, loop=True)
        without = radius_graph(pos, mask, r=10.0, k=8, loop=False)
        for i in range(8):
            assert i in _nbr_sets(with_loop, 0)[i]
            assert i not in _nbr_sets(without, 0)[i]

    def test_nearest_k_truncation(self):
        # 10 nodes all within radius, cap at 4 -> keeps the 4 nearest.
        pos_1d = np.arange(10, dtype=np.float32)[:, None] * 0.01
        pos = jnp.asarray(np.concatenate([pos_1d, np.zeros_like(pos_1d)], 1)[None])
        mask = jnp.ones((1, 10), bool)
        nbr = radius_graph(pos, mask, r=1.0, k=4, loop=True)
        got = _nbr_sets(nbr, 0)
        assert got[0] == {0, 1, 2, 3}
        assert got[9] == {9, 8, 7, 6}

    def test_tiled_equals_untiled(self):
        rng = np.random.default_rng(2)
        n = 300
        pos = jnp.asarray(_rand_event(rng, n)[None] * 3)
        mask = jnp.ones((1, n), bool)
        a = radius_graph(pos, mask, r=0.4, k=32, tile=64)
        b = radius_graph(pos, mask, r=0.4, k=32, tile=512)
        for i in range(n):
            assert _nbr_sets(a, 0)[i] == _nbr_sets(b, 0)[i]

    def test_phi_wraparound_option(self):
        # two points at phi = +/- (pi - 0.05): far apart without wrap,
        # 0.1 apart with wrap.
        pos = jnp.asarray(
            [[[0.0, np.pi - 0.05], [0.0, -(np.pi - 0.05)]]], dtype=jnp.float32
        )
        mask = jnp.ones((1, 2), bool)
        plain = radius_graph(pos, mask, r=0.4, k=4, loop=False)
        wrapped = radius_graph(pos, mask, r=0.4, k=4, loop=False,
                               wrap_axes=(0.0, 2 * float(np.pi)))
        assert _nbr_sets(plain, 0)[0] == set()
        assert _nbr_sets(wrapped, 0)[0] == {1}


class TestKnnGraph:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(3)
        n, pad, k = 45, 64, 7
        feats = _rand_event(rng, n, d=16)
        x = np.zeros((1, pad, 16), np.float32)
        x[0, :n] = feats
        mask = np.zeros((1, pad), bool)
        mask[0, :n] = True
        nbr = knn_graph(jnp.asarray(x), jnp.asarray(mask), k=k)
        oracle = oracles.knn_neighbors(feats, k)
        got = _nbr_sets(nbr, 0)
        for i in range(n):
            assert got[i] == set(oracle[i]), f"node {i}"

    def test_fewer_nodes_than_k(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(_rand_event(rng, 3, 4)[None])
        mask = jnp.ones((1, 3), bool)
        nbr = knn_graph(x, mask, k=8)
        got = _nbr_sets(nbr, 0)
        for i in range(3):
            assert got[i] == {0, 1, 2} - {i}


class TestToUndirected:
    def test_symmetrizes(self):
        rng = np.random.default_rng(5)
        n, k = 30, 5
        feats = _rand_event(rng, n, d=8)
        x = jnp.asarray(feats[None])
        mask = jnp.ones((1, n), bool)
        nbr = knn_graph(x, mask, k=k)
        und = to_undirected(nbr, cap=n)  # cap >= max degree -> exact
        sets = _nbr_sets(und, 0)
        # symmetric
        for i in range(n):
            for j in sets[i]:
                assert i in sets[j], f"{i}->{j} not symmetric"
        # contains exactly the union of original edges and their reverses
        orig = _nbr_sets(nbr, 0)
        want = [set() for _ in range(n)]
        for i in range(n):
            for j in orig[i]:
                want[i].add(j)
                want[j].add(i)
        for i in range(n):
            assert sets[i] == want[i], f"node {i}"

    def test_symmetric_under_cap_overflow(self):
        # hub node: everyone's 1-NN is node 0 -> its in-degree overflows the
        # cap; symmetry must still hold (mutual drop).
        n = 12
        pos = np.ones((n, 2), np.float32) * 5
        pos[0] = 0.0
        pos += np.random.default_rng(0).normal(0, 0.01, (n, 2)).astype(np.float32)
        x = jnp.asarray(pos[None])
        mask = jnp.ones((1, n), bool)
        und = to_undirected(knn_graph(x, mask, k=1), cap=4)
        sets = _nbr_sets(und, 0)
        for i in range(n):
            for j in sets[i]:
                assert i in sets[j], f"{i}->{j} not symmetric under overflow"

    def test_no_duplicates(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(_rand_event(rng, 20, 3)[None])
        mask = jnp.ones((1, 20), bool)
        und = to_undirected(knn_graph(x, mask, k=4))
        idx = np.asarray(und.idx[0])
        m = np.asarray(und.mask[0])
        for i in range(20):
            vals = idx[i][m[i]].tolist()
            assert len(vals) == len(set(vals))


class TestSegmentOps:
    def test_masked_sum_matches_scatter_add(self):
        rng = np.random.default_rng(7)
        # padded layout vs COO scatter_add oracle
        B, N = 3, 16
        x = rng.normal(size=(B, N)).astype(np.float32)
        mask = rng.random((B, N)) < 0.7
        got = np.asarray(masked_sum(jnp.asarray(x), jnp.asarray(mask), axis=1))
        for b in range(B):
            vals = x[b][mask[b]]
            seg = np.zeros(len(vals), np.int64)
            want = oracles.segment_sum(vals, seg, 1)[0] if len(vals) else 0.0
            np.testing.assert_allclose(got[b], want, rtol=1e-6)

    def test_masked_max_empty_segment(self):
        x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        mask = jnp.asarray([[True, True], [False, False]])
        got = np.asarray(masked_max(x, mask, axis=1))
        assert got[0] == 2.0
        assert got[1] == 0.0  # torch_scatter empty-segment fill

    def test_masked_mean(self):
        x = jnp.asarray([[1.0, 3.0, 100.0]])
        mask = jnp.asarray([[True, True, False]])
        assert np.asarray(masked_mean(x, mask, axis=1))[0] == 2.0

    def test_neighbor_reduce_ops(self):
        vals = jnp.asarray([[[1.0], [2.0], [3.0]]])  # [1,3,1]
        idx = jnp.asarray([[[1, 2], [0, 0], [0, 1]]])
        mask = jnp.asarray([[[True, True], [True, False], [False, False]]])
        nbr = Neighborhood(idx, mask)
        np.testing.assert_allclose(
            np.asarray(neighbor_reduce(vals, nbr, "sum"))[0, :, 0], [5.0, 1.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(neighbor_reduce(vals, nbr, "max"))[0, :, 0], [3.0, 1.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(neighbor_reduce(vals, nbr, "mean"))[0, :, 0], [2.5, 1.0, 0.0])


class TestEdgeConv:
    @pytest.mark.parametrize("aggr", ["max", "sum", "mean"])
    def test_linear_matches_oracle(self, aggr):
        rng = np.random.default_rng(8)
        n, pad, h, hout, k = 25, 32, 6, 5, 8
        feats = rng.normal(size=(n, h)).astype(np.float32)
        x = np.zeros((1, pad, h), np.float32)
        x[0, :n] = feats
        mask = np.zeros((1, pad), bool)
        mask[0, :n] = True
        w = rng.normal(size=(2 * h, hout)).astype(np.float32)
        b = rng.normal(size=(hout,)).astype(np.float32)

        nbr = knn_graph(jnp.asarray(x), jnp.asarray(mask), k=k, loop=True)
        got = np.asarray(
            edgeconv_linear(jnp.asarray(x), nbr, jnp.asarray(w), jnp.asarray(b), aggr)
        )[0, :n]
        want = oracles.edgeconv(
            feats, oracles.knn_neighbors(feats, k, loop=True), w, b, aggr
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_mlp_matches_oracle(self):
        rng = np.random.default_rng(9)
        n, h, hout, k = 20, 4, 3, 5
        feats = rng.normal(size=(n, h)).astype(np.float32)
        x = jnp.asarray(feats[None])
        mask = jnp.ones((1, n), bool)
        w1 = rng.normal(size=(2 * h, 7)).astype(np.float32)
        b1 = rng.normal(size=(7,)).astype(np.float32)
        w2 = rng.normal(size=(7, hout)).astype(np.float32)
        b2 = rng.normal(size=(hout,)).astype(np.float32)

        def mlp_jax(e):
            hdn = jnp.maximum(e @ w1 + b1, 0)
            return hdn @ w2 + b2

        def mlp_np(e):
            hdn = np.maximum(e @ w1 + b1, 0)
            return hdn @ w2 + b2

        nbr = knn_graph(x, mask, k=k)
        got = np.asarray(edgeconv_mlp(x, nbr, mlp_jax, "max"))[0]
        want = oracles.edgeconv(feats, oracles.knn_neighbors(feats, k),
                                None, None, "max", mlp=mlp_np)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_linear_equals_mlp_path(self):
        """The factorized tier-1 path must agree with the general tier-2
        path for a linear edge-MLP (the core correctness claim)."""
        rng = np.random.default_rng(10)
        B, n, h = 2, 40, 8
        x = jnp.asarray(rng.normal(size=(B, n, h)).astype(np.float32))
        mask = jnp.asarray(rng.random((B, n)) < 0.8)
        w = jnp.asarray(rng.normal(size=(2 * h, h)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(h,)).astype(np.float32))
        nbr = radius_graph(x[..., :2], mask, r=0.8, k=8)
        fast = edgeconv_linear(x, nbr, w, b, "max")
        slow = edgeconv_mlp(x, nbr, lambda e: e @ w + b, "max")
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(slow), rtol=2e-5, atol=2e-5)

    def test_grad_flows(self):
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(1, 10, 4)).astype(np.float32))
        mask = jnp.ones((1, 10), bool)
        w = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        b = jnp.zeros((4,))
        nbr = knn_graph(x, mask, k=3, loop=True)

        def f(w):
            return jnp.sum(edgeconv_linear(x, nbr, w, b, "max") ** 2)

        g = jax.grad(f)(w)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).sum() > 0
