"""DRN model-family tests: coarsening ops + full DynamicReductionNetwork."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepmetv2_tpu.config import DRNConfig
from deepmetv2_tpu.data import collate, synthetic_events
from deepmetv2_tpu.data.batching import Neighborhood
from deepmetv2_tpu.models.drn import drn_apply, drn_init, drn_net_apply
from deepmetv2_tpu.ops.coarsen import (
    global_max_pool,
    handshake_matching,
    max_pool,
    normalized_cut_weights,
)
from deepmetv2_tpu.ops.graph import knn_graph, to_undirected


class TestNormalizedCut:
    def test_weights_formula(self):
        # 3 nodes in a line; undirected path graph 0-1-2
        pos = jnp.asarray([[[0.0], [1.0], [3.0]]])
        idx = jnp.asarray([[[1, 0], [0, 2], [1, 0]]])
        mask = jnp.asarray([[[True, False], [True, True], [True, False]]])
        nbr = Neighborhood(idx, mask)
        w = np.asarray(normalized_cut_weights(pos, nbr))
        # deg = [1, 2, 1]; w(0->1) = 1 * (1/1 + 1/2) = 1.5
        assert np.isclose(w[0, 0, 0], 1.5)
        # w(1->2) = 2 * (1/2 + 1/1) = 3.0
        assert np.isclose(w[0, 1, 1], 3.0)
        assert w[0, 0, 1] == -np.inf  # invalid edge


class TestHandshakeMatching:
    def test_perfect_pairing(self):
        # two tight pairs far apart; max-weight neighbor = far node in pair?
        # weights here: use distance-based normalized cut on a knn graph
        pos = np.array([[0.0, 0], [0.1, 0], [10, 0], [10.1, 0]], np.float32)
        x = jnp.asarray(pos[None])
        mask = jnp.ones((1, 4), bool)
        nbr = to_undirected(knn_graph(x, mask, k=1))
        w = normalized_cut_weights(x, nbr)
        cluster, partner = handshake_matching(w, nbr, mask)
        c = np.asarray(cluster[0])
        assert c[0] == c[1] and c[2] == c[3] and c[0] != c[2]
        p = np.asarray(partner[0])
        assert p[0] == 1 and p[1] == 0 and p[2] == 3 and p[3] == 2

    def test_padding_stays_singleton(self):
        pos = np.random.default_rng(0).normal(size=(1, 8, 2)).astype(np.float32)
        mask = np.ones((1, 8), bool)
        mask[0, 5:] = False
        x = jnp.asarray(pos)
        nbr = to_undirected(knn_graph(x, jnp.asarray(mask), k=2))
        w = normalized_cut_weights(x, nbr)
        cluster, partner = handshake_matching(w, nbr, jnp.asarray(mask))
        c = np.asarray(cluster[0])
        for i in range(5, 8):
            assert c[i] == i
        # every cluster has <= 2 members and ids are min member index
        for i in range(5):
            members = np.where(c == c[i])[0]
            assert len(members) <= 2
            assert c[i] == members.min()

    def test_matching_is_valid(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 32, 4)).astype(np.float32))
        mask = jnp.ones((2, 32), bool)
        nbr = to_undirected(knn_graph(x, mask, k=4))
        w = normalized_cut_weights(x, nbr)
        cluster, partner = handshake_matching(w, nbr, mask)
        c = np.asarray(cluster)
        p = np.asarray(partner)
        sets = [set(np.asarray(nbr.idx[b, i])[np.asarray(nbr.mask[b, i])].tolist())
                for b in range(2) for i in range(32)]
        for b in range(2):
            for i in range(32):
                j = p[b, i]
                if j != i:  # matched: must be mutual and along a real edge
                    assert p[b, j] == i
                    assert j in sets[b * 32 + i]


class TestMaxPool:
    def test_pool_semantics(self):
        x = jnp.asarray([[[1.0, 5.0], [2.0, 3.0], [9.0, 0.0], [4.0, 4.0]]])
        mask = jnp.ones((1, 4), bool)
        cluster = jnp.asarray([[0, 0, 2, 2]], jnp.int32)
        partner = jnp.asarray([[1, 0, 3, 2]], jnp.int32)
        pooled, new_mask = max_pool(x, cluster, partner, mask)
        m = np.asarray(new_mask[0])
        np.testing.assert_array_equal(m, [True, False, True, False])
        np.testing.assert_allclose(np.asarray(pooled[0, 0]), [2.0, 5.0])
        np.testing.assert_allclose(np.asarray(pooled[0, 2]), [9.0, 4.0])

    def test_global_max_pool(self):
        x = jnp.asarray([[[1.0], [7.0], [3.0]], [[2.0], [0.0], [5.0]]])
        mask = jnp.asarray([[True, True, False], [True, False, False]])
        out = np.asarray(global_max_pool(x, mask))
        np.testing.assert_allclose(out, [[7.0], [2.0]])


class TestDRN:
    def test_forward_shapes(self):
        events = synthetic_events(3, seed=0, n_min=30, n_max=100)
        batch = collate(events, buckets=(128,))
        cfg = DRNConfig(hidden_dim=32, k=8)
        params, state = drn_init(jax.random.PRNGKey(0), cfg)
        x = jnp.concatenate(
            [batch.x_cont, batch.x_cat.astype(jnp.float32)], axis=-1)
        out, new_state = drn_apply(params, state, x, batch.mask, train=True,
                                   cfg=cfg)
        assert out.shape == (3, cfg.output_dim)
        assert np.all(np.isfinite(np.asarray(out)))
        assert int(new_state["convs"][0].count) == 1

    def test_net_head(self):
        events = synthetic_events(2, seed=1, n_min=20, n_max=60)
        batch = collate(events, buckets=(64,))
        cfg = DRNConfig(hidden_dim=16, k=4)
        params, state = drn_init(jax.random.PRNGKey(1), cfg)
        out, _ = drn_net_apply(params, state, batch, cfg=cfg)
        o = np.asarray(out)
        assert o.shape == (2, 2)
        assert np.all(o[:, 0] >= 0)                      # softplus MET
        assert np.all(np.abs(o[:, 1]) <= np.pi)          # phi in [-pi, pi]

    def test_coarsening_reduces_nodes(self):
        events = synthetic_events(2, seed=2, n_min=50, n_max=100)
        batch = collate(events, buckets=(128,))
        cfg = DRNConfig(hidden_dim=16, k=8)
        params, state = drn_init(jax.random.PRNGKey(2), cfg)
        # instrument: one round of the internal pipeline
        from deepmetv2_tpu.nn.core import mlp_apply
        from deepmetv2_tpu.models.drn import _drn_edgeconv
        from deepmetv2_tpu.ops.coarsen import normalized_cut_weights
        x = jnp.concatenate(
            [batch.x_cont, batch.x_cat.astype(jnp.float32)], axis=-1)
        h = params["datanorm"] * x
        h = mlp_apply(params["inputnet"], h, final_act=True)
        nbr = to_undirected(knn_graph(h, batch.mask, k=cfg.k))
        h, _ = _drn_edgeconv(params["convs"][0], state["convs"][0], h, nbr,
                             cfg.aggr, False)
        w = normalized_cut_weights(h, nbr)
        cluster, partner = handshake_matching(w, nbr, batch.mask)
        _, new_mask = max_pool(h, cluster, partner, batch.mask)
        before = np.asarray(batch.mask).sum(1)
        after = np.asarray(new_mask).sum(1)
        # matching should pair off a decent fraction of nodes
        assert np.all(after < before)
        assert np.all(after >= before / 2)

    def test_grad_flows(self):
        events = synthetic_events(2, seed=3, n_min=20, n_max=40)
        batch = collate(events, buckets=(64,))
        cfg = DRNConfig(hidden_dim=16, k=4)
        params, state = drn_init(jax.random.PRNGKey(3), cfg)

        def f(params):
            out, _ = drn_net_apply(params, state, batch, train=True, cfg=cfg)
            return jnp.sum(out[:, 0] ** 2)

        g = jax.grad(f)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
        assert total > 0


class TestDRNConvOracle:
    """Parity of the DRN conv block (edge-MLP + edge BatchNorm + aggr)
    against an independent numpy edge-loop oracle (tests/oracles.py) and
    against real torch modules executing the reference's exact Sequential
    (reference model/dynamic_reduction_network.py:61-79)."""

    def _setup(self, aggr, seed=0, H=16, B=2, N=24, k=4):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        mask = np.ones((B, N), bool)
        mask[0, N - 5:] = False          # ragged event
        mask = jnp.asarray(mask)
        nbr = to_undirected(knn_graph(x, mask, k=k))
        cfg = DRNConfig(hidden_dim=H, k=k, aggr=aggr)
        params, state = drn_init(jax.random.PRNGKey(seed), cfg)
        return x, mask, nbr, params, state

    @staticmethod
    def _nbr_lists(nbr, mask):
        idx, m = np.asarray(nbr.idx), np.asarray(nbr.mask)
        out = []
        for b in range(idx.shape[0]):
            out.append([idx[b, i][m[b, i]].tolist() if mask[b, i] else []
                        for i in range(idx.shape[1])])
        return out

    @pytest.mark.parametrize("aggr", ["add", "max", "mean"])
    @pytest.mark.parametrize("train", [True, False])
    def test_vs_numpy_oracle(self, aggr, train):
        from deepmetv2_tpu.models.drn import _drn_edgeconv
        from tests.oracles import drn_conv

        x, mask, nbr, params, state = self._setup(aggr)
        conv_p, bn_s = params["convs"][0], state["convs"][0]
        # non-trivial running stats so eval mode is a real check
        bn_s = bn_s._replace(mean=bn_s.mean + 0.3, var=bn_s.var * 1.7)

        got, new_bn = _drn_edgeconv(conv_p, bn_s, x, nbr, aggr, train)

        mlp = conv_p["mlp"]
        xs = [np.asarray(x[b])[np.asarray(mask[b])] for b in range(2)]
        nls = self._nbr_lists(nbr, np.asarray(mask))
        nls = [[js for js, v in zip(nl, np.asarray(mask[b])) if v]
               for b, nl in enumerate(nls)]
        want, want_mean, want_var = drn_conv(
            xs, nls,
            np.asarray(mlp["lin0"]["w"]), np.asarray(mlp["lin0"]["b"]),
            np.asarray(mlp["lin1"]["w"]), np.asarray(mlp["lin1"]["b"]),
            np.asarray(conv_p["bn"]["gamma"]), np.asarray(conv_p["bn"]["beta"]),
            np.asarray(bn_s.mean), np.asarray(bn_s.var),
            aggr=aggr, train=train)
        for b in range(2):
            n_valid = int(np.asarray(mask[b]).sum())
            np.testing.assert_allclose(
                np.asarray(got[b, :n_valid]), want[b], rtol=2e-5, atol=2e-5)
            # padded nodes contribute nothing
            np.testing.assert_allclose(np.asarray(got[b, n_valid:]), 0.0)
        np.testing.assert_allclose(np.asarray(new_bn.mean), want_mean,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_bn.var), want_var,
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("train", [True, False])
    def test_vs_torch_modules(self, train):
        """Drive the reference's literal Sequential
        (Linear-ELU-Linear-ELU-BatchNorm1d over the [E, 2H] edge matrix,
        model/dynamic_reduction_network.py:61-72) with torch, loaded with
        this framework's weights, and compare outputs and the BN running
        update torch itself performs."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        aggr = "add"
        x, mask, nbr, params, state = self._setup(aggr, seed=3)
        conv_p, bn_s = params["convs"][0], state["convs"][0]
        bn_s = bn_s._replace(mean=bn_s.mean - 0.1, var=bn_s.var * 0.8)
        got, new_bn = _drn_edgeconv_import()(conv_p, bn_s, x, nbr, aggr, train)

        H = x.shape[-1]
        seq = tnn.Sequential(
            tnn.Linear(2 * H, 3 * H // 2), tnn.ELU(),
            tnn.Linear(3 * H // 2, H), tnn.ELU(),
            tnn.BatchNorm1d(H))
        mlp = conv_p["mlp"]
        with torch.no_grad():
            seq[0].weight.copy_(torch.from_numpy(
                np.asarray(mlp["lin0"]["w"]).T.copy()))
            seq[0].bias.copy_(torch.from_numpy(np.asarray(mlp["lin0"]["b"])))
            seq[2].weight.copy_(torch.from_numpy(
                np.asarray(mlp["lin1"]["w"]).T.copy()))
            seq[2].bias.copy_(torch.from_numpy(np.asarray(mlp["lin1"]["b"])))
            seq[4].weight.copy_(torch.from_numpy(
                np.asarray(conv_p["bn"]["gamma"])))
            seq[4].bias.copy_(torch.from_numpy(np.asarray(conv_p["bn"]["beta"])))
            seq[4].running_mean.copy_(torch.from_numpy(np.asarray(bn_s.mean)))
            seq[4].running_var.copy_(torch.from_numpy(np.asarray(bn_s.var)))
        seq.train(train)

        idx, em = np.asarray(nbr.idx), np.asarray(nbr.mask)
        xn, mn = np.asarray(x), np.asarray(mask)
        feats, tgt = [], []
        for b in range(xn.shape[0]):
            for i in range(xn.shape[1]):
                if not mn[b, i]:
                    continue
                for s in range(idx.shape[2]):
                    if em[b, i, s]:
                        j = idx[b, i, s]
                        feats.append(np.concatenate(
                            [xn[b, i], xn[b, j] - xn[b, i]]))
                        tgt.append((b, i))
        msgs = seq(torch.from_numpy(np.stack(feats))).detach().numpy()
        want = np.zeros_like(xn)
        for (b, i), m in zip(tgt, msgs):
            want[b, i] += m
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(new_bn.mean),
                                   seq[4].running_mean.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_bn.var),
                                   seq[4].running_var.numpy(),
                                   rtol=1e-5, atol=1e-6)


def _drn_edgeconv_import():
    from deepmetv2_tpu.models.drn import _drn_edgeconv
    return _drn_edgeconv
