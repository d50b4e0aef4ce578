"""Fused dynamic-graph build (ops/pallas/knn_und.py + ops/dyn_graph.py)
and the independent numpy oracle for the DRN conv block (VERDICT r2 #5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepmetv2_tpu.models.drn import _drn_edgeconv
from deepmetv2_tpu.nn.core import BatchNormState, batchnorm_init, mlp_init
from deepmetv2_tpu.ops.coarsen import (
    handshake_matching,
    handshake_matching_dense,
    normalized_cut_weights,
)
from deepmetv2_tpu.ops.dyn_graph import build_dyn_graph, cut_matching
from deepmetv2_tpu.ops.graph import knn_graph, to_undirected


def _canon(nbr):
    """Canonicalize a neighbor list for comparison: per-row ascending ids,
    padded slots pushed to the end (the fused build emits ascending-d²
    slot order; the composed path ascending-id)."""
    idx = np.where(np.asarray(nbr.mask), np.asarray(nbr.idx), 1 << 30)
    return np.sort(idx, axis=-1)


def _inputs(B=2, N=256, H=8, seed=0, pad=True):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(B, N, H)).astype(np.float32)
    if pad:
        n_valid = rng.integers(N - N // 4, N, size=B)
    else:
        n_valid = np.full(B, N)
    mask = np.arange(N)[None, :] < n_valid[:, None]
    h = np.where(mask[..., None], h, 0.0)
    return jnp.asarray(h), jnp.asarray(mask)


class TestKnnUndKernel:
    """Interpret-mode parity of the fused Pallas build vs the composed
    XLA formulation (generic position: no distance ties, degree << cap)."""

    @pytest.mark.parametrize("N,H,k", [(128, 8, 4), (256, 16, 6)])
    def test_matches_composed(self, N, H, k):
        from deepmetv2_tpu.ops.pallas.knn_und import knn_und_graph

        h, mask = _inputs(B=2, N=N, H=H, seed=N + k)
        cap = 64  # generous: no cap-overflow divergence in play
        nbr, d2v, t = knn_und_graph(h, mask, k=k, cap=cap, interpret=True,
                                    sort_ids=True)
        want = to_undirected(knn_graph(h, mask, k=k, loop=False), cap=cap)

        np.testing.assert_array_equal(np.asarray(nbr.mask),
                                      np.asarray(want.mask))
        np.testing.assert_array_equal(np.asarray(nbr.idx),
                                      np.asarray(want.idx))

        # d2v really is the squared distance of each listed edge
        hn, mn = np.asarray(h), np.asarray(nbr.mask)
        idx = np.asarray(nbr.idx)
        for b in range(h.shape[0]):
            d = hn[b][:, None, :] - hn[b][idx[b]]
            d2 = (d ** 2).sum(-1)
            np.testing.assert_allclose(np.asarray(d2v)[b][mn[b]],
                                       d2[mn[b]], rtol=1e-4, atol=1e-5)

    def test_thresholds_match_kth_distance(self):
        from deepmetv2_tpu.ops.pallas.knn_und import knn_und_graph

        k = 4
        h, mask = _inputs(B=2, N=128, H=8, seed=3)
        _, _, t = knn_und_graph(h, mask, k=k, cap=16, interpret=True)
        hn, mn, tn = np.asarray(h), np.asarray(mask), np.asarray(t)
        for b in range(2):
            pts = hn[b][mn[b]]
            d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
            np.fill_diagonal(d2, np.inf)
            kth = np.sort(d2, axis=1)[:, k - 1]
            np.testing.assert_allclose(tn[b][mn[b]], kth, rtol=1e-4,
                                       atol=1e-5)

    def test_empty_event_and_tiny_valid(self):
        from deepmetv2_tpu.ops.pallas.knn_und import knn_und_graph

        rng = np.random.default_rng(7)
        h = jnp.asarray(rng.normal(size=(2, 128, 4)).astype(np.float32))
        mask = np.zeros((2, 128), bool)
        mask[1, :3] = True   # event 0 empty, event 1 has 3 < k nodes
        nbr, d2v, t = knn_und_graph(h, jnp.asarray(mask), k=4, cap=8,
                                    interpret=True)
        assert not np.asarray(nbr.mask)[0].any()
        # 3 valid nodes, k=4 > available: everyone connects to everyone
        deg = np.asarray(nbr.mask)[1].sum(-1)
        assert (deg[:3] == 2).all() and (deg[3:] == 0).all()


class TestDenseMatching:
    def test_matches_list_matching(self):
        h, mask = _inputs(B=2, N=256, H=8, seed=11)
        nbr = to_undirected(knn_graph(h, mask, k=4, loop=False), cap=64)
        w = normalized_cut_weights(h, nbr)
        cl, pa = handshake_matching(w, nbr, mask)

        # scatter the same list weights into dense [B,N,N]
        B, N, K = nbr.idx.shape
        W = np.full((B, N, N), -np.inf, np.float32)
        wn, mn, idxn = np.asarray(w), np.asarray(nbr.mask), np.asarray(nbr.idx)
        for b in range(B):
            for i in range(N):
                for c in range(K):
                    if mn[b, i, c]:
                        W[b, i, idxn[b, i, c]] = wn[b, i, c]
        cl2, pa2 = handshake_matching_dense(jnp.asarray(W), mask)
        np.testing.assert_array_equal(np.asarray(cl), np.asarray(cl2))
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pa2))


class TestCutMatchingDispatch:
    def test_fused_matches_composed(self):
        h, mask = _inputs(B=2, N=128, H=8, seed=13)
        g_fused = build_dyn_graph(h, mask, k=4, cap=64, force="fused",
                                  interpret=True)
        g_comp = build_dyn_graph(h, mask, k=4, cap=64, force="composed")
        np.testing.assert_array_equal(_canon(g_fused.nbr), _canon(g_comp.nbr))
        # post-conv features for the weights: any smooth function of h
        h2 = jnp.tanh(h * 1.7 + 0.3)
        cl_f, pa_f = cut_matching(g_fused, h2, mask)
        cl_c, pa_c = cut_matching(g_comp, h2, mask)
        np.testing.assert_array_equal(np.asarray(cl_f), np.asarray(cl_c))
        np.testing.assert_array_equal(np.asarray(pa_f), np.asarray(pa_c))


class TestFusedMirrorTopology:
    def test_fused_mirror_matches_composed(self):
        """``want_mirror=True`` on the fused path intersects the list with
        mutual-keep — the composed path's semantics (ADVICE r3): in the
        hub-free regime the two must produce identical topology AND the
        mirror table must be a valid involution."""
        h, mask = _inputs(B=2, N=128, H=8, seed=29)
        g_f = build_dyn_graph(h, mask, k=4, cap=64, force="fused",
                              interpret=True, want_mirror=True)
        g_c = build_dyn_graph(h, mask, k=4, cap=64, force="composed",
                              want_mirror=True)
        np.testing.assert_array_equal(_canon(g_f.nbr), _canon(g_c.nbr))
        idx, m = np.asarray(g_f.nbr.idx), np.asarray(g_f.nbr.mask)
        mir = np.asarray(g_f.mirror)
        B, N, K = idx.shape
        for b in range(B):
            for i in range(N):
                for s in range(K):
                    if m[b, i, s]:
                        j = idx[b, i, s]
                        assert idx[b, j, mir[b, i, s]] == i


class TestMirrorSlotsSortedContract:
    def test_int32_overflow_guard(self):
        """N past the int32 key-encoding bound must fail loudly (ADVICE
        r3), not corrupt pairings.  Uses a zero-size view: the guard fires
        before any compute."""
        from deepmetv2_tpu.data.batching import Neighborhood
        from deepmetv2_tpu.ops.segment import mirror_slots_sorted

        N = 40000
        idx = jnp.zeros((1, N, 2), jnp.int32)
        mask = jnp.zeros((1, N, 2), bool)
        with pytest.raises(ValueError, match="int32"):
            mirror_slots_sorted(Neighborhood(idx, mask))

    def test_duplicate_slot_detected_by_roundtrip(self):
        """Documents the dedup precondition (ADVICE r3): with a duplicated
        valid slot the sorted-key pairing maps both reverse edges onto one
        duplicate — the involution property breaks.  All in-tree producers
        emit deduplicated lists; this test pins the failure mode so the
        contract is visible."""
        from deepmetv2_tpu.data.batching import Neighborhood
        from deepmetv2_tpu.ops.segment import mirror_slots_sorted

        # 0 lists 1 twice; 1 lists 0 twice.  Pairing cannot be a bijection.
        idx = jnp.asarray([[[1, 1], [0, 0]]], jnp.int32)
        mask = jnp.ones((1, 2, 2), bool)
        mirror, found = mirror_slots_sorted(Neighborhood(idx, mask))
        mir = np.asarray(mirror)[0]
        # both of node 0's slots point at the SAME slot of node 1 -> the
        # backward would drop one cotangent (why the precondition exists)
        assert mir[0, 0] == mir[0, 1]


class TestDrnFusedParity:
    def test_drn_apply_fused_matches_composed(self):
        from deepmetv2_tpu.config import DRNConfig
        from deepmetv2_tpu.models.drn import drn_apply, drn_init

        cfg = DRNConfig(hidden_dim=16, k=4, und_cap=64)
        params, state = drn_init(jax.random.PRNGKey(0), cfg)
        h, mask = _inputs(B=2, N=128, H=11, seed=17)
        out_f, st_f = drn_apply(params, state, h, mask, train=True, cfg=cfg,
                                graph_force="fused", graph_interpret=True)
        out_c, st_c = drn_apply(params, state, h, mask, train=True, cfg=cfg,
                                graph_force="composed")
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(st_f),
                        jax.tree_util.tree_leaves(st_c)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------- oracle


def _drn_conv_oracle(x, idx, nmask, mlp, bn_gamma, bn_beta, bn_mean, bn_var,
                     aggr, train, momentum=0.1, eps=1e-5):
    """Independent numpy edge-loop implementation of the DRN conv block
    (reference model/dynamic_reduction_network.py:61-79): per-edge 2-layer
    ELU MLP on [x_i ‖ x_j − x_i], BatchNorm1d over the [E, H] message
    matrix, then aggregation.  Mirrors tests/torch_oracle.py's technique
    for the GraphMET block."""
    def elu(v):
        return np.where(v > 0, v, np.expm1(v))

    B, N, K = idx.shape
    H = bn_gamma.shape[0]
    msgs = np.zeros((B, N, K, H), np.float64)
    all_msgs = []
    for b in range(B):
        for i in range(N):
            for c in range(K):
                if not nmask[b, i, c]:
                    continue
                j = idx[b, i, c]
                e = np.concatenate([x[b, i], x[b, j] - x[b, i]])
                h1 = elu(e @ mlp["lin0"]["w"] + mlp["lin0"]["b"])
                h2 = elu(h1 @ mlp["lin1"]["w"] + mlp["lin1"]["b"])
                msgs[b, i, c] = h2
                all_msgs.append(h2)
    E = np.asarray(all_msgs)                     # [n_edges, H]
    if train:
        mean = E.mean(0)
        var = E.var(0)                           # biased, used to normalize
        unbiased = E.var(0, ddof=1)
        new_mean = (1 - momentum) * bn_mean + momentum * mean
        new_var = (1 - momentum) * bn_var + momentum * unbiased
    else:
        mean, var = bn_mean, bn_var
        new_mean, new_var = bn_mean, bn_var
    msgs = (msgs - mean) / np.sqrt(var + eps) * bn_gamma + bn_beta

    out = np.zeros((B, N, H), np.float64)
    for b in range(B):
        for i in range(N):
            sel = msgs[b, i][nmask[b, i]]
            if len(sel) == 0:
                continue
            if aggr == "max":
                out[b, i] = sel.max(0)
            elif aggr == "add":
                out[b, i] = sel.sum(0)
            else:
                out[b, i] = sel.mean(0)
    return out, new_mean, new_var


class TestDrnConvOracle:
    @pytest.mark.parametrize("aggr", ["add", "max", "mean"])
    @pytest.mark.parametrize("train", [True, False])
    def test_conv_block_matches_numpy_oracle(self, aggr, train):
        rng = np.random.default_rng(23)
        B, N, H, k = 2, 32, 8, 3
        x = rng.normal(size=(B, N, H)).astype(np.float32)
        mask = np.arange(N)[None, :] < np.array([N, N - 7])[:, None]
        x = np.where(mask[..., None], x, 0.0)
        nbr = to_undirected(knn_graph(jnp.asarray(x), jnp.asarray(mask), k=k))

        mlp_p = mlp_init(jax.random.PRNGKey(1), (2 * H, 3 * H // 2, H))
        bn_p, bn_s = batchnorm_init(H)
        # non-trivial running stats + affine so eval mode is a real test
        bn_p = {"gamma": bn_p["gamma"] * 1.3 + 0.1,
                "beta": bn_p["beta"] + 0.05}
        bn_s = BatchNormState(mean=bn_s.mean + 0.2,
                              var=bn_s.var * 1.5, count=bn_s.count)
        conv = {"mlp": mlp_p, "bn": bn_p}

        got, new_bn = _drn_edgeconv(conv, bn_s, jnp.asarray(x), nbr, aggr,
                                    train=train)
        mlp_np = jax.tree_util.tree_map(np.asarray, mlp_p)
        want, w_mean, w_var = _drn_conv_oracle(
            x.astype(np.float64), np.asarray(nbr.idx), np.asarray(nbr.mask),
            mlp_np, np.asarray(bn_p["gamma"]), np.asarray(bn_p["beta"]),
            np.asarray(bn_s.mean), np.asarray(bn_s.var), aggr, train)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_bn.mean), w_mean,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_bn.var), w_var,
                                   rtol=1e-4, atol=1e-6)


class TestMirrorGather:
    """The mirror-slot gather (ops/segment.mirror_slots /
    gather_neighbors_mirror): backward-as-gather for symmetric lists."""

    def _sym_graph(self, seed=0, B=2, N=40, H=6, k=4):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(B, N, H)).astype(np.float32)
        mask = np.arange(N)[None, :] < np.array([N, N - 9])[:, None]
        x = jnp.asarray(np.where(mask[..., None], x, 0.0))
        mask = jnp.asarray(mask)
        nbr = to_undirected(knn_graph(x, mask, k=k))
        return x, mask, nbr

    def test_mirror_slots_roundtrip(self):
        from deepmetv2_tpu.ops.segment import mirror_slots

        x, mask, nbr = self._sym_graph()
        mirror, found = mirror_slots(nbr)
        idx, m = np.asarray(nbr.idx), np.asarray(nbr.mask)
        mir = np.asarray(mirror)
        # to_undirected is symmetric by construction -> every valid edge
        # has its mirror
        np.testing.assert_array_equal(np.asarray(found), m)
        B, N, K = idx.shape
        for b in range(B):
            for i in range(N):
                for s in range(K):
                    if m[b, i, s]:
                        j = idx[b, i, s]
                        assert idx[b, j, mir[b, i, s]] == i

    def test_mirror_slots_strips_asymmetric_edges(self):
        from deepmetv2_tpu.data.batching import Neighborhood
        from deepmetv2_tpu.ops.segment import mirror_slots

        # node 0 lists 1, but 1 does not list 0 (cap-bound hub situation)
        idx = jnp.asarray([[[1, 2], [2, 0], [0, 1]]], jnp.int32)
        mask = jnp.asarray([[[True, True], [True, False], [True, True]]])
        # edges: 0->1 (no mirror: 1 lists {2}), 0->2 (mirror: 2 lists 0),
        # 1->2 (mirror: 2 lists 1), 2->0, 2->1
        mirror, found = mirror_slots(Neighborhood(idx, mask))
        f = np.asarray(found[0])
        assert not f[0, 0]           # 0->1 dropped
        assert f[0, 1] and f[1, 0] and f[2, 0] and f[2, 1]

    @pytest.mark.parametrize("fdim", [1, 5])
    def test_gather_and_grad_match_plain(self, fdim):
        from deepmetv2_tpu.ops.segment import (gather_neighbors,
                                               gather_neighbors_mirror,
                                               mirror_slots)

        x, mask, nbr = self._sym_graph(seed=3, H=fdim)
        mirror, _ = mirror_slots(nbr)
        rng = np.random.default_rng(7)
        # per-slot weights make the pullback non-uniform across slots
        wslot = jnp.asarray(rng.normal(
            size=nbr.idx.shape + (fdim,)).astype(np.float32))

        def loss_plain(v):
            g = jnp.where(nbr.mask[..., None], gather_neighbors(v, nbr), 0)
            return jnp.sum(jnp.sin(g * wslot))

        def loss_mirror(v):
            g = gather_neighbors_mirror(v, nbr, mirror)
            return jnp.sum(jnp.sin(g * wslot))

        np.testing.assert_allclose(float(loss_plain(x)),
                                   float(loss_mirror(x)), rtol=1e-6)
        gp = np.asarray(jax.grad(loss_plain)(x))
        gm = np.asarray(jax.grad(loss_mirror)(x))
        np.testing.assert_allclose(gm, gp, rtol=1e-5, atol=1e-6)

    def test_drn_apply_grads_match_plain_gather(self):
        """End-to-end: default drn_apply (mirror gather engaged) vs the
        plain scatter-adjoint gather — identical loss and parameter
        grads up to float reassociation."""
        from deepmetv2_tpu.config import DRNConfig
        from deepmetv2_tpu.models.drn import drn_apply, drn_init
        from deepmetv2_tpu.ops.segment import gather_neighbors

        rng = np.random.default_rng(11)
        B, N = 2, 48
        cfg = DRNConfig(input_dim=11, hidden_dim=16, k=4, mirror_gather=True)
        x = rng.normal(size=(B, N, 11)).astype(np.float32)
        mask = np.arange(N)[None, :] < np.array([N, N - 13])[:, None]
        x = jnp.asarray(np.where(mask[..., None], x, 0.0))
        mask = jnp.asarray(mask)
        params, state = drn_init(jax.random.PRNGKey(2), cfg)

        def loss(params, gather_fn):
            out, _ = drn_apply(params, state, x, mask, train=True, cfg=cfg,
                               gather_fn=gather_fn,
                               graph_force="composed")
            return jnp.sum(out ** 2)

        # a wrapper defeats the `gather_fn is gather_neighbors` check ->
        # plain gather with XLA's scatter-add adjoint
        plain = lambda v, n: jnp.where(
            n.mask[..., None], gather_neighbors(v, n), 0)
        l_m, g_m = jax.value_and_grad(loss)(params, plain)
        # the bare default engages the mirror path
        l_d, g_d = jax.value_and_grad(loss)(params, gather_neighbors)
        np.testing.assert_allclose(float(l_m), float(l_d), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_m),
                        jax.tree_util.tree_leaves(g_d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestTiledMatching:
    """Tiled dense matching (N > DENSE_MATCH_MAX_N path) vs the
    rel-based dense branch.  Integer-valued features make every d²
    exact in f32, so the tiled recompute reproduces the kernel's
    threshold decisions bitwise even on CPU (on TPU the MXU HIGHEST
    einsum matches the kernel on arbitrary data — gated in bench)."""

    def test_tiled_matches_rel_dense(self):
        from deepmetv2_tpu.ops.coarsen import handshake_matching_dense
        from deepmetv2_tpu.ops.dyn_graph import (_tiled_cut_weights,
                                                 build_dyn_graph,
                                                 cut_matching)

        B, N, H = 2, 256, 16
        rng = np.random.default_rng(5)
        h0 = jnp.asarray(rng.integers(-8, 8, size=(B, N, H))
                         .astype(np.float32))
        hp = jnp.asarray(rng.integers(-8, 8, size=(B, N, H))
                         .astype(np.float32))
        mask = jnp.asarray(rng.random((B, N)) < 0.95)
        g = build_dyn_graph(h0, mask, k=4, force="fused", interpret=True)
        cl_rel, pa_rel = cut_matching(g, hp, mask)
        W = _tiled_cut_weights(g.h0, g.t, hp, mask, tile_c=128)
        cl_t, pa_t = handshake_matching_dense(W, mask)
        assert bool(jnp.all(cl_rel == cl_t))
        assert bool(jnp.all(pa_rel == pa_t))

    def test_tiled_matching_is_valid(self):
        """On arbitrary float data the tiled path must still produce a
        valid matching: partners are mutual, masked nodes singleton."""
        from deepmetv2_tpu.ops.coarsen import handshake_matching_dense
        from deepmetv2_tpu.ops.dyn_graph import (_tiled_cut_weights,
                                                 build_dyn_graph)

        B, N, H = 2, 256, 16
        rng = np.random.default_rng(6)
        h0 = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        hp = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        mask = jnp.asarray(rng.random((B, N)) < 0.95)
        g = build_dyn_graph(h0, mask, k=4, force="fused", interpret=True)
        W = _tiled_cut_weights(g.h0, g.t, hp, mask, tile_c=128)
        cl, pa = handshake_matching_dense(W, mask)
        pa = np.asarray(pa)
        iota = np.arange(N)[None, :]
        m = np.asarray(mask)
        # partner of partner is self
        pp = np.take_along_axis(pa, pa, axis=1)
        assert np.all(pp[m] == iota.repeat(B, 0)[m])
        # masked-out nodes are singletons
        assert np.all(pa[~m] == iota.repeat(B, 0)[~m])
