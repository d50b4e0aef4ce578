"""Windowed implicit EdgeConv: exactness vs the explicit neighbor-list path."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepmetv2_tpu.data import collate, synthetic_events
from deepmetv2_tpu.data.sorting import required_halo, sort_by_eta
from deepmetv2_tpu.ops.edgeconv import edgeconv_linear
from deepmetv2_tpu.ops.graph import radius_graph
from deepmetv2_tpu.ops.window import WindowGraph, window_edgeconv_linear


def _setup(n_events=3, n_min=30, n_max=120, cap=128, seed=0):
    events = synthetic_events(n_events, seed=seed, n_min=n_min, n_max=n_max)
    batch = collate(events, buckets=(cap,))
    batch, _ = sort_by_eta(batch)
    phi = jnp.arctan2(batch.x_cont[..., 1], batch.x_cont[..., 0])
    etaphi = jnp.stack([batch.x_cont[..., 3], phi], axis=-1)
    return batch, etaphi


class TestSorting:
    def test_sorted_and_mask_contiguous(self):
        batch, etaphi = _setup()
        eta = np.asarray(etaphi[..., 0])
        mask = np.asarray(batch.mask)
        for b in range(eta.shape[0]):
            n = mask[b].sum()
            assert np.all(mask[b, :n]) and not np.any(mask[b, n:])
            assert np.all(np.diff(eta[b, :n]) >= 0)

    def test_required_halo_is_sufficient_bound(self):
        batch, etaphi = _setup()
        h = required_halo(batch, 0.4)
        eta = np.asarray(etaphi[..., 0])
        mask = np.asarray(batch.mask)
        for b in range(eta.shape[0]):
            e = eta[b][mask[b]]
            for i in range(len(e)):
                for j in range(len(e)):
                    if abs(e[i] - e[j]) < 0.4:
                        assert abs(i - j) <= h


@pytest.mark.parametrize("reduction", ["max", "sum", "mean"])
class TestWindowEdgeConv:
    def test_matches_neighbor_list_path(self, reduction):
        rng = np.random.default_rng(1)
        batch, etaphi = _setup(seed=1)
        H, Hout = 8, 8
        x = jnp.asarray(
            rng.normal(size=(batch.batch_size, batch.max_nodes, H))
            .astype(np.float32))
        x = jnp.where(batch.mask[..., None], x, 0.0)
        w = jnp.asarray(rng.normal(size=(2 * H, Hout)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(Hout,)).astype(np.float32))

        halo = required_halo(batch, 0.4)
        # exact path: uncapped radius graph (k = N covers all neighbors)
        nbr = radius_graph(etaphi, batch.mask, r=0.4, k=batch.max_nodes)
        red_nl = {"sum": "sum", "mean": "mean", "max": "max"}[reduction]
        want = edgeconv_linear(x, nbr, w, b, red_nl)

        got = window_edgeconv_linear(
            x, WindowGraph(etaphi, batch.mask, r=0.4, halo=halo), w, b,
            reduction=reduction, tile=32)
        np.testing.assert_allclose(
            np.asarray(got)[np.asarray(batch.mask)],
            np.asarray(want)[np.asarray(batch.mask)],
            rtol=2e-5, atol=2e-5)

    def test_tile_invariance(self, reduction):
        rng = np.random.default_rng(2)
        batch, etaphi = _setup(seed=2)
        H = 4
        x = jnp.asarray(
            rng.normal(size=(batch.batch_size, batch.max_nodes, H))
            .astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
        b = jnp.zeros((H,), jnp.float32)
        halo = required_halo(batch, 0.4)
        outs = []
        for tile in (16, 64, 128):
            outs.append(np.asarray(window_edgeconv_linear(
                x, WindowGraph(etaphi, batch.mask, r=0.4, halo=halo), w, b,
                reduction=reduction, tile=tile)))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-5)


class TestWindowGrad:
    def test_grad_matches_neighbor_list_path(self):
        import jax

        rng = np.random.default_rng(3)
        batch, etaphi = _setup(seed=3, n_events=2, n_min=20, n_max=60, cap=64)
        H = 4
        x = jnp.asarray(
            rng.normal(size=(batch.batch_size, batch.max_nodes, H))
            .astype(np.float32))
        x = jnp.where(batch.mask[..., None], x, 0.0)
        w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
        b = jnp.zeros((H,), jnp.float32)
        halo = required_halo(batch, 0.4)
        nbr = radius_graph(etaphi, batch.mask, r=0.4, k=64)
        mask3 = batch.mask[..., None]

        def f_nl(x, w):
            out = edgeconv_linear(x, nbr, w, b, "max")
            return jnp.sum(jnp.where(mask3, out, 0.0) ** 2)

        def f_win(x, w):
            out = window_edgeconv_linear(
                x, WindowGraph(etaphi, batch.mask, r=0.4, halo=halo), w, b,
                reduction="max", tile=32)
            return jnp.sum(jnp.where(mask3, out, 0.0) ** 2)

        gx1, gw1 = jax.grad(f_nl, argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(f_win, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=1e-4, atol=1e-4)


class TestPallasInterpret:
    """Pallas kernel semantics validated on CPU via interpreter mode."""

    def test_forward_and_grad_match_xla_window(self):
        import jax
        from deepmetv2_tpu.ops.pallas.edgeconv_window import (
            window_edgeconv_linear_pallas,
        )

        rng = np.random.default_rng(5)
        batch, etaphi = _setup(seed=5, n_events=2, n_min=80, n_max=127, cap=128)
        H = 8
        x = jnp.asarray(
            rng.normal(size=(batch.batch_size, batch.max_nodes, H))
            .astype(np.float32))
        x = jnp.where(batch.mask[..., None], x, 0.0)
        w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
        halo = required_halo(batch, 0.4)
        g = WindowGraph(etaphi, batch.mask, r=0.4, halo=halo)
        mask3 = batch.mask[..., None]

        want = window_edgeconv_linear(x, g, w, b, reduction="max", tile=64)
        got = window_edgeconv_linear_pallas(x, g, w, b, tile=128,
                                            interpret=True)
        np.testing.assert_allclose(
            np.asarray(got)[np.asarray(batch.mask)],
            np.asarray(want)[np.asarray(batch.mask)], rtol=1e-5, atol=1e-5)

        def f(fn):
            def loss(x, w):
                out = fn(x, w)
                return jnp.sum(jnp.where(mask3, out, 0.0) ** 2)
            return loss

        g1 = jax.grad(f(lambda x, w: window_edgeconv_linear(
            x, g, w, b, reduction="max", tile=64)), argnums=(0, 1))(x, w)
        g2 = jax.grad(f(lambda x, w: window_edgeconv_linear_pallas(
            x, g, w, b, tile=128, interpret=True)), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=1e-4, atol=1e-4)


class TestPallasChunkPruning:
    """The eta-interval chunk pruning (dynamic [lo, hi) sweep bounds) must
    be exact on adversarial layouts: tight clusters separated by gaps much
    wider than the radius (most chunks prunable), with the fixed halo far
    larger than any true neighbor span."""

    def test_clustered_eta_matches_xla_window(self):
        import jax
        from deepmetv2_tpu.data.batching import EventBatch
        from deepmetv2_tpu.ops.pallas.edgeconv_window import (
            window_edgeconv_linear_pallas,
        )

        rng = np.random.default_rng(11)
        B, N, H = 3, 256, 8
        # clusters at eta in {-4, 0, +4}, sigma 0.1 << gap; random phi
        centers = rng.choice([-4.0, 0.0, 4.0], size=(B, N))
        eta = np.sort(centers + 0.1 * rng.normal(size=(B, N)), axis=1)
        phi = rng.uniform(-np.pi, np.pi, size=(B, N))
        n_valid = np.array([256, 130, 7])  # incl. a nearly-empty event
        mask = np.arange(N)[None, :] < n_valid[:, None]
        eta = np.where(mask, eta, np.inf)  # pad rows sort to the end
        etaphi = jnp.asarray(np.stack([np.where(mask, eta, 0.0),
                                       np.where(mask, phi, 0.0)], axis=-1),
                             jnp.float32)
        maskj = jnp.asarray(mask)
        x = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        x = jnp.where(maskj[..., None], x, 0.0)
        w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
        g = WindowGraph(etaphi, maskj, r=0.4, halo=192)  # >> true span

        want = window_edgeconv_linear(x, g, w, bias, reduction="max",
                                      tile=64)
        got = window_edgeconv_linear_pallas(x, g, w, bias, tile=128,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(got)[mask],
                                   np.asarray(want)[mask],
                                   rtol=1e-5, atol=1e-5)

        def loss(fn):
            return lambda x: jnp.sum(
                jnp.where(maskj[..., None], fn(x), 0.0) ** 2)

        g1 = jax.grad(loss(lambda x: window_edgeconv_linear(
            x, g, w, bias, reduction="max", tile=64)))(x)
        g2 = jax.grad(loss(lambda x: window_edgeconv_linear_pallas(
            x, g, w, bias, tile=128, interpret=True)))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)


class TestWindowModeTraining:
    """Full train step in graph mode='window' (XLA window path on CPU)."""

    def test_train_step_runs_and_learns(self):
        import jax
        from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
        from deepmetv2_tpu.data import fetch_dataloader
        from deepmetv2_tpu.models import graph_met_init
        from deepmetv2_tpu.train.loop import train_one_epoch
        from deepmetv2_tpu.train.step import init_train_state, make_train_step

        events = synthetic_events(16, seed=9, n_min=20, n_max=100)
        loaders = fetch_dataloader(events=events, batch_size=4,
                                   validation_split=0.0, buckets=(128,))
        cfg = Config(graph=GraphConfig(mode="window", window_halo=128),
                     data=DataConfig(batch_size=4, node_buckets=(128,)))
        state = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
        step = make_train_step(cfg)
        first = last = None
        for epoch in range(3):
            state, loss = train_one_epoch(state, step, loaders["train"],
                                          epoch, verbose=False)
            first = first if first is not None else loss
            last = loss
        assert np.isfinite(last) and last < first


class TestPaddedNodeContract:
    """Padded nodes must produce 0 output and 0 gradient — raw tensors,
    NOT masked before comparison.  Regression: all padded nodes share the
    PAD_POS sentinel, making them mutually 'adjacent' (distance 0) inside
    the position-derived predicate; the wrapper must mask them out."""

    def test_pallas_zero_at_padded_nodes(self):
        import jax
        from deepmetv2_tpu.ops.pallas.edgeconv_window import (
            window_edgeconv_linear_pallas,
        )

        rng = np.random.default_rng(13)
        B, N, H = 2, 128, 8
        eta = np.sort(rng.uniform(-5, 5, (B, N)).astype(np.float32), axis=1)
        phi = rng.uniform(-np.pi, np.pi, (B, N)).astype(np.float32)
        mask = np.arange(N)[None, :] < np.array([[100], [77]])
        g = WindowGraph(jnp.asarray(np.stack([eta, phi], -1)),
                        jnp.asarray(mask), r=0.4, halo=64)
        x = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))

        out = window_edgeconv_linear_pallas(x, g, w, bias, interpret=True)
        assert np.all(np.asarray(out)[~mask] == 0.0)

        # UNMASKED loss: gradients at padded nodes must still be zero, and
        # the whole tensors must match the XLA window formulation
        def loss(fn):
            return lambda x, w: jnp.sum(fn(x, w) ** 2)

        vp, (dxp, dwp) = jax.value_and_grad(
            loss(lambda x, w: window_edgeconv_linear_pallas(
                x, g, w, bias, interpret=True)), argnums=(0, 1))(x, w)
        vx, (dxx, dwx) = jax.value_and_grad(
            loss(lambda x, w: window_edgeconv_linear(
                x, g, w, bias, reduction="max")), argnums=(0, 1))(x, w)
        assert np.all(np.asarray(dxp)[~mask] == 0.0)
        np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dxp), np.asarray(dxx),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dwp), np.asarray(dwx),
                                   rtol=1e-4, atol=1e-4)


class TestCellOrder:
    """Cell-list (eta-bin, phi) ordering: the window machinery is
    order-agnostic given halo >= required_span on the actual order; the
    cell order is what makes the kernel's per-chunk phi prune effective."""

    def _cell_setup(self, seed=0, n_events=4, n_min=100, n_max=250,
                    cap=256):
        from deepmetv2_tpu.data.sorting import cell_sort_batch

        events = synthetic_events(n_events, seed=seed, n_min=n_min,
                                  n_max=n_max)
        batch = collate(events, buckets=(cap,))
        batch = cell_sort_batch(batch, r=0.4)
        phi = jnp.arctan2(batch.x_cont[..., 1], batch.x_cont[..., 0])
        etaphi = jnp.stack([batch.x_cont[..., 3], phi], axis=-1)
        return batch, etaphi

    def test_required_span_matches_bruteforce(self):
        from deepmetv2_tpu.data.sorting import required_span_arrays

        rng = np.random.default_rng(7)
        eta = rng.uniform(-3, 3, (3, 64)).astype(np.float32)
        phi = rng.uniform(-np.pi, np.pi, (3, 64)).astype(np.float32)
        mask = rng.random((3, 64)) < 0.8
        got = required_span_arrays(eta, phi, mask, 0.7)
        worst = 0
        for b in range(3):
            e, p = eta[b][mask[b]], phi[b][mask[b]]
            for i in range(len(e)):
                for j in range(len(e)):
                    if (e[i]-e[j])**2 + (p[i]-p[j])**2 < 0.49:
                        worst = max(worst, abs(i - j))
        assert got == worst

    def test_cell_sorted_pallas_matches_neighbor_list(self):
        import jax

        from deepmetv2_tpu.data.sorting import required_span_batch
        from deepmetv2_tpu.ops.pallas.edgeconv_window import (
            window_edgeconv_linear_pallas,
        )
        from deepmetv2_tpu.ops.segment import gather_neighbors

        batch, etaphi = self._cell_setup()
        halo = required_span_batch(batch, 0.4)
        halo = max(64, -(-halo // 64) * 64)
        g = WindowGraph(etaphi, batch.mask, r=0.4, halo=halo)
        rng = np.random.default_rng(1)
        H = 32
        x = jnp.asarray(rng.normal(size=batch.mask.shape + (H,))
                        .astype(np.float32))
        x = jnp.where(jnp.asarray(batch.mask)[..., None], x, 0.0)
        w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32) * .1)
        b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * .1)

        # oracle: uncapped explicit neighbor lists on the SAME row order
        nbr = radius_graph(etaphi, jnp.asarray(batch.mask), r=0.4,
                           k=batch.mask.shape[1])
        want = edgeconv_linear(x, nbr, w, b, "max")
        got = window_edgeconv_linear_pallas(x, g, w, b, tile=16,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        # gradients: same loss through both paths
        def loss(fn):
            return lambda x, w: jnp.sum(fn(x, w) ** 2)

        gx1, gw1 = jax.grad(loss(lambda x, w: edgeconv_linear(
            x, nbr, w, b, "max")), argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(loss(lambda x, w: window_edgeconv_linear_pallas(
            x, g, w, b, tile=16, interpret=True)), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                                   rtol=1e-4, atol=1e-5)

    def test_cell_order_prunes_more_chunks_than_eta_order(self):
        """The point of the cell order: fewer needed chunks than the eta
        order on the same events (the kernel skips the rest).  Needs
        reference-scale events — blocks must hold several tiles for the
        per-tile phi windows to be narrow."""
        from deepmetv2_tpu.data.sorting import (cell_sort_batch,
                                                required_span_batch)
        from deepmetv2_tpu.ops.pallas.edgeconv_window import (
            _bounds_or_static, _grid_params, PAD_POS)

        N = 2048
        events = synthetic_events(8, seed=2, n_min=N - 256, n_max=N - 1)
        base = collate(events, buckets=(N,))

        def needed_count(batch, halo):
            phi = jnp.arctan2(batch.x_cont[..., 1], batch.x_cont[..., 0])
            pos = jnp.stack([jnp.asarray(batch.x_cont[..., 3]), phi], -1)
            pos = jnp.where(jnp.asarray(batch.mask)[..., None], pos,
                            PAD_POS)
            tile = wchunk = 16
            halo_pad, w_win, extra = _grid_params(N, halo, tile, wchunk)
            lo, hi = _bounds_or_static(
                pos, halo_pad, extra, w_win, tile, 0.16, 4, 2, N // tile,
                wchunk, dynamic=True)
            return int(np.sum(np.asarray(hi) - np.asarray(lo)))

        eta_b, _ = sort_by_eta(base)
        eta_halo = max(64, -(-required_halo(eta_b, 0.4) // 64) * 64)
        cell_b = cell_sort_batch(base, r=0.4)
        cell_halo = max(64, -(-required_span_batch(cell_b, 0.4) // 64) * 64)
        n_eta = needed_count(eta_b, eta_halo)
        n_cell = needed_count(cell_b, cell_halo)
        assert n_cell < 0.85 * n_eta, (n_cell, n_eta)


def test_isplit_matches_baseline():
    """isplit (independent sub-slab streams per chunk) is a pure
    scheduling knob: identical results for any divisor of wchunk."""
    import jax
    from deepmetv2_tpu.ops.pallas.edgeconv_window import (
        window_edgeconv_linear_pallas,
    )

    rng = np.random.default_rng(9)
    batch, etaphi = _setup(seed=9, n_events=2, n_min=80, n_max=127, cap=128)
    H = 8
    x = jnp.asarray(
        rng.normal(size=(batch.batch_size, batch.max_nodes, H))
        .astype(np.float32))
    x = jnp.where(batch.mask[..., None], x, 0.0)
    w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
    halo = required_halo(batch, 0.4)
    g = WindowGraph(etaphi, batch.mask, r=0.4, halo=halo)
    mask3 = batch.mask[..., None]

    def run(isp):
        def loss(x):
            out = window_edgeconv_linear_pallas(
                x, g, w, b, tile=128, wchunk=16, subtile=16,
                interpret=True, isplit=isp)
            return jnp.sum(jnp.where(mask3, out, 0.0) ** 2)
        return loss(x), jax.grad(loss)(x)

    v1, g1 = run(1)
    for isp in (2, 4):
        v2, g2 = run(isp)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-5, atol=1e-6)


def test_bf16_window_close_to_f32():
    """Opt-in bf16 window path (ModelConfig.compute_dtype): values within
    bf16 rounding of the f32 path, exact aggregation selection."""
    import jax
    from deepmetv2_tpu.ops.pallas.edgeconv_window import (
        window_edgeconv_linear_pallas,
    )

    rng = np.random.default_rng(13)
    batch, etaphi = _setup(seed=13, n_events=2, n_min=80, n_max=127, cap=128)
    H = 8
    x = jnp.asarray(
        rng.normal(size=(batch.batch_size, batch.max_nodes, H))
        .astype(np.float32))
    x = jnp.where(batch.mask[..., None], x, 0.0)
    w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
    halo = required_halo(batch, 0.4)
    g = WindowGraph(etaphi, batch.mask, r=0.4, halo=halo)
    mask3 = np.asarray(batch.mask)

    f32 = window_edgeconv_linear_pallas(x, g, w, b, tile=128, interpret=True)
    bf = window_edgeconv_linear_pallas(x, g, w, b, tile=128, interpret=True,
                                       dtype=jnp.bfloat16)
    assert bf.dtype == jnp.float32
    # error model: one bf16 rounding of the aggregated c term (relative
    # to the TERM's magnitude, not the output's — a + m can cancel)
    scale = float(np.max(np.abs(np.asarray(f32)[mask3])))
    np.testing.assert_allclose(np.asarray(bf)[mask3], np.asarray(f32)[mask3],
                               rtol=3e-2, atol=2e-2 * scale)

    def loss(fn):
        return lambda xx: jnp.sum(
            jnp.where(batch.mask[..., None], fn(xx), 0.0) ** 2)

    g32 = jax.grad(loss(lambda xx: window_edgeconv_linear_pallas(
        xx, g, w, b, tile=128, interpret=True)))(x)
    gbf = jax.grad(loss(lambda xx: window_edgeconv_linear_pallas(
        xx, g, w, b, tile=128, interpret=True, dtype=jnp.bfloat16)))(x)
    # grads route through argmax selections that can flip at bf16-tied
    # values; compare coarsely — and bound the TAIL too, not just the
    # median: the bf16 backward routes the max gradient to EVERY tied
    # source, and bf16's 8-bit mantissa makes ties far likelier than in
    # f32, so systematic overcounting would show up as a heavy tail
    # (r4 advisor finding)
    relerr = np.abs(np.asarray(gbf) - np.asarray(g32)) / np.maximum(
        np.abs(np.asarray(g32)), 1.0)
    assert np.median(relerr) < 0.05
    assert np.percentile(relerr, 95) < 0.25
