"""Model tests: GraphMETNetwork forward, checkpoint import, golden parity."""

import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepmetv2_tpu.config import ModelConfig
from deepmetv2_tpu.data import collate, synthetic_events
from deepmetv2_tpu.models import graph_met_apply, graph_met_init, net_apply, pdg_remap
from deepmetv2_tpu.ops import radius_graph
from deepmetv2_tpu.train.loss import loss_fn, weighted_met

from tests import oracles

REF_CKPT = "/root/reference/ckpts_dytt/best.pth.tar"


def _etaphi(batch):
    phi = jnp.arctan2(batch.x_cont[..., 1], batch.x_cont[..., 0])
    return jnp.stack([batch.x_cont[..., 3], phi], axis=-1)


class TestPdgRemap:
    def test_known_values(self):
        pdg = jnp.asarray([1, 2, 11, 13, 22, 130, 211, -211, -11, -13])
        got = np.asarray(pdg_remap(pdg))
        np.testing.assert_array_equal(got, [0, 1, 2, 3, 4, 5, 6, 6, 2, 3])

    def test_unknown_maps_to_zero(self):
        assert int(pdg_remap(jnp.asarray([999]))[0]) == 0
        assert int(pdg_remap(jnp.asarray([0]))[0]) == 0


class TestForward:
    def test_shapes_and_finiteness(self):
        events = synthetic_events(3, seed=0, n_min=20, n_max=100)
        batch = collate(events, buckets=(128,))
        nbr = radius_graph(_etaphi(batch), batch.mask, r=0.4, k=32)
        params, state = graph_met_init(jax.random.PRNGKey(0))
        w, new_state = net_apply(params, state, batch, nbr, train=False)
        assert w.shape == (3, 128)
        wv = np.asarray(w)
        m = np.asarray(batch.mask)
        assert np.all(np.isfinite(wv[m]))
        assert np.all((wv[m] > 0) & (wv[m] < 1))
        assert np.all(wv[~m] == 0)  # padded slots zeroed

    def test_train_mode_updates_bn_state(self):
        events = synthetic_events(2, seed=1, n_min=20, n_max=60)
        batch = collate(events, buckets=(64,))
        nbr = radius_graph(_etaphi(batch), batch.mask, r=0.4, k=16)
        params, state = graph_met_init(jax.random.PRNGKey(1))
        _, st1 = net_apply(params, state, batch, nbr, train=True)
        assert int(st1["bn_all"].count) == 1
        assert not np.allclose(np.asarray(st1["bn_all"].mean),
                               np.asarray(state["bn_all"].mean))
        _, st2 = net_apply(params, state, batch, nbr, train=False)
        np.testing.assert_array_equal(np.asarray(st2["bn_all"].mean),
                                      np.asarray(state["bn_all"].mean))

    def test_padding_invariance(self):
        """The same events padded to different capacities must give
        identical weights on real nodes — the core masking contract."""
        events = synthetic_events(2, seed=2, n_min=20, n_max=50)
        params, state = graph_met_init(jax.random.PRNGKey(2))
        outs = []
        for cap in (64, 256):
            batch = collate(events, buckets=(cap,))
            nbr = radius_graph(_etaphi(batch), batch.mask, r=0.4, k=16)
            w, _ = net_apply(params, state, batch, nbr, train=False)
            outs.append([np.asarray(w[i, : e[0].shape[0]])
                         for i, e in enumerate(events)])
        for a, b in zip(*outs):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_loss_padding_invariance(self):
        events = synthetic_events(3, seed=3, n_min=10, n_max=40)
        params, state = graph_met_init(jax.random.PRNGKey(3))
        losses = []
        for cap in (64, 128):
            batch = collate(events, buckets=(cap,))
            nbr = radius_graph(_etaphi(batch), batch.mask, r=0.4, k=16)
            w, _ = net_apply(params, state, batch, nbr, train=False)
            losses.append(float(loss_fn(w, batch)))
        assert abs(losses[0] - losses[1]) < 1e-3 * max(1.0, abs(losses[0]))


@pytest.mark.skipif(not osp.exists(REF_CKPT), reason="reference ckpt absent")
class TestGoldenParity:
    """Load the committed P100 checkpoint and compare the full forward pass
    against an independent numpy oracle on synthetic events (BASELINE
    configs 1-2: per-layer allclose-grade parity)."""

    def test_forward_matches_oracle(self):
        import torch
        from deepmetv2_tpu.compat import import_torch_checkpoint
        from tests.torch_oracle import graph_met_forward

        params, state, meta = import_torch_checkpoint(REF_CKPT)
        assert meta["epoch"] == 14
        assert len(params["convs"]) == 2

        ckpt = torch.load(REF_CKPT, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}

        events = synthetic_events(4, seed=7, n_min=30, n_max=120)
        batch = collate(events, buckets=(128,))
        nbr = radius_graph(_etaphi(batch), batch.mask, r=0.4, k=64)
        w, _ = net_apply(params, state, batch, nbr, train=False)

        for i, (x, y) in enumerate(events):
            n = x.shape[0]
            phi = np.arctan2(x[:, 1], x[:, 0])
            etaphi = np.stack([x[:, 3], phi], axis=1)
            neighbors = oracles.radius_neighbors(etaphi, 0.4, loop=True, max_k=64)
            want = graph_met_forward(
                sd, x[:, :8].astype(np.float32), x[:, 8:].astype(np.int64), neighbors
            )
            got = np.asarray(w[i, :n])
            np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)

    def test_met_and_loss_from_checkpoint(self):
        from deepmetv2_tpu.compat import import_torch_checkpoint

        params, state, _ = import_torch_checkpoint(REF_CKPT)
        events = synthetic_events(6, seed=8, n_min=50, n_max=200)
        batch = collate(events, buckets=(256,))
        nbr = radius_graph(_etaphi(batch), batch.mask, r=0.4, k=64)
        w, _ = net_apply(params, state, batch, nbr, train=False)
        metx, mety = weighted_met(w, batch)
        assert np.all(np.isfinite(np.asarray(metx)))
        loss = float(loss_fn(w, batch))
        assert np.isfinite(loss) and loss > 0
