"""Data layer tests: ingest semantics, collation, split parity, loaders."""

import numpy as np
import pytest

from deepmetv2_tpu.data import (
    EventBatch,
    METDataset,
    collate,
    event_from_raw,
    fetch_dataloader,
    load_npz_events,
    synthetic_events,
)
from deepmetv2_tpu.data.batching import bucket_for
from deepmetv2_tpu.data.synthetic import synthetic_npz


class TestIngest:
    def test_event_from_raw_layout(self):
        # raw order: pt, eta, phi, d0, dz, mass, puppi, pdg, charge, fromPV,
        # pvRef, pvAssocQuality  (reference model/data_loader.py:66-77)
        raw = np.zeros((12, 4), np.float32)
        raw[0] = [10.0, 5.0, 2.0, 1.0]          # pt
        raw[1] = [0.5, -1.0, 2.2, 0.0]          # eta
        raw[2] = [0.0, np.pi / 2, np.pi, 1.0]   # phi
        raw[3] = 0.01                            # d0
        raw[4] = 0.02                            # dz
        raw[5] = 0.14                            # mass
        raw[6] = [1.0, 0.0, 0.5, 1.0]           # puppi
        raw[7] = [211, -211, 22, 130]           # pdg
        raw[8] = [1, -1, 0, 0]                  # charge
        raw[9] = [3, 0, 1, 2]                   # fromPV
        x = event_from_raw(raw)
        assert x.shape == (4, 11)
        np.testing.assert_allclose(x[:, 0], raw[0] * np.cos(raw[2]), rtol=1e-6)
        np.testing.assert_allclose(x[:, 1], raw[0] * np.sin(raw[2]), rtol=1e-6)
        np.testing.assert_allclose(x[:, 2], raw[0])
        np.testing.assert_allclose(x[:, 3], raw[1])
        np.testing.assert_allclose(x[:, 8], raw[7])   # pdg
        np.testing.assert_allclose(x[:, 9], raw[8])   # charge
        np.testing.assert_allclose(x[:, 10], raw[9])  # fromPV

    def test_pad_rows_dropped(self):
        raw = np.zeros((12, 5), np.float32)
        raw[0] = 1.0
        raw[7] = [211, -999, 22, -999, 11]
        raw[8] = [1, -999, 0, -999, -1]
        x = event_from_raw(raw)
        assert x.shape[0] == 3
        assert set(x[:, 8].astype(int)) == {211, 22, 11}

    def test_nan_and_clip(self):
        raw = np.zeros((12, 1), np.float32)
        raw[0] = 1e9       # pt -> px clipped to 5000
        raw[4] = np.nan    # dz -> 0
        raw[7] = 211
        raw[8] = 1
        x = event_from_raw(raw)
        assert x[0, 0] == 5000.0
        assert x[0, 5] == 0.0

    def test_npz_roundtrip(self, tmp_path):
        p = str(tmp_path / "slice0.npz")
        synthetic_npz(p, n_events=5, seed=3)
        events = list(load_npz_events(p))
        assert len(events) == 5
        direct = synthetic_events(5, seed=3)
        for (x1, y1), (x2, y2) in zip(events, direct):
            assert x1.shape[0] == x2.shape[0]
            np.testing.assert_allclose(x1[:, 2], x2[:, 2], rtol=1e-5)   # pt
            np.testing.assert_allclose(x1[:, 8], x2[:, 8])              # pdg
            np.testing.assert_allclose(y1, y2, rtol=1e-6)


class TestCollate:
    def test_padding_and_mask(self):
        evts = synthetic_events(3, seed=0, n_min=10, n_max=50)
        b = collate(evts, buckets=(64, 128))
        assert b.x_cont.shape == (3, 64, 8)
        assert b.x_cat.shape == (3, 64, 3)
        for i, (x, y) in enumerate(evts):
            n = x.shape[0]
            assert int(b.num_valid[i]) == n
            assert bool(np.all(np.asarray(b.mask[i, :n])))
            assert not bool(np.any(np.asarray(b.mask[i, n:])))
            np.testing.assert_allclose(np.asarray(b.x_cont[i, :n]), x[:, :8], rtol=1e-6)
            np.testing.assert_allclose(np.asarray(b.x_cat[i, :n]), x[:, 8:].astype(np.int32))
            np.testing.assert_allclose(np.asarray(b.y[i]), y, rtol=1e-6)

    def test_bucket_for(self):
        assert bucket_for(100, (128, 256)) == 128
        assert bucket_for(129, (128, 256)) == 256
        assert bucket_for(9999, (128, 256)) == 256  # truncation cap


class TestLoader:
    def test_split_matches_torch_random_split(self):
        torch = pytest.importorskip("torch")
        events = synthetic_events(20, seed=1, n_min=5, n_max=20)
        dls = fetch_dataloader(events=events, batch_size=4, validation_split=0.2)
        # reproduce the reference split (model/data_loader.py:103-104)
        torch.manual_seed(42)
        perm = torch.randperm(20).numpy()
        want_train, want_val = perm[:16], perm[16:]
        got_train = np.concatenate([b for b in [bi for bi in dls["train"]._batches]])
        got_val = np.concatenate([b for b in dls["test"]._batches])
        np.testing.assert_array_equal(np.sort(got_train), np.sort(want_train))
        np.testing.assert_array_equal(got_val, want_val)

    def test_sequential_batches(self):
        events = synthetic_events(10, seed=2, n_min=5, n_max=30)
        dls = fetch_dataloader(events=events, batch_size=4, validation_split=0.0)
        batches = list(dls["train"])
        assert len(batches) == 3
        assert batches[0].batch_size == 4
        # final partial batch is padded to full size with empty events
        assert batches[2].batch_size == 4
        assert int(np.sum(np.asarray(batches[2].num_valid) > 0)) == 2

    def test_bucketed_mode_groups_by_size(self):
        events = synthetic_events(12, seed=3, n_min=10, n_max=500)
        dls = fetch_dataloader(events=events, batch_size=4, validation_split=0.0,
                               mode="bucketed", buckets=(64, 512))
        sizes = {b.max_nodes for b in dls["train"]}
        assert sizes <= {64, 512}

    def test_dataset_from_npz_dir(self, tmp_path):
        raw = tmp_path / "raw"
        raw.mkdir()
        synthetic_npz(str(raw / "s0.npz"), 4, seed=5)
        synthetic_npz(str(raw / "s1.npz"), 3, seed=6)
        ds = METDataset(data_dir=str(tmp_path))
        assert len(ds) == 7


class TestPresort:
    """Host-side eta presort (loader presort_eta + graph.presorted)."""

    def test_presort_batch_matches_device_sort(self):
        from deepmetv2_tpu.data.loader import fetch_dataloader
        from deepmetv2_tpu.data.sorting import presort_batch, sort_by_eta

        events = synthetic_events(8, seed=11)
        b = collate(events, buckets=(256,))
        host = presort_batch(b)
        dev, _ = sort_by_eta(b)
        for a, c in zip(host, dev):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c))

    def test_presorted_config_same_loss(self):
        """A presorting loader + presorted config computes the same loss
        (and same trained params after a step) as the sorting step."""
        import dataclasses

        import jax

        from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
        from deepmetv2_tpu.data.loader import fetch_dataloader
        from deepmetv2_tpu.models import graph_met_init
        from deepmetv2_tpu.train.step import (init_train_state,
                                              make_eval_step,
                                              make_train_step)

        events = synthetic_events(6, seed=3)
        base = dict(batch_size=6, validation_split=0.0, buckets=(256,))
        plain = fetch_dataloader(events=events, **base)["train"]
        sorted_ = fetch_dataloader(events=events, presort_eta=True,
                                   **base)["train"]
        cfg = Config(graph=GraphConfig(mode="window", window_halo=64),
                     data=DataConfig(batch_size=6, node_buckets=(256,)))
        cfg_pre = dataclasses.replace(
            cfg, graph=dataclasses.replace(cfg.graph, presorted=True))

        # two independent inits (same key): the train step donates its
        # state, so the two states must not alias buffers
        s1 = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
        s2 = init_train_state(*graph_met_init(jax.random.PRNGKey(0)),
                              cfg_pre)
        (b1,) = list(plain)
        (b2,) = list(sorted_)
        s1, l1 = make_train_step(cfg)(s1, b1)
        s2, l2 = make_train_step(cfg_pre)(s2, b2)
        assert abs(float(l1) - float(l2)) < 1e-5 * max(1.0, abs(float(l1)))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                    atol=1e-6),
            s1.params, s2.params)

        w1, el1, _ = make_eval_step(cfg)(s1.params, s1.bn_state, b1)
        w2, el2, _ = make_eval_step(cfg_pre)(s2.params, s2.bn_state, b2)
        assert abs(float(el1) - float(el2)) < 1e-5 * max(1.0, abs(float(el1)))
        # per-event weight multisets agree (order differs by the presort)
        np.testing.assert_allclose(np.sort(np.asarray(w1), axis=1),
                                   np.sort(np.asarray(w2), axis=1),
                                   rtol=1e-5, atol=1e-6)

    def test_collate_is_host_resident(self):
        """Loader batches are numpy (host) — the memoized cache must never
        pin the dataset in device memory (prefetch_to_device stages it)."""
        b = collate(synthetic_events(3, seed=5), buckets=(128,))
        for leaf in b:
            assert isinstance(leaf, np.ndarray), type(leaf)

    def test_cell_mode_loader_same_loss(self):
        """Cell-sorted loader + presorted config: same loss/params as the
        device-sorting eta path (order only changes performance)."""
        import dataclasses

        import jax

        from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
        from deepmetv2_tpu.data.loader import fetch_dataloader
        from deepmetv2_tpu.models import graph_met_init
        from deepmetv2_tpu.train.step import (init_train_state,
                                              make_train_step)

        events = synthetic_events(6, seed=9)
        base = dict(batch_size=6, validation_split=0.0, buckets=(256,))
        plain = fetch_dataloader(events=events, **base)["train"]
        cell = fetch_dataloader(events=events, presort_eta=True,
                                presort_mode="cell", **base)["train"]
        halo = cell.required_halo(0.4)
        halo = max(64, -(-halo // 64) * 64)
        cfg = Config(graph=GraphConfig(mode="window", window_halo=halo),
                     data=DataConfig(batch_size=6, node_buckets=(256,)))
        cfg_pre = dataclasses.replace(
            cfg, graph=dataclasses.replace(cfg.graph, presorted=True))

        s1 = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
        s2 = init_train_state(*graph_met_init(jax.random.PRNGKey(0)),
                              cfg_pre)
        (b1,) = list(plain)
        (b2,) = list(cell)
        s1, l1 = make_train_step(cfg)(s1, b1)
        s2, l2 = make_train_step(cfg_pre)(s2, b2)
        assert abs(float(l1) - float(l2)) < 1e-5 * max(1.0, abs(float(l1)))
        # Post-Adam params: fp reduction order differs between row orders,
        # and Adam's first step is ~lr*sign(g), so a near-zero grad whose
        # fp-noise-level sign flips moves the param by up to 2*lr — that is
        # the right bound here, not a kernel-accuracy statement (kernel
        # parity at 1e-5 on identical orders is tests/test_window.py's job).
        lr = cfg.optim.lr
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                    atol=2.05 * lr),
            s1.params, s2.params)
