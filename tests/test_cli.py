"""CLI-level end-to-end tests: ``cli.train.main`` / ``cli.evaluate.main``
from npz files on disk to artifacts on disk (VERDICT r4 #6 — previously
only the library ``fit()`` path was exercised, so flag plumbing could rot
silently).

The artifact contract asserted here is the reference's
(train.py:110-143, evaluate.py:219): {best,last}.ckpt, loss.log,
metrics_val_{best,last}.json, {best,last}.resolutions, plus this repo's
config.json."""

import os.path as osp

import numpy as np
import pytest

from deepmetv2_tpu.data.synthetic import synthetic_events
from deepmetv2_tpu.utils import artifacts


def _write_npz_slice(events, path):
    """Pack derived-layout events back into the ETL's raw slice layout
    (``x [12, n_events, n_max]`` padded with -999, ``y [n_events, 11]`` —
    reference data_znunu/generate_npz.py:131-146) so the CLIs ingest from
    disk exactly as they would real ETL output."""
    nmax = max(x.shape[0] for x, _ in events)
    nev = len(events)
    raw = np.full((12, nev, nmax), -999.0, dtype=np.float32)
    ys = np.zeros((nev, 11), np.float32)
    for e, (x, y) in enumerate(events):
        n = x.shape[0]
        raw[0, e, :n] = x[:, 2]                  # pt
        raw[1, e, :n] = x[:, 3]                  # eta
        raw[2, e, :n] = np.arctan2(x[:, 1], x[:, 0])   # phi
        raw[3:10, e, :n] = x[:, 4:11].T          # d0..fromPV
        raw[10:12, e, :n] = 0.0                  # pvRef, pvAssocQuality
        ys[e] = np.asarray(y, np.float32)[:11]
    np.savez(path, x=raw, y=ys)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npz_data")
    events = synthetic_events(24, seed=21, n_min=8, n_max=60)
    _write_npz_slice(events[:12], d / "slice_0.npz")
    _write_npz_slice(events[12:], d / "slice_1.npz")
    return str(d)


TRAIN_ARTIFACTS = {"best.ckpt", "last.ckpt", "loss.log", "config.json",
                   "metrics_val_best.json", "metrics_val_last.json",
                   "best.resolutions", "last.resolutions"}


def _assert_artifact_set(ck):
    missing = {a for a in TRAIN_ARTIFACTS if not osp.exists(osp.join(ck, a))}
    assert not missing, f"missing artifacts: {missing}"
    lines = open(osp.join(ck, "loss.log")).read().splitlines()
    assert lines[1] == "epoch, loss, val_loss"
    res = artifacts.load(osp.join(ck, "best.resolutions"))
    assert isinstance(res, dict) and res


class TestTrainCli:
    def test_npz_to_artifacts(self, data_dir, tmp_path):
        from deepmetv2_tpu.cli.train import main

        ck = str(tmp_path / "ck")
        rc = main(["--data", data_dir, "--ckpts", ck,
                   "--epochs", "2", "--batch_size", "4"])
        assert rc == 0
        _assert_artifact_set(ck)
        assert len(open(osp.join(ck, "loss.log")).read().splitlines()) == 4

    def test_mesh_2x1(self, data_dir, tmp_path):
        """--mesh 2x1: data-parallel fit over 2 virtual CPU devices."""
        from deepmetv2_tpu.cli.train import main

        ck = str(tmp_path / "ck_mesh")
        rc = main(["--data", data_dir, "--ckpts", ck,
                   "--epochs", "1", "--batch_size", "4", "--mesh", "2x1"])
        assert rc == 0
        _assert_artifact_set(ck)

    def test_drn_model(self, data_dir, tmp_path):
        from deepmetv2_tpu.cli.train import main

        ck = str(tmp_path / "ck_drn")
        rc = main(["--data", data_dir, "--ckpts", ck, "--model", "drn",
                   "--drn_head", "cartesian", "--epochs", "1",
                   "--batch_size", "4"])
        assert rc == 0
        _assert_artifact_set(ck)

    def test_from_torch_warm_start(self, data_dir, tmp_path):
        """--from_torch: warm-start training from the reference's committed
        P100 checkpoint (compat/torch_import.py)."""
        ref = "/root/reference/ckpts_dytt/best.pth.tar"
        if not osp.exists(ref):
            pytest.skip("reference checkpoint not present")
        from deepmetv2_tpu.cli.train import main

        ck = str(tmp_path / "ck_torch")
        rc = main(["--data", data_dir, "--ckpts", ck, "--from_torch", ref,
                   "--epochs", "1", "--batch_size", "4"])
        assert rc == 0
        _assert_artifact_set(ck)

    def test_bad_mesh_spec_exits(self, data_dir):
        from deepmetv2_tpu.cli.train import main

        with pytest.raises(SystemExit):
            main(["--data", data_dir, "--mesh", "4x"])


class TestEvaluateCli:
    def test_npz_to_resolutions(self, data_dir, tmp_path):
        """Train 1 epoch, then standalone evaluate re-reads the checkpoint
        and writes <restore>.resolutions (reference evaluate.py:219)."""
        from deepmetv2_tpu.cli.evaluate import main as eval_main
        from deepmetv2_tpu.cli.train import main as train_main

        ck = str(tmp_path / "ck")
        assert train_main(["--data", data_dir, "--ckpts", ck,
                           "--epochs", "1", "--batch_size", "4"]) == 0
        res_path = osp.join(ck, "last.resolutions")
        import os
        os.remove(res_path)
        rc = eval_main(["--data", data_dir, "--ckpts", ck,
                        "--restore_file", "last", "--batch_size", "8"])
        assert rc == 0
        res = artifacts.load(res_path)
        assert isinstance(res, dict) and res

    def test_plot_cli_from_resolutions(self, data_dir, tmp_path):
        """plot CLI renders the five reference-figure PNGs from a
        .resolutions artifact (reference plt.py:39-107)."""
        from deepmetv2_tpu.cli.plot import main as plot_main
        from deepmetv2_tpu.cli.train import main as train_main

        ck = str(tmp_path / "ck_plot")
        assert train_main(["--data", data_dir, "--ckpts", ck,
                           "--epochs", "1", "--batch_size", "4"]) == 0
        assert plot_main(["--ckpts", ck, "--restore_file", "best"]) == 0
        import glob
        assert len(glob.glob(osp.join(ck, "best_*.png"))) == 5

    def test_plot_weight_cli(self, data_dir, tmp_path):
        """plot_weight CLI: weight diagnostics from npz on disk to
        weight.plt + PNGs (reference plt_weight.py)."""
        from deepmetv2_tpu.cli.plot_weight import main as pw_main

        ck = str(tmp_path / "ck_pw")
        rc = pw_main(["--data", data_dir, "--ckpts", ck,
                      "--batch_size", "8"])
        assert rc == 0
        assert osp.exists(osp.join(ck, "weight.plt"))
        res = artifacts.load(osp.join(ck, "weight.plt"))
        assert isinstance(res, dict) and res

    def test_from_torch(self, data_dir, tmp_path):
        """Evaluate the reference .pth.tar directly (importer + eval step)."""
        ref = "/root/reference/ckpts_dytt/best.pth.tar"
        if not osp.exists(ref):
            pytest.skip("reference checkpoint not present")
        from deepmetv2_tpu.cli.evaluate import main as eval_main

        ck = str(tmp_path / "ck_torch_eval")
        rc = eval_main(["--data", data_dir, "--ckpts", ck,
                        "--from_torch", ref, "--batch_size", "8",
                        "--restore_file", "best"])
        assert rc == 0
        res = artifacts.load(osp.join(ck, "best.resolutions"))
        assert isinstance(res, dict) and res
