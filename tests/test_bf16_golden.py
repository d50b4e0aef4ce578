"""bf16-trained flagship quality gate (VERDICT r4 #3: "bf16 as a trained
capability").

``ckpts_syn_bf16/`` is a full 100-epoch golden run with
``ModelConfig.compute_dtype='bfloat16'`` on the SAME 2000 synthetic
events / seed-42 split as the f32 run in ``ckpts_syn/`` (identical
reference-parity hyperparameters, no grad clipping).  The gate: the bf16
best checkpoint must match the f32 one — val loss within 2%, the
response curve within 1% everywhere, and the resolution curves within
15% at the median (high-qT bins have few synthetic events and are
statistics-dominated, so only the median is bounded).

Measured at training time (recorded for context): bf16 val best 1.0302
at epoch 59 vs f32 1.0320 at epoch 60 — parity, marginally better.  The
bf16 run then hit an unclipped-AdamW loss blow-up at epoch 63 and ended
with last >> best; the reference exhibits the same failure mode in its
own committed artifacts (znunu metrics_val_last 1516.5 vs best 141.5,
reference ckpts_znunu/), and the f32 run had equivalent spikes
(epochs 5-8) it happened to recover from.  --grad_clip 10 is the
production guard; it is off here for reference parity.
"""

import json
import os.path as osp

import numpy as np
import pytest

F32_DIR = "ckpts_syn"
BF16_DIR = "ckpts_syn_bf16"


pytestmark = pytest.mark.skipif(
    not (osp.exists(osp.join(F32_DIR, "best.resolutions"))
         and osp.exists(osp.join(BF16_DIR, "best.resolutions"))),
    reason="golden artifacts not present")


def test_val_best_within_2pct():
    f32 = json.load(open(osp.join(F32_DIR, "metrics_val_best.json")))
    bf = json.load(open(osp.join(BF16_DIR, "metrics_val_best.json")))
    assert abs(bf["loss"] - f32["loss"]) / f32["loss"] < 0.02


def test_bf16_config_recorded():
    cfg = json.load(open(osp.join(BF16_DIR, "config.json")))
    assert cfg["model"]["compute_dtype"] == "bfloat16"
    cfg32 = json.load(open(osp.join(F32_DIR, "config.json")))
    assert cfg32["model"]["compute_dtype"] == "float32"
    # same training recipe otherwise
    for sec in ("optim", "data"):
        assert cfg[sec] == cfg32[sec]


def test_resolution_curves_close():
    from deepmetv2_tpu.utils import artifacts

    f32 = artifacts.load(osp.join(F32_DIR, "best.resolutions"))
    bf = artifacts.load(osp.join(BF16_DIR, "best.resolutions"))
    for key, med_tol, max_tol in (
        ("u_perp_resolution", 0.15, None),
        ("u_par_resolution", 0.15, None),
        ("R", 0.01, 0.01),
    ):
        a = np.asarray(f32["MET"][key][0], float)
        b = np.asarray(bf["MET"][key][0], float)
        ok = np.isfinite(a) & np.isfinite(b) & (np.abs(a) > 1e-6)
        assert ok.sum() >= 10
        rel = np.abs(b[ok] - a[ok]) / np.abs(a[ok])
        assert np.median(rel) < med_tol, (key, np.median(rel))
        if max_tol is not None:
            assert rel.max() < max_tol, (key, rel.max())
