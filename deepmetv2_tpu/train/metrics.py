"""Evaluation metrics — hadronic-recoil resolution/response.

Re-implements reference model/net.py:92-157 (``resolution``) and the qT
binning + quantile machinery of evaluate.py:112-156.  The per-event vector
algebra runs on device (jit); the binned quantile summary runs host-side in
numpy on accumulated arrays, exactly as the reference does.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from deepmetv2_tpu.data.batching import EventBatch
from deepmetv2_tpu.train.loss import weighted_met

# Baseline MET flavors read from the target vector y
# (reference model/net.py:101-124): column pairs in y.
_BASELINES = {
    "pfMET": (2, 3),
    "puppiMET": (4, 5),
    "deepMETResponse": (6, 7),
    "deepMETResolution": (8, 9),
}


def _decompose(vec: jnp.ndarray, v_qt: jnp.ndarray):
    """u_perp, u_par, response of a MET estimate against the truth qT
    (reference model/net.py:138-144)."""
    dot = jnp.einsum("bi,bi->b", vec, v_qt)
    qt2 = jnp.einsum("bi,bi->b", v_qt, v_qt)
    response = dot / qt2
    v_par = response[:, None] * v_qt
    u_par = jnp.sqrt(jnp.einsum("bi,bi->b", v_par, v_par)) - jnp.sqrt(qt2)
    v_perp = vec - v_par
    u_perp = jnp.sqrt(jnp.einsum("bi,bi->b", v_perp, v_perp))
    return u_perp, u_par, response


def resolution(
    weights: jnp.ndarray, batch: EventBatch
) -> Tuple[Dict[str, List[np.ndarray]], np.ndarray]:
    """Per-event [u_perp, u_par, response] for the weight-model MET and
    each baseline MET present in y, plus the event qT
    (reference model/net.py:92-157).  Returns numpy host arrays."""
    metx, mety = weighted_met(weights, batch)
    return resolution_from_met(-jnp.stack([metx, mety], axis=1), batch)


def resolution_from_met(
    v_met: jnp.ndarray, batch: EventBatch
) -> Tuple[Dict[str, List[np.ndarray]], np.ndarray]:
    """Same summary from a direct cartesian MET estimate [B, 2] (the DRN
    head, or any external estimator)."""
    y = batch.y
    v_qt = jnp.stack([y[:, 0], y[:, 1]], axis=1)

    ev = np.asarray(batch.num_valid) > 0  # skip batch-padding empty events

    out: Dict[str, List[np.ndarray]] = {}
    u_perp, u_par, resp = _decompose(v_met, v_qt)
    out["MET"] = [np.asarray(u_perp)[ev], np.asarray(u_par)[ev],
                  np.asarray(resp)[ev]]

    has_deepmet = y.shape[1] > 6
    for name, (cx, cy) in _BASELINES.items():
        if name.startswith("deepMET") and not has_deepmet:
            continue
        vb = jnp.stack([y[:, cx], y[:, cy]], axis=1)
        u_perp, u_par, resp = _decompose(vb, v_qt)
        out[name] = [np.asarray(u_perp)[ev], np.asarray(u_par)[ev],
                     np.asarray(resp)[ev]]

    qt = np.asarray(jnp.sqrt(y[:, 0] ** 2 + y[:, 1] ** 2))[ev]
    return out, qt


def resolution_histograms(
    resolutions_arr: Dict[str, List[np.ndarray]],
    qt_arr: np.ndarray,
    max_qt: float = 400.0,
    bin_width: float = 10.0,
    hist_bins: int = 40,
) -> Dict[str, Dict[str, Tuple[np.ndarray, np.ndarray]]]:
    """qT-binned quantile resolutions (reference evaluate.py:110-156).

    For each MET flavor: per 10-GeV qT bin, resolution = (q84 − q16)/2 of
    u_perp and u_par (raw and response-scaled) and mean response; packed as
    ``np.histogram``-style (weights, edges) tuples — the exact on-disk
    contract of the reference ``.resolutions`` artifacts.
    """
    bin_edges = np.arange(0, max_qt, bin_width)
    inds = np.digitize(qt_arr, bin_edges)
    qt_centers = [(bin_edges[i] + bin_edges[i - 1]) / 2.0
                  for i in range(1, len(bin_edges))]

    hists: Dict[str, Dict[str, Tuple[np.ndarray, np.ndarray]]] = {}
    for key, (u_perp_arr, u_par_arr, r_arr) in resolutions_arr.items():
        u_perp_hist, u_perp_scaled_hist = [], []
        u_par_hist, u_par_scaled_hist, r_hist = [], [], []
        for i in range(1, len(bin_edges)):
            sel = np.where(inds == i)[0]
            r_i = r_arr[sel]
            r_mean = np.mean(r_i) if len(sel) else np.nan
            r_hist.append(r_mean)

            def q68(a):
                if len(a) == 0:
                    return np.nan
                return (np.quantile(a, 0.84) - np.quantile(a, 0.16)) / 2.0

            u_perp_i = u_perp_arr[sel]
            u_par_i = u_par_arr[sel]
            u_perp_hist.append(q68(u_perp_i))
            u_perp_scaled_hist.append(q68(u_perp_i / r_mean) if len(sel) else np.nan)
            u_par_hist.append(q68(u_par_i))
            u_par_scaled_hist.append(q68(u_par_i / r_mean) if len(sel) else np.nan)

        def hist(weights):
            return np.histogram(qt_centers, bins=hist_bins, range=(0, max_qt),
                                weights=weights)

        hists[key] = {
            "u_perp_resolution": hist(u_perp_hist),
            "u_perp_scaled_resolution": hist(u_perp_scaled_hist),
            "u_par_resolution": hist(u_par_hist),
            "u_par_scaled_resolution": hist(u_par_scaled_hist),
            "R": hist(r_hist),
        }
    return hists
