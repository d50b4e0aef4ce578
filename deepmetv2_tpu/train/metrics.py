"""Evaluation metrics — hadronic-recoil resolution/response.

Re-implements reference model/net.py:92-157 (``resolution``) and the qT
binning + quantile machinery of evaluate.py:112-156.  The per-event vector
algebra runs on device (jit); the binned quantile summary runs host-side in
numpy on accumulated arrays, exactly as the reference does.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
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
    return resolution_from_met(_neg_weighted_met(weights, batch), batch)


@jax.jit
def _neg_weighted_met(weights, batch):
    metx, mety = weighted_met(weights, batch)
    return -jnp.stack([metx, mety], axis=1)


def _baseline_keys(has_deepmet: bool):
    return [n for n in _BASELINES
            if has_deepmet or not n.startswith("deepMET")]


@functools.partial(jax.jit, static_argnames=("has_deepmet",))
def _decompose_all(v_met: jnp.ndarray, y: jnp.ndarray, has_deepmet: bool):
    """[1 + n_baselines, 3, B] stack of (u_perp, u_par, response) plus qT —
    a single device array, so the host fetches ONE buffer per batch (the
    per-quantity transfers were latency-bound through remote-device links).
    """
    v_qt = jnp.stack([y[:, 0], y[:, 1]], axis=1)
    rows = [jnp.stack(_decompose(v_met, v_qt), axis=0)]
    for name in _baseline_keys(has_deepmet):
        cx, cy = _BASELINES[name]
        vb = jnp.stack([y[:, cx], y[:, cy]], axis=1)
        rows.append(jnp.stack(_decompose(vb, v_qt), axis=0))
    qt = jnp.sqrt(y[:, 0] ** 2 + y[:, 1] ** 2)
    return jnp.stack(rows, axis=0), qt


def resolution_from_met(
    v_met: jnp.ndarray, batch: EventBatch
) -> Tuple[Dict[str, List[np.ndarray]], np.ndarray]:
    """Same summary from a direct cartesian MET estimate [B, 2] (the DRN
    head, or any external estimator)."""
    has_deepmet = bool(batch.y.shape[1] > 6)
    arr, qt = _decompose_all(v_met, batch.y, has_deepmet)
    return finalize_resolutions([arr], [qt], [batch.num_valid], has_deepmet)


def finalize_resolutions(arrs, qts, num_valids, has_deepmet: bool
                         ) -> Tuple[Dict[str, List[np.ndarray]], np.ndarray]:
    """Concatenate per-batch device stacks from :func:`_decompose_all` and
    fetch them in ONE device→host transfer (evaluation loops accumulate
    device arrays batch-by-batch with no host sync, then finalize once —
    per-batch fetches are round-trip-bound on remote-device links)."""
    arr = np.asarray(jnp.concatenate(arrs, axis=2))   # [K, 3, ΣB]
    qt = np.asarray(jnp.concatenate(qts))
    # skip batch-padding empty events
    ev = np.asarray(jnp.concatenate([jnp.asarray(v) for v in num_valids])) > 0
    keys = ["MET"] + _baseline_keys(has_deepmet)
    out: Dict[str, List[np.ndarray]] = {
        key: [arr[k, 0][ev], arr[k, 1][ev], arr[k, 2][ev]]
        for k, key in enumerate(keys)
    }
    return out, qt[ev]


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
