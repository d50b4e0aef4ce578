"""Independent numpy oracle of the reference GraphMETNetwork forward pass.

Implements the published architecture (embeddings → encoders → BatchNorm →
residual EdgeConv('max') blocks → MLP head → sigmoid) directly from its
mathematical definition over a raw state_dict, with an explicit Python edge
loop — no PyG, no JAX — as an independent check on models/graph_met.py.
"""

from __future__ import annotations

import numpy as np


def _elu(x):
    return np.where(x > 0, x, np.exp(np.minimum(x, 0)) - 1.0)


def _lin(sd, p, x):
    return x @ sd[f"{p}.weight"].T + sd[f"{p}.bias"]


def _bn_eval(sd, p, x, eps=1e-5):
    mean = sd[f"{p}.running_mean"]
    var = sd[f"{p}.running_var"]
    return (x - mean) / np.sqrt(var + eps) * sd[f"{p}.weight"] + sd[f"{p}.bias"]


def graph_met_forward(
    sd: dict,
    x_cont: np.ndarray,     # [N, 8]
    x_cat: np.ndarray,      # [N, 3] int
    neighbors,              # list of neighbor index lists (incoming, j -> i)
    pdgs=(1, 2, 11, 13, 22, 130, 211),
) -> np.ndarray:
    """Eval-mode forward (BatchNorm running stats) → sigmoid weights [N]."""
    g = "graphnet"
    emb_cont = _elu(_lin(sd, f"{g}.embed_continuous.0", x_cont))
    emb_chrg = sd[f"{g}.embed_charge.weight"][x_cat[:, 1] + 1]
    emb_pv = sd[f"{g}.embed_pv.weight"][x_cat[:, 2]]

    pdg = np.abs(x_cat[:, 0]).copy()
    for i, v in enumerate(pdgs):
        pdg = np.where(pdg == v, i, pdg)
    emb_pdg = sd[f"{g}.embed_pdgid.weight"][pdg]

    emb_cat = _elu(_lin(sd, f"{g}.embed_categorical.0",
                        np.concatenate([emb_chrg, emb_pdg, emb_pv], axis=1)))
    enc = _elu(_lin(sd, f"{g}.encode_all.0",
                    np.concatenate([emb_cat, emb_cont], axis=1)))
    emb = _bn_eval(sd, f"{g}.bn_all", enc)

    d = 0
    while f"{g}.conv_continuous.{d}.0.nn.0.weight" in sd:
        w = sd[f"{g}.conv_continuous.{d}.0.nn.0.weight"]  # [H, 2H]
        b = sd[f"{g}.conv_continuous.{d}.0.nn.0.bias"]
        n, h = emb.shape
        conv = np.zeros((n, h), emb.dtype)
        for i in range(n):
            js = neighbors[i]
            if not js:
                continue
            msgs = [np.concatenate([emb[i], emb[j] - emb[i]]) @ w.T + b for j in js]
            conv[i] = np.max(np.stack(msgs), axis=0)
        emb = emb + _bn_eval(sd, f"{g}.conv_continuous.{d}.1", conv)
        d += 1

    out = _lin(sd, f"{g}.output.2", _elu(_lin(sd, f"{g}.output.0", emb)))
    return 1.0 / (1.0 + np.exp(-out[:, 0]))
