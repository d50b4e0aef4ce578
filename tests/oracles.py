"""Independent numpy oracles for kernel unit tests.

Written directly from the mathematical definitions (EdgeConv: Wang et al.,
"Dynamic Graph CNN"; radius/kNN graphs: brute force) — NOT ports of any
library — so they are an independent check on the JAX implementations.
"""

from __future__ import annotations

import numpy as np


def radius_neighbors(pos: np.ndarray, r: float, loop: bool = True,
                     max_k: int | None = None):
    """Brute-force radius neighbor sets for one event.  Returns a list of
    sorted neighbor index lists (nearest-first when capped)."""
    n = pos.shape[0]
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    out = []
    for i in range(n):
        js = [j for j in range(n) if d2[i, j] < r * r and (loop or j != i)]
        js.sort(key=lambda j: (d2[i, j], j))
        if max_k is not None:
            js = js[:max_k]
        out.append(js)
    return out


def knn_neighbors(x: np.ndarray, k: int, loop: bool = False):
    n = x.shape[0]
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    out = []
    for i in range(n):
        js = [j for j in range(n) if loop or j != i]
        js.sort(key=lambda j: (d2[i, j], j))
        out.append(js[:k])
    return out


def edgeconv(x: np.ndarray, neighbors, weight: np.ndarray, bias: np.ndarray,
             aggr: str = "max", mlp=None):
    """EdgeConv out_i = aggr_j MLP([x_i || x_j - x_i]).  ``neighbors`` is a
    list of index lists; ``mlp`` overrides the default single Linear."""
    n, h = x.shape
    outs = []
    for i in range(n):
        js = neighbors[i]
        if not js:
            out_dim = bias.shape[0] if mlp is None else mlp(np.zeros((1, 2 * h))).shape[-1]
            outs.append(np.zeros(out_dim))
            continue
        msgs = []
        for j in js:
            e = np.concatenate([x[i], x[j] - x[i]])
            msgs.append(e @ weight + bias if mlp is None else mlp(e[None])[0])
        msgs = np.stack(msgs)
        if aggr == "max":
            outs.append(msgs.max(0))
        elif aggr == "sum":
            outs.append(msgs.sum(0))
        elif aggr == "mean":
            outs.append(msgs.mean(0))
        else:
            raise ValueError(aggr)
    return np.stack(outs)


def segment_sum(values: np.ndarray, seg_ids: np.ndarray, num_segments: int):
    out = np.zeros((num_segments,) + values.shape[1:], dtype=values.dtype)
    for v, s in zip(values, seg_ids):
        out[s] += v
    return out


def _elu(x):
    return np.where(x > 0, x, np.exp(np.minimum(x, 0)) - 1.0)


def drn_conv(x_batch, neighbors_batch, w0, b0, w1, b1, gamma, beta,
             running_mean, running_var, aggr="add", train=True,
             momentum=0.1, eps=1e-5):
    """Edge-loop oracle of the DRN conv block (reference
    model/dynamic_reduction_network.py:61-79): per edge (j -> i)

        m = ELU(ELU([x_i || x_j - x_i] @ w0 + b0) @ w1 + b1)

    then BatchNorm1d over the whole [E, H] message matrix (batch stats in
    train mode, with the torch momentum/unbiased-var running update),
    then per-node aggregation (add/max/mean; empty neighborhood -> 0).

    ``x_batch``: list of [N_b, H] arrays; ``neighbors_batch``: matching
    list of per-node neighbor index lists.  Weights are [in, out].
    Returns (list of [N_b, H_out] outputs, new_running_mean,
    new_running_var).
    """
    edges = []   # (event, node) per message, in emission order
    msgs = []
    for b, (x, neighbors) in enumerate(zip(x_batch, neighbors_batch)):
        for i, js in enumerate(neighbors):
            for j in js:
                e = np.concatenate([x[i], x[j] - x[i]])
                m = _elu(_elu(e @ w0 + b0) @ w1 + b1)
                edges.append((b, i))
                msgs.append(m)
    M = np.stack(msgs).astype(np.float64)
    if train:
        mean = M.mean(0)
        var = M.var(0)                       # biased, used to normalize
        n = M.shape[0]
        unbiased = var * n / max(n - 1, 1)   # torch running update
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    Mn = (M - mean) / np.sqrt(var + eps) * gamma + beta

    outs = []
    h_out = Mn.shape[-1]
    for b, x in enumerate(x_batch):
        out = np.zeros((x.shape[0], h_out))
        groups = [[] for _ in range(x.shape[0])]
        for (eb, i), m in zip(edges, Mn):
            if eb == b:
                groups[i].append(m)
        for i, g in enumerate(groups):
            if not g:
                continue
            g = np.stack(g)
            if aggr == "add":
                out[i] = g.sum(0)
            elif aggr == "max":
                out[i] = g.max(0)
            elif aggr == "mean":
                out[i] = g.mean(0)
            else:
                raise ValueError(aggr)
        outs.append(out)
    return outs, new_mean, new_var
