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
