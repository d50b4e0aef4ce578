"""EdgeConv — the framework's centerpiece message-passing op.

Reference semantics (PyG ``EdgeConv``, used at
model/graph_met_network.py:38 and model/dynamic_reduction_network.py:72-73):

    out_i = aggr_{j in N(i)} MLP([x_i ‖ x_j − x_i])

with aggr = 'max' (GraphMETNetwork) or ctor-param (DRN).  The reference
runs this as gather → concat → per-edge GEMM → scatter over a COO edge
list — a CUDA-extension pipeline.

TPU-first redesign, two tiers:

**Tier 1 — linear edge-MLP (the flagship path).**  GraphMETNetwork's edge
MLP is a single ``Linear(2H → H)`` (model/graph_met_network.py:36).  Split
its weight ``W = [W_self; W_diff]`` over the concat:

    MLP([x_i ‖ x_j − x_i]) = x_i (W_self − W_diff) + x_j W_diff + b
                           = a_i + c_j

The message is a rank-1 sum of a per-target and a per-source term, so the
aggregation factors *exactly*:

    max_j (a_i + c_j) = a_i + max_{j∈N(i)} c_j          (elementwise)
    sum_j (a_i + c_j) = deg_i · a_i + sum_j c_j
    mean_j(a_i + c_j) = a_i + mean_j c_j

This removes the per-edge GEMM entirely: two node-level ``[N,H]×[H,H]``
GEMMs (MXU, batched) + one gather-reduce.  FLOPs drop from
``O(E · 2H · H)`` to ``O(N · 2H · H)`` — a factor ~K (=256) versus the
reference's design, and the gather-reduce is the only irregular op left.

**Tier 2 — arbitrary edge-MLP** (DRN's 2-layer ELU MLP,
model/dynamic_reduction_network.py:61-72): true gather-concat-MLP-reduce,
materialized per node-tile to bound memory.  This tier stays in XLA —
the DRN's measured hot spots are its per-round GRAPH BUILD and matching,
which run as Pallas kernels / dense formulations (ops/pallas/knn_und.py,
ops/dyn_graph.py); the production DRN conv additionally factors the
first MLP layer into node-level GEMMs (models/drn._drn_edgeconv).
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax
import jax.numpy as jnp

from deepmetv2_tpu.data.batching import Neighborhood
from deepmetv2_tpu.ops.segment import Reduction, gather_neighbors, neighbor_reduce
from deepmetv2_tpu.ops.window import WindowGraph, window_edgeconv_linear

Graph = Union[Neighborhood, WindowGraph]


def _on_tpu() -> bool:
    """True only on an actual TPU backend: the Pallas window kernel is
    Mosaic/TPU-specific, so any other backend (CPU tests, GPU) must take
    the portable XLA formulation."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def edgeconv(
    x: jnp.ndarray,
    graph: Graph,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    reduction: Reduction = "max",
    dtype=None,
) -> jnp.ndarray:
    """Linear-MLP EdgeConv over either graph representation.

    * ``Neighborhood`` (explicit fixed-degree lists) → factorized
      gather-reduce path (general, any device);
    * ``WindowGraph`` (implicit eta-sorted radius graph) → windowed
      aggregation: the Pallas TPU kernel for 'max' on TPU, the XLA tiled
      formulation elsewhere (CPU tests, other reductions).
    """
    if isinstance(graph, WindowGraph):
        from deepmetv2_tpu.parallel import context as pctx

        ctx = pctx.current()
        if ctx is not None and reduction == "max":
            from deepmetv2_tpu.parallel.halo import (
                window_edgeconv_linear_sharded,
            )

            return window_edgeconv_linear_sharded(
                x, graph, weight, bias, mesh=ctx.mesh,
                node_axis=ctx.node_axis, data_axis=ctx.data_axis,
                interpret=ctx.interpret)
        if reduction == "max" and _on_tpu() and not pctx.xla_window_forced():
            from deepmetv2_tpu.ops.pallas.edgeconv_window import (
                window_edgeconv_linear_pallas,
            )

            return window_edgeconv_linear_pallas(x, graph, weight, bias,
                                                 dtype=dtype)
        return window_edgeconv_linear(x, graph, weight, bias, reduction)
    return edgeconv_linear(x, graph, weight, bias, reduction)


def edgeconv_linear(
    x: jnp.ndarray,            # [B, N, H]
    nbr: Neighborhood,
    weight: jnp.ndarray,       # [2H, Hout]  rows: [self; diff]
    bias: jnp.ndarray | None,  # [Hout]
    reduction: Reduction = "max",
) -> jnp.ndarray:              # [B, N, Hout]
    """EdgeConv with a linear edge-MLP via the exact a_i + c_j factorization.

    Matches PyG ``EdgeConv(nn=Linear(2H, Hout), aggr=reduction)`` on the same
    graph, including the empty-neighborhood convention (output 0)."""
    H = x.shape[-1]
    w_self, w_diff = weight[:H], weight[H:]

    c = jnp.einsum("bnh,hf->bnf", x, w_diff,
                   preferred_element_type=jnp.float32)
    a = jnp.einsum("bnh,hf->bnf", x, w_self - w_diff,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        a = a + bias

    if reduction == "max":
        agg = neighbor_reduce(c, nbr, "max", empty_value=0.0)
        has = jnp.any(nbr.mask, axis=-1, keepdims=True)
        return jnp.where(has, a + agg, 0.0)
    if reduction == "mean":
        agg = neighbor_reduce(c, nbr, "mean")
        has = jnp.any(nbr.mask, axis=-1, keepdims=True)
        return jnp.where(has, a + agg, 0.0)
    if reduction == "sum":
        deg = jnp.sum(nbr.mask, axis=-1, keepdims=True).astype(x.dtype)
        return deg * a + neighbor_reduce(c, nbr, "sum")
    raise ValueError(f"unknown reduction {reduction!r}")


def edgeconv_mlp(
    x: jnp.ndarray,                       # [B, N, H]
    nbr: Neighborhood,
    mlp: Callable[[jnp.ndarray], jnp.ndarray],  # [..., 2H] -> [..., Hout]
    reduction: Reduction = "max",
    tile: int = 256,
) -> jnp.ndarray:
    """EdgeConv with an arbitrary edge-MLP (reference DRN path).

    Processes query nodes in tiles of ``tile`` so the materialized edge
    tensor is ``[B, tile, K, 2H]``, never the full edge set."""
    B, N, H = x.shape
    K = nbr.max_degree
    tile = min(tile, N)
    n_tiles = -(-N // tile)

    def one(t):
        sl = lambda arr: jax.lax.dynamic_slice_in_dim(arr, t * tile, tile, axis=1)
        xi = sl(x)                                   # [B, T, H]
        idx_t = sl(nbr.idx)
        mask_t = sl(nbr.mask)
        xj = gather_neighbors(x, Neighborhood(idx_t, mask_t))  # [B, T, K, H]
        e = jnp.concatenate(
            [jnp.broadcast_to(xi[:, :, None, :], xj.shape), xj - xi[:, :, None, :]],
            axis=-1,
        )
        h = mlp(e)                                   # [B, T, K, Hout]
        m = mask_t[..., None]
        if reduction == "max":
            mx = jnp.max(jnp.where(m, h, -jnp.inf), axis=2)
            return jnp.where(jnp.any(m, axis=2), mx, 0.0)
        if reduction == "mean":
            s = jnp.sum(jnp.where(m, h, 0), axis=2)
            return jnp.where(jnp.any(m, axis=2),
                             s / jnp.maximum(jnp.sum(m, axis=2), 1), 0.0)
        if reduction == "sum":
            return jnp.sum(jnp.where(m, h, 0), axis=2)
        raise ValueError(f"unknown reduction {reduction!r}")

    if n_tiles == 1:
        return one(0)
    outs = jax.lax.map(one, jnp.arange(n_tiles))     # [n_tiles, B, T, Hout]
    outs = jnp.moveaxis(outs, 0, 1).reshape(B, n_tiles * tile, -1)
    return outs[:, :N]
