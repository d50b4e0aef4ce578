"""Masked segment reductions — replacement for torch_scatter's CUDA
``scatter_add`` / ``scatter_max`` (reference model/net.py:8,55-56 and the
'max' aggregation inside PyG EdgeConv, model/graph_met_network.py:38).

With the padded layout (batching.py) the per-event ``batch`` vector
disappears: segment reductions over events are masked reductions over the
node axis, and per-node neighborhood reductions are masked reductions over
the fixed-degree K axis after a gather.  Both fuse cleanly in XLA.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from deepmetv2_tpu.data.batching import Neighborhood

Reduction = Literal["sum", "mean", "max", "min"]

_NEG_INF = jnp.float32(-jnp.inf)


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Sum of ``x`` over ``axis`` counting only masked-true entries.

    The per-event equivalent of ``scatter_add(values, batch)``
    (reference model/net.py:55-56): ``x [B, N, ...]``, ``mask [B, N]``.
    """
    m = jnp.expand_dims(mask, tuple(range(mask.ndim, x.ndim)))
    return jnp.sum(jnp.where(m, x, 0), axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1,
                eps: float = 0.0) -> jnp.ndarray:
    m = jnp.expand_dims(mask, tuple(range(mask.ndim, x.ndim)))
    total = jnp.sum(jnp.where(m, x, 0), axis=axis)
    count = jnp.sum(m, axis=axis)
    return total / jnp.maximum(count, 1 if eps == 0.0 else eps)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1,
               empty_value: float = 0.0) -> jnp.ndarray:
    """Max over masked entries; segments with no valid entry produce
    ``empty_value`` (0, matching torch_scatter's empty-segment fill —
    relevant for PyG 'max' aggregation)."""
    m = jnp.expand_dims(mask, tuple(range(mask.ndim, x.ndim)))
    mx = jnp.max(jnp.where(m, x, _NEG_INF), axis=axis)
    any_valid = jnp.any(m, axis=axis)
    return jnp.where(any_valid, mx, empty_value)


def masked_softmax(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    m = mask
    if m.ndim < x.ndim:
        m = jnp.expand_dims(m, tuple(range(m.ndim, x.ndim)))
    z = jnp.where(m, x, _NEG_INF)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=axis, keepdims=True))
    e = jnp.where(m, jnp.exp(z), 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-30)


def gather_neighbors(values: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Gather neighbor features: ``values [B, N, H]``, → ``[B, N, K, H]``.

    This is the TPU equivalent of PyG's edge-indexed ``x_j`` gather
    (the irregular read inside MessagePassing, reference
    model/graph_met_network.py:38's EdgeConv)."""
    return jax.vmap(lambda v, i: v[i])(values, nbr.idx)


def neighbor_reduce(
    values: jnp.ndarray,       # [B, N, H]
    nbr: Neighborhood,
    reduction: Reduction = "max",
    empty_value: float = 0.0,
) -> jnp.ndarray:              # [B, N, H]
    """Fused gather + masked reduce over each node's neighbor list.

    ``out[b, i] = reduce_{k valid} values[b, idx[b, i, k]]`` — the
    aggregation step of message passing (scatter_max/add/mean in the
    reference's stack)."""
    g = gather_neighbors(values, nbr)             # [B, N, K, H]
    m = nbr.mask[..., None]
    if reduction == "sum":
        return jnp.sum(jnp.where(m, g, 0), axis=2)
    if reduction == "mean":
        s = jnp.sum(jnp.where(m, g, 0), axis=2)
        c = jnp.sum(m, axis=2)
        return s / jnp.maximum(c, 1)
    if reduction == "max":
        mx = jnp.max(jnp.where(m, g, _NEG_INF), axis=2)
        return jnp.where(jnp.any(m, axis=2), mx, empty_value)
    if reduction == "min":
        mn = jnp.min(jnp.where(m, g, jnp.inf), axis=2)
        return jnp.where(jnp.any(m, axis=2), mn, empty_value)
    raise ValueError(f"unknown reduction {reduction!r}")
