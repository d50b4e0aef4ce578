"""Spatial sorting — the layout foundation of the implicit-graph fast path.

Radius graphs in (eta, phi) have geometric locality: after sorting each
event's candidates by eta, every neighbor of node i (|Δeta| < r ⇒ within
the ball) lies inside a contiguous index window around i.  That turns the
irregular neighbor gather — the throughput bottleneck of the reference's
CUDA design — into dense windowed reads (ops/window.py): no neighbor
lists, no gather, no scatter.

The model and losses are permutation-invariant per event (weights are
per-candidate and summed), so sorting is free; the inverse permutation is
returned for diagnostics that need original candidate order
(plt_weight-style analyses, reference plt_weight.py:122-184).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from deepmetv2_tpu.data.batching import EventBatch


@jax.jit
def sort_by_eta(batch: EventBatch) -> Tuple[EventBatch, jnp.ndarray]:
    """Sort each event's candidates by eta (padding pushed to the end).

    Returns (sorted_batch, perm) with ``perm[b, i]`` = original index of
    the candidate now at slot i; invert with ``argsort(perm)``.
    """
    eta = batch.x_cont[..., 3]
    key = jnp.where(batch.mask, eta, jnp.inf)
    perm = jnp.argsort(key, axis=1)

    def take(arr):
        if arr.ndim == 3:
            return jnp.take_along_axis(arr, perm[..., None], axis=1)
        return jnp.take_along_axis(arr, perm, axis=1)

    out = EventBatch(
        x_cont=take(batch.x_cont),
        x_cat=take(batch.x_cat),
        mask=take(batch.mask),
        y=batch.y,
        num_valid=batch.num_valid,
    )
    return out, perm


def required_halo_arrays(eta, mask, r: float) -> int:
    """Smallest halo H such that, in the eta-sorted order, every pair with
    |Δeta| < r is within H index positions.  ``eta``/``mask``: [B, N]
    host arrays.  The single halo-adequacy rule — every sizing path
    (batch, raw events, bench gates) goes through here."""
    import numpy as np

    eta = np.asarray(eta)
    mask = np.asarray(mask)
    worst = 0
    for b in range(eta.shape[0]):
        e = np.sort(eta[b][mask[b]].astype(np.float64))
        if len(e) == 0:
            continue
        lo = np.searchsorted(e, e - r, side="left")
        hi = np.searchsorted(e, e + r, side="right")
        idx = np.arange(len(e))
        worst = max(worst, int(np.max(idx - lo)), int(np.max(hi - 1 - idx)))
    return worst


def required_halo_events(events, r: float) -> int:
    """``required_halo`` over raw ``(x, y)`` event tuples (x ``[N, 11]`` in
    reference feature order, eta at column 3) — lets a driver size the
    compiled window before any batch is collated."""
    import numpy as np

    worst = 0
    for x, _ in events:
        e = np.asarray(x[:, 3])[None, :]
        worst = max(worst, required_halo_arrays(
            e, np.ones_like(e, dtype=bool), r))
    return worst


def required_halo(batch: EventBatch, r: float) -> int:
    """Smallest halo for a collated EventBatch (see required_halo_arrays)."""
    import numpy as np

    return required_halo_arrays(np.asarray(batch.x_cont[..., 3]),
                                np.asarray(batch.mask), r)
