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

from typing import Optional, Tuple

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


def presort_batch(batch: EventBatch) -> EventBatch:
    """Host-side (numpy) equivalent of ``sort_by_eta`` — applied once at
    collation time by the loader (``presort_eta=True``) so no per-step
    argsort ever runs on device.  Batches are memoized host-side, so the
    sort happens once per batch per run instead of once per train step.
    """
    import numpy as np

    eta = np.asarray(batch.x_cont[..., 3])
    mask = np.asarray(batch.mask)
    key = np.where(mask, eta, np.inf)
    perm = np.argsort(key, axis=1, kind="stable")

    def take(arr):
        arr = np.asarray(arr)
        if arr.ndim == 3:
            return np.take_along_axis(arr, perm[..., None], axis=1)
        return np.take_along_axis(arr, perm, axis=1)

    return EventBatch(
        x_cont=take(batch.x_cont),
        x_cat=take(batch.x_cat),
        mask=take(batch.mask),
        y=batch.y,
        num_valid=batch.num_valid,
    )


def auto_block_rows(batch: EventBatch, r: float) -> int:
    """Block size for cell_sort_batch: ~the number of eta-sorted rows an
    r-wide eta slab spans (then an in-radius pair is almost always within
    ±1 block), rounded up to the 32-row chunk grid, floored at 64."""
    import numpy as np

    eta = np.asarray(batch.x_cont[..., 3])
    mask = np.asarray(batch.mask)
    nv = mask.sum(axis=1)
    spans = []
    for b in range(eta.shape[0]):
        if nv[b] < 2:
            continue
        e = eta[b][mask[b]]
        spans.append(nv[b] * r / max(float(e.max() - e.min()), 1e-6))
    if not spans:
        return 64
    g = int(np.median(spans))
    return max(64, -(-g // 32) * 32)


def cell_sort_batch(batch: EventBatch, r: float = 0.4,
                    block_rows: Optional[int] = None) -> EventBatch:
    """Host-side cell ordering: eta-sort each event, then re-sort by phi
    inside fixed blocks of ``block_rows`` consecutive rows (eta-quantile
    cells), padding pushed to the end.

    A 2D spatial ordering for the implicit-window kernel: with eta-only
    sorting, a node's ±halo window spans ALL phi values in its eta slab, so
    the kernel sweeps ~2pi/(2r) more rows than are in-radius.  Phi-sorting
    inside eta-quantile blocks makes each neighborhood fall into <= ~3
    short phi runs (one per adjacent block), which the kernel's per-chunk
    eta+phi interval prune then skips (ops/pallas/edgeconv_window.py).

    Quantile (equal-occupancy) blocks — not fixed-width eta bins — are
    essential under lane packing: the kernel ORs its prune mask across the
    ``pack`` events sharing a vreg, and only row-aligned blocks keep the
    events' phi runs aligned so the OR stays tight.

    The window machinery itself is order-agnostic: correctness needs only
    halo >= required_span_batch on the actual order; orderings are pure
    locality heuristics.
    """
    import numpy as np

    G = int(block_rows if block_rows is not None
            else auto_block_rows(batch, r))
    eta = np.asarray(batch.x_cont[..., 3])
    phi = np.arctan2(np.asarray(batch.x_cont[..., 1]),
                     np.asarray(batch.x_cont[..., 0]))
    mask = np.asarray(batch.mask)
    B, N = eta.shape
    p1 = np.argsort(np.where(mask, eta, np.inf), axis=1, kind="stable")
    phi_s = np.take_along_axis(np.where(mask, phi, np.inf), p1, axis=1)
    blk = np.broadcast_to(np.arange(N) // G, (B, N))
    p2 = np.lexsort((phi_s, blk), axis=1)
    perm = np.take_along_axis(p1, p2, axis=1)

    def take(arr):
        arr = np.asarray(arr)
        if arr.ndim == 3:
            return np.take_along_axis(arr, perm[..., None], axis=1)
        return np.take_along_axis(arr, perm, axis=1)

    return EventBatch(
        x_cont=take(batch.x_cont),
        x_cat=take(batch.x_cat),
        mask=take(batch.mask),
        y=batch.y,
        num_valid=batch.num_valid,
    )


def required_span_arrays(eta, phi, mask, r: float) -> int:
    """Smallest halo H such that, in the CURRENT row order, every in-radius
    pair (plain euclidean in (eta, phi), the reference metric) is within H
    index positions.  Order-agnostic counterpart of required_halo_arrays —
    works for eta-sorted, cell-sorted, or any other layout.  O(N^2) per
    event in blocks; host numpy, run once per memoized batch."""
    import numpy as np

    eta, phi, mask = np.asarray(eta), np.asarray(phi), np.asarray(mask)
    r2 = float(r) ** 2
    worst = 0
    for b in range(eta.shape[0]):
        e = eta[b][mask[b]].astype(np.float64)
        p = phi[b][mask[b]].astype(np.float64)
        n = len(e)
        if n == 0:
            continue
        idx = np.arange(n)
        for s in range(0, n, 512):
            q = slice(s, min(s + 512, n))
            d2 = (e[q, None] - e[None, :]) ** 2 + (p[q, None] - p[None, :]) ** 2
            adj = d2 < r2                       # self is adjacent: d2 == 0
            jq = idx[q, None]
            j_hi = np.where(adj, idx[None, :], jq).max(axis=1)
            j_lo = np.where(adj, idx[None, :], jq).min(axis=1)
            worst = max(worst, int(np.max(j_hi - idx[q])),
                        int(np.max(idx[q] - j_lo)))
    return worst


def required_span_blocks(batch: EventBatch, r: float,
                         block_rows: Optional[int] = None) -> int:
    """Fast conservative halo bound for a CELL-SORTED batch (see
    cell_sort_batch): in block order, an in-radius pair can only join rows
    of blocks whose eta ranges come within r of each other, so the worst
    row distance is bounded by block-pair row extents.  O(n_blocks^2) per
    event instead of required_span_arrays' O(N^2); ignores phi, hence an
    upper bound (the kernel re-checks adjacency exactly — a loose halo
    costs time, never correctness)."""
    import numpy as np

    G = int(block_rows if block_rows is not None
            else auto_block_rows(batch, r))
    eta = np.asarray(batch.x_cont[..., 3])
    mask = np.asarray(batch.mask)
    B, N = eta.shape
    n_blk = -(-N // G)
    pad = n_blk * G - N
    elo = np.where(mask, eta, np.inf)      # empty blocks → (inf, -inf),
    ehi = np.where(mask, eta, -np.inf)     # excluded by the isfinite filter
    if pad:
        elo = np.pad(elo, ((0, 0), (0, pad)), constant_values=np.inf)
        ehi = np.pad(ehi, ((0, 0), (0, pad)), constant_values=-np.inf)
    emin = elo.reshape(B, n_blk, G).min(axis=-1)           # [B, n_blk]
    emax = ehi.reshape(B, n_blk, G).max(axis=-1)
    worst = 0
    for b in range(B):
        fin = np.isfinite(emin[b])
        gs = np.where(fin)[0]
        for g in gs:
            for h in gs:
                if (emin[b, h] < emax[b, g] + r and
                        emax[b, h] > emin[b, g] - r):
                    span = max((h + 1) * G - 1 - g * G,
                               (g + 1) * G - 1 - h * G)
                    worst = max(worst, span)
    return int(worst)


def required_span_batch(batch: EventBatch, r: float) -> int:
    """required_span_arrays over a collated EventBatch's current order."""
    import numpy as np

    eta = np.asarray(batch.x_cont[..., 3])
    phi = np.arctan2(np.asarray(batch.x_cont[..., 1]),
                     np.asarray(batch.x_cont[..., 0]))
    return required_span_arrays(eta, phi, np.asarray(batch.mask), r)


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
