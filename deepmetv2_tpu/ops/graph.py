"""Graph construction — TPU-native replacement for torch_cluster's
``radius_graph`` / ``knn_graph`` CUDA kernels (reference train.py:48,
model/dynamic_reduction_network.py:86,94).

Instead of COO edge lists, these ops emit fixed-degree neighbor lists
``Neighborhood(idx [B,N,K], mask [B,N,K])`` over padded batches: static
shapes, no host round-trip, fully jit-able.  Queries are processed in node
tiles so peak memory is ``O(B · tile · N)`` rather than ``O(B · N²)``.

Semantics notes vs torch_cluster:

* ``radius_graph(..., loop=True, max_num_neighbors=255)``: the reference's
  CUDA kernel truncates to the *first* 255 neighbors in index order; we keep
  the *nearest* K (deterministic, strictly better physics).  With the
  reference's data the true degree rarely exceeds the cap, so parity holds.
* the distance metric is plain Euclidean in (eta, phi) with NO phi ±pi
  wraparound by default, faithfully reproducing the reference's acknowledged
  boundary bug (train.py:47 comment); ``wrap_axes`` enables the fix.
* ``knn_graph``: k nearest in feature space, self excluded unless ``loop``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from deepmetv2_tpu.data.batching import Neighborhood

_INF = jnp.float32(jnp.inf)


def _pairwise_sq_dists(
    q: jnp.ndarray,  # [T, D] query positions
    p: jnp.ndarray,  # [N, D] all positions
    wrap: Optional[jnp.ndarray] = None,  # [D] period per axis (0 = no wrap)
) -> jnp.ndarray:  # [T, N]
    """Squared distances.  For low-D (eta/phi) uses the direct difference
    form on the VPU; for high-D feature spaces uses |a|²+|b|²-2a·b so the
    inner product rides the MXU."""
    D = q.shape[-1]
    if wrap is not None or D <= 4:
        d = q[:, None, :] - p[None, :, :]
        if wrap is not None:
            half = wrap / 2.0
            wrapped = jnp.mod(d + half, jnp.where(wrap > 0, wrap, 1.0)) - half
            d = jnp.where(wrap > 0, wrapped, d)
        return jnp.sum(d * d, axis=-1)
    qq = jnp.sum(q * q, axis=-1)[:, None]
    pp = jnp.sum(p * p, axis=-1)[None, :]
    # full-f32 MXU passes: the TPU-default (~bf16) quantization creates
    # spurious k-th-place distance ties that make top-k tie-breaking (and
    # the threshold form in ops/pallas/knn_und.py) data-dependent noise
    qp = jnp.dot(q, p.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qq + pp - 2.0 * qp, 0.0)


def _neighbor_tile(
    q: jnp.ndarray,         # [T, D] query tile (possibly padded)
    qmask: jnp.ndarray,     # [T]
    pos: jnp.ndarray,       # [N, D] all candidate positions
    mask: jnp.ndarray,      # [N]
    tile_start: jnp.ndarray,
    k: int,
    r2: Optional[float],
    loop: bool,
    wrap: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Neighbor selection for one tile of query nodes of a single event."""
    N = pos.shape[0]
    tile = q.shape[0]

    d2 = _pairwise_sq_dists(q, pos, wrap)                       # [T, N]
    valid = qmask[:, None] & mask[None, :]
    if r2 is not None:
        valid &= d2 < r2
    if not loop:
        qidx = tile_start + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        jidx = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        valid &= qidx != jidx

    score = jnp.where(valid, d2, _INF)
    k_eff = min(k, N)
    neg_top, idx = jax.lax.top_k(-score, k_eff)                 # nearest k
    nmask = neg_top > -_INF
    if k_eff < k:
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
        nmask = jnp.pad(nmask, ((0, 0), (0, k - k_eff)))
    return idx.astype(jnp.int32), nmask


def _build_single(
    pos: jnp.ndarray,   # [N, D]
    mask: jnp.ndarray,  # [N]
    k: int,
    r2: Optional[float],
    loop: bool,
    wrap: Optional[jnp.ndarray],
    tile: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = pos.shape[0]
    tile = min(tile, N)
    n_tiles = -(-N // tile)

    # Pad queries to a whole number of tiles: dynamic_slice clamps
    # out-of-range starts, which would silently misalign the last tile.
    if n_tiles * tile != N:
        pad = n_tiles * tile - N
        qpos = jnp.pad(pos, ((0, pad), (0, 0)))
        qmask = jnp.pad(mask, (0, pad))
    else:
        qpos, qmask = pos, mask

    def one(t):
        q = jax.lax.dynamic_slice_in_dim(qpos, t * tile, tile, axis=0)
        qm = jax.lax.dynamic_slice_in_dim(qmask, t * tile, tile, axis=0)
        return _neighbor_tile(q, qm, pos, mask, t * tile, k, r2, loop, wrap)

    if n_tiles == 1:
        return one(0)
    idx, nmask = jax.lax.map(one, jnp.arange(n_tiles))
    return (idx.reshape(n_tiles * tile, k)[:N],
            nmask.reshape(n_tiles * tile, k)[:N])


@functools.partial(
    jax.jit, static_argnames=("k", "r", "loop", "wrap_axes", "tile")
)
def radius_graph(
    pos: jnp.ndarray,   # [B, N, D]
    mask: jnp.ndarray,  # [B, N]
    r: float,
    k: int = 256,
    loop: bool = True,
    wrap_axes: Optional[Tuple[float, ...]] = None,
    tile: int = 512,
) -> Neighborhood:
    """All pairs within radius ``r``, capped at the nearest ``k``.

    Equivalent of ``torch_cluster.radius_graph(etaphi, r, batch, loop=True,
    max_num_neighbors=255)`` at reference train.py:48, over padded batches.
    ``wrap_axes``: optional per-axis periods (e.g. ``(0.0, 2*pi)`` to fix the
    phi boundary); None reproduces the reference metric.
    """
    wrap = jnp.asarray(wrap_axes, jnp.float32) if wrap_axes is not None else None
    build = functools.partial(
        _build_single, k=k, r2=float(r) ** 2, loop=loop, wrap=wrap, tile=tile
    )
    idx, nmask = jax.vmap(build)(pos, mask)
    idx = jnp.where(nmask, idx, 0)
    return Neighborhood(idx=idx, mask=nmask)


@functools.partial(jax.jit, static_argnames=("k", "loop", "tile"))
def knn_graph(
    x: jnp.ndarray,     # [B, N, D] positions / features
    mask: jnp.ndarray,  # [B, N]
    k: int = 16,
    loop: bool = False,
    tile: int = 512,
) -> Neighborhood:
    """k nearest neighbors in feature space.

    Equivalent of ``torch_cluster.knn_graph(x, k, batch, loop=False)`` at
    reference model/dynamic_reduction_network.py:86,94 (flow
    'source_to_target': the k nearest of node i message INTO i).
    """
    build = functools.partial(
        _build_single, k=k, r2=None, loop=loop, wrap=None, tile=tile
    )
    idx, nmask = jax.vmap(build)(x, mask)
    idx = jnp.where(nmask, idx, 0)
    return Neighborhood(idx=idx, mask=nmask)


def _invert_single(
    idx: jnp.ndarray,   # [N, K] out-neighbor ids
    mask: jnp.ndarray,  # [N, K]
    cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse adjacency: for each node j, the list of i with j in idx[i].

    Sort-based (radix-friendly) edge bucketing: flatten directed edges,
    stable-sort by destination, then each destination's in-edges are a
    contiguous run whose within-run rank gives the slot.  Capped at ``cap``
    in-edges per node (overflow masked).
    """
    N, K = idx.shape
    E = N * K
    src = jax.lax.broadcasted_iota(jnp.int32, (N, K), 0).reshape(E)
    dst = jnp.where(mask, idx, N).reshape(E)          # invalid -> sentinel N

    order = jnp.argsort(dst, stable=True)
    sdst = dst[order]
    ssrc = src[order]

    # rank of each edge within its destination run
    starts = jnp.searchsorted(sdst, jnp.arange(N + 1, dtype=sdst.dtype))
    rank = jnp.arange(E, dtype=jnp.int32) - starts[sdst].astype(jnp.int32)

    keep = (sdst < N) & (rank < cap)
    flat_pos = jnp.where(keep, sdst.astype(jnp.int32) * cap + rank, N * cap)

    in_idx = jnp.zeros((N * cap + 1,), jnp.int32).at[flat_pos].set(
        jnp.where(keep, ssrc, 0), mode="drop"
    )[: N * cap].reshape(N, cap)
    in_mask = jnp.zeros((N * cap + 1,), jnp.bool_).at[flat_pos].set(
        keep, mode="drop"
    )[: N * cap].reshape(N, cap)
    return in_idx, in_mask


def _unique_prefix(vals: jnp.ndarray, sentinel: int, cap: int):
    """Sort ``vals`` along the last axis, sentinel-out duplicates, and
    compact the unique non-sentinel values into the first ``cap`` slots.
    Returns (idx [..., cap], mask [..., cap])."""
    s = jnp.sort(vals, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(s[..., :1], jnp.bool_), s[..., 1:] == s[..., :-1]], axis=-1
    )
    keyed = jnp.where((s < sentinel) & ~dup, s, sentinel)
    s2 = jnp.sort(keyed, axis=-1)[..., :cap]
    m = s2 < sentinel
    return jnp.where(m, s2, 0).astype(jnp.int32), m


@functools.partial(jax.jit, static_argnames=("cap",))
def to_undirected(nbr: Neighborhood, cap: Optional[int] = None) -> Neighborhood:
    """Symmetrize: edge set E ∪ Eᵀ, deduplicated.

    Equivalent of PyG ``to_undirected`` at reference
    model/dynamic_reduction_network.py:86,94.  Output degree is capped at
    ``cap`` (default 2K); when a node's undirected degree exceeds the cap,
    its highest-indexed neighbors are dropped *mutually* (edge (i,j) is kept
    iff it survives on both endpoints), so the result is symmetric by
    construction.  Exact (no drops) whenever every node's undirected degree
    <= cap and in-degree <= 2·cap.
    """
    B, N, K = nbr.idx.shape
    cap = cap if cap is not None else 2 * K
    in_cap = 2 * cap

    in_idx, in_mask = jax.vmap(functools.partial(_invert_single, cap=in_cap))(
        nbr.idx, nbr.mask
    )

    # Union of out- and in-neighbors, unique, capped (per-node, id-sorted).
    both = jnp.concatenate(
        [jnp.where(nbr.mask, nbr.idx, N), jnp.where(in_mask, in_idx, N)], axis=-1
    )
    und_idx, und_mask = _unique_prefix(both, N, cap)

    # Mutual-keep: j stays in final[i] iff i also stayed in und[j].
    rev_idx, rev_mask = jax.vmap(functools.partial(_invert_single, cap=in_cap))(
        und_idx, und_mask
    )
    merged = jnp.concatenate(
        [jnp.where(und_mask, und_idx, N), jnp.where(rev_mask, rev_idx, N)], axis=-1
    )
    ms = jnp.sort(merged, axis=-1)
    # both lists are unique => a value appearing twice is in the intersection
    twice = (ms[..., 1:] == ms[..., :-1]) & (ms[..., 1:] < N)
    inter = jnp.where(twice, ms[..., 1:], N)
    out_idx, out_mask = _unique_prefix(inter, N, cap)
    return Neighborhood(idx=out_idx, mask=out_mask)
