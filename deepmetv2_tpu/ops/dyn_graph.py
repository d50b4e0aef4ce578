"""Dynamic-graph build + coarsening-matching dispatch for the DRN family.

One DRN reduction round needs (reference
model/dynamic_reduction_network.py:86-99):

  1. the symmetrized feature-space kNN graph of the CURRENT features —
     consumed by the EdgeConv gather;
  2. normalized-cut edge weights of the POST-conv features on that graph —
     consumed (only) by the discrete heavy-edge matching.

Both structures are non-differentiable (indices; weights feed an argmax
matching), so the whole build runs under ``stop_gradient`` — the XLA
composition used to drag a dead backward through the normalized-cut
feature gather every step.

Two execution strategies, same semantics:

  * **fused (TPU)** — ``ops/pallas/knn_und.knn_und_graph`` builds the
    undirected list + per-edge d² + per-node k-th-NN thresholds in two
    VMEM-resident kernels (no sorts, no adjacency inversion); matching
    then runs on the *dense threshold relation*
    (``coarsen.handshake_matching_dense``): U(i,j) = d²≤t_i ∨ d²≤t_j is a
    pure elementwise predicate, so each round is [B,N,N] masking + a row
    argmax — no per-round index gathers at all.
  * **composed (portable)** — ``to_undirected(knn_graph(...))`` +
    ``normalized_cut_weights`` + list-based ``handshake_matching``; the
    reference-semantics implementation every platform can run and the
    oracle the fused path is tested against.

Divergences of the fused path (documented, generic-position-identical):
degree>cap keeps the cap lowest-indexed neighbors (composed drops
mutually); the dense matching sees the *uncapped* threshold relation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from deepmetv2_tpu.data.batching import Neighborhood
from deepmetv2_tpu.ops.coarsen import (
    handshake_matching,
    handshake_matching_dense,
    normalized_cut_weights,
)
from deepmetv2_tpu.ops.graph import knn_graph, to_undirected

# Up to this node count the extract kernel emits its relation rows
# ([B,N,N] f32) and the dense matching consumes them directly.
DENSE_MATCH_MAX_N = 4096
# Above DENSE_MATCH_MAX_N the relation is RECOMPUTED tile-by-tile from
# (h0, t) instead (emitting [8,8192,8192] from the kernel would be
# 2.1 GB of kernel output); beyond this element count even the single
# [B,N,N] weight matrix is too heavy and the list formulation takes over.
DENSE_W_MAX_ELEMS = 8 * 8192 * 8192


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["nbr", "d2v", "t", "h0", "mirror", "rel"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class DynGraph:
    """One round's dynamic graph.  ``d2v``/``t``/``h0`` are populated by
    the fused TPU build (None on the composed path): per-listed-edge
    squared distances, per-node k-th-NN thresholds, and the (stop-
    gradient-ed) features the graph was built from.  ``mirror`` (both
    paths) is the mirror-slot table of the symmetric list
    (ops/segment.mirror_slots) — it turns the EdgeConv gather's adjoint
    into a gather (no scatter-add in the conv backward)."""

    nbr: Neighborhood
    d2v: Optional[jnp.ndarray]   # [B, N, cap] or None
    t: Optional[jnp.ndarray]     # [B, N] or None
    h0: Optional[jnp.ndarray]    # [B, N, H] or None
    mirror: Optional[jnp.ndarray] = None   # [B, N, cap] int32 or None
    # [B, N, N] f32 0/1 threshold-relation rows emitted by the extract
    # kernel (want_rel) — the dense cut matching's adjacency, bitwise the
    # decisions the extraction itself made.  None on the composed path
    # and above DENSE_MATCH_MAX_N.
    rel: Optional[jnp.ndarray] = None


def _fused_available(n: int, cap: int, interpret: bool) -> bool:
    from deepmetv2_tpu.ops.pallas.knn_und import supported
    from deepmetv2_tpu.parallel import context as pctx

    if not supported(n, cap):
        return False
    if pctx.xla_window_forced():
        # GSPMD-sharded trace (dp steps): pallas_call has no SPMD
        # partitioning rule — take the composed XLA formulation, which
        # GSPMD partitions along the batch axis for free
        return False
    if interpret:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def build_dyn_graph(
    h: jnp.ndarray,      # [B, N, H]
    mask: jnp.ndarray,   # [B, N]
    k: int = 16,
    cap: Optional[int] = None,
    force: Optional[str] = None,   # None (auto) | 'fused' | 'composed'
    interpret: bool = False,
    want_mirror: bool = False,
) -> DynGraph:
    """Symmetrized feature-space kNN graph of ``h`` (equivalent of
    ``to_undirected(knn_graph(h, mask, k))``), strategy per module
    docstring.  Always non-differentiable.

    ``want_mirror`` additionally builds the mirror-slot table
    (ops/segment.mirror_slots) so the EdgeConv backward can run as a
    gather; on the fused path this also enforces mutual-keep (drops
    cap-bound one-sided edges — the composed path's semantics), making
    the list exactly symmetric."""
    from deepmetv2_tpu.ops.segment import mirror_slots_sorted

    cap = 2 * k if cap is None else cap
    h = jax.lax.stop_gradient(h)
    fused = (force == "fused" or
             (force is None and _fused_available(h.shape[1], cap, interpret)))
    if fused:
        from deepmetv2_tpu.ops.pallas.knn_und import knn_und_graph

        want_rel = h.shape[1] <= DENSE_MATCH_MAX_N
        if want_rel:
            nbr, d2v, t, rel = knn_und_graph(h, mask, k=k, cap=cap,
                                             interpret=interpret,
                                             want_rel=True)
        else:
            nbr, d2v, t = knn_und_graph(h, mask, k=k, cap=cap,
                                        interpret=interpret)
            rel = None
        if want_mirror:
            mirror, found = mirror_slots_sorted(nbr)
            nbr = Neighborhood(idx=nbr.idx, mask=found)
            return DynGraph(nbr=nbr, d2v=d2v, t=t, h0=h, mirror=mirror,
                            rel=rel)
        return DynGraph(nbr=nbr, d2v=d2v, t=t, h0=h, rel=rel)
    nbr = to_undirected(knn_graph(h, mask, k=k, loop=False), cap=cap)
    if want_mirror:
        mirror, _ = mirror_slots_sorted(nbr)  # symmetric by construction
        return DynGraph(nbr=nbr, d2v=None, t=None, h0=None, mirror=mirror)
    return DynGraph(nbr=nbr, d2v=None, t=None, h0=None)


def _pairwise_d2(h: jnp.ndarray) -> jnp.ndarray:
    """[B,N,N] squared distances, |a|²+|b|²−2a·b (MXU form, same
    association as the kernel / ops.graph)."""
    sq = jnp.sum(h * h, axis=-1)
    dot = jnp.einsum("bnh,bmh->bnm", h, h,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * dot, 0.0)


def _tiled_cut_weights(h0, t, h, mask, tile_c: int = 2048):
    """[B,N,N] normalized-cut weight matrix for the dense matching,
    built in [B,N,tile_c] column tiles so no [B,N,N,...] intermediate
    ever exists: per tile, the threshold relation U = d²(h0)≤t_i ∨ ≤t_j
    (the same |a|²+|b|²−2a·b association / HIGHEST precision as the
    extract kernel's _d2_tile, so on the MXU the predicate reproduces
    the kernel's decisions bitwise — validated by bench's
    tiled_rel_bitwise check against the kernel-emitted rows) and the
    weight dist(h)·(1/deg_i + 1/deg_j).  Degrees come from a first
    U-only sweep.  One 2.1 GB f32 matrix at B8/N8192 — cheaper than the
    list formulation's per-round index gathers (108 ms measured) by ~4x.
    """
    B, N = mask.shape
    iota = jnp.arange(N)
    sq0 = jnp.sum(h0 * h0, axis=-1)
    sqp = jnp.sum(h * h, axis=-1)
    valid_row = mask[:, :, None]

    def tile_U(c0):
        hc = jax.lax.dynamic_slice_in_dim(h0, c0, tile_c, axis=1)
        dot = jnp.einsum("bnh,bch->bnc", h0, hc,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        sqc = jax.lax.dynamic_slice_in_dim(sq0, c0, tile_c, axis=1)
        d2 = jnp.maximum(sq0[:, :, None] + sqc[:, None, :] - 2.0 * dot, 0.0)
        tc = jax.lax.dynamic_slice_in_dim(t, c0, tile_c, axis=1)
        mc = jax.lax.dynamic_slice_in_dim(mask, c0, tile_c, axis=1)
        v = (valid_row & mc[:, None, :]
             & (iota[:, None] != iota[None, c0:c0 + tile_c]))
        return ((d2 <= t[:, :, None]) | (d2 <= tc[:, None, :])) & v

    starts = list(range(0, N, tile_c))
    deg = sum(jnp.sum(tile_U(c0), axis=-1) for c0 in starts).astype(h.dtype)
    ivd = 1.0 / jnp.maximum(deg, 1.0)

    parts = []
    for c0 in starts:
        U = tile_U(c0)
        hc = jax.lax.dynamic_slice_in_dim(h, c0, tile_c, axis=1)
        dot = jnp.einsum("bnh,bch->bnc", h, hc,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        sqc = jax.lax.dynamic_slice_in_dim(sqp, c0, tile_c, axis=1)
        dist = jnp.sqrt(jnp.maximum(
            sqp[:, :, None] + sqc[:, None, :] - 2.0 * dot, 0.0))
        ivc = jax.lax.dynamic_slice_in_dim(ivd, c0, tile_c, axis=1)
        parts.append(jnp.where(
            U, dist * (ivd[:, :, None] + ivc[:, None, :]), -jnp.inf))
    return jnp.concatenate(parts, axis=2)


def cut_matching(
    g: DynGraph,
    h: jnp.ndarray,      # [B, N, H] POST-conv features (weight distances)
    mask: jnp.ndarray,
    rounds: int = 4,
):
    """Normalized-cut-weighted handshake matching on ``g``
    (reference normalized_cut + graclus,
    model/dynamic_reduction_network.py:89-91).  Discrete — no gradient.

    For N <= DENSE_MATCH_MAX_N the matching runs on a dense [B,N,N]
    weight matrix: the adjacency is scattered once from the neighbor list
    (exact list consistency — re-deriving it from distance thresholds is
    equality-sensitive at the k-th edge, where d² == t by construction),
    the edge distances come from one batched MXU pairwise-d² (no
    [B,N,K,H] feature gather), and the per-round candidate masking is
    elementwise (no [B,N,K] index gathers).  Weight VALUES differ from
    the list formulation only in float association; matchings are
    identical in generic position."""
    h = jax.lax.stop_gradient(h)
    B, N = mask.shape
    if N <= DENSE_MATCH_MAX_N:
        nbr = g.nbr
        if g.rel is not None:
            # Fused build: the extract kernel emitted its own threshold-
            # relation rows (knn_und want_rel) — the EXACT adjacency
            # decisions the extraction made, with no [B,N,K]->[B,N,N]
            # scatter (XLA lowers that scatter at ~7 ns/row, ≈5 ms at
            # B8/N2048/K32 — it was the step's second-largest stage).
            # Rows past the cap see the UNCAPPED relation (documented
            # divergence — identical in the hub-free regime, gated by
            # bench's matching_equal check).
            U = g.rel > 0
            deg = jnp.sum(U, axis=-1).astype(h.dtype)
        else:
            bi = jnp.arange(B)[:, None, None]
            qi = jnp.arange(N)[None, :, None]
            U = jnp.zeros((B, N, N), bool).at[bi, qi, nbr.idx].max(nbr.mask)
            deg = jnp.sum(nbr.mask, axis=-1).astype(h.dtype)
        ivd = 1.0 / jnp.maximum(deg, 1.0)
        dist = jnp.sqrt(_pairwise_d2(h))
        W = jnp.where(U, dist * (ivd[:, :, None] + ivd[:, None, :]),
                      -jnp.inf)
        return handshake_matching_dense(W, mask, rounds=rounds)
    if (g.t is not None and g.h0 is not None
            and B * N * N <= DENSE_W_MAX_ELEMS):
        tile_c = next((c for c in range(min(2048, N), 127, -128)
                       if N % c == 0 and c % 128 == 0), None)
        if tile_c is not None:
            W = _tiled_cut_weights(g.h0, g.t, h, mask, tile_c)
            return handshake_matching_dense(W, mask, rounds=rounds)
    w = normalized_cut_weights(h, g.nbr)
    return handshake_matching(w, g.nbr, mask, rounds=rounds)
