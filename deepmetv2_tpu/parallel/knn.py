"""Distributed dynamic-kNN — feature-space graph build over a sharded
node axis (SURVEY.md §5: dynamic-kNN layers need a distributed top-k).

``knn_graph_sharded`` builds the same Neighborhood as ops/graph.knn_graph
when the padded node axis is partitioned over the ``node`` mesh axis:
each shard all-gathers the (small) feature block once, then computes its
own query rows' distances and top-k locally — "local top-k over the
gathered set", which is exact (no candidate-merge approximation).  The
returned neighbor indices are GLOBAL node positions, and the Neighborhood
arrays come back sharded like the queries, so a downstream gather of
neighbor features must use globally-replicated (or re-gathered) features.

Two variants, same contract:

* ``knn_graph_sharded`` — all-gather the feature block once, local exact
  top-k.  Simple and fastest while [B, N, D] fits per chip.
* ``knn_graph_sharded_ring`` — never materializes the full block: source
  shards rotate around the ``node`` ring (ppermute over ICI) while each
  chip folds the visiting block into a running top-k.  Peak per-chip
  memory is O(B·n_loc·(D + k)) — independent of the node-shard count — so
  events can grow with the mesh (the "large events" north star).  Each
  rotation overlaps with the previous block's distance+merge compute under
  XLA's async collectives.

Both are consumed by the edge-partitioned DynamicEdgeConv
(parallel/dyn.py) and tested exact against the single-device build.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from deepmetv2_tpu.data.batching import Neighborhood
from deepmetv2_tpu.parallel.mesh import DATA_AXIS, NODE_AXIS


def knn_graph_sharded(
    x: jnp.ndarray,      # [B, N, D] features, N sharded over NODE_AXIS
    mask: jnp.ndarray,   # [B, N]
    k: int = 16,
    *,
    mesh: Mesh,
    loop: bool = False,
) -> Neighborhood:
    """Exact kNN over the full node axis with node-sharded queries."""
    n_node = mesh.shape[NODE_AXIS]
    B, N, D = x.shape
    n_loc = N // n_node

    def body(xs, ms):
        # xs [B, n_loc, D], ms [B, n_loc] — this shard's query rows.
        xg = jax.lax.all_gather(xs, NODE_AXIS, axis=1, tiled=True)  # [B,N,D]
        mg = jax.lax.all_gather(ms, NODE_AXIS, axis=1, tiled=True)  # [B,N]
        shard = jax.lax.axis_index(NODE_AXIS)
        row0 = shard * n_loc

        # ‖q − s‖² for local queries vs all sources, masked.
        d2 = (jnp.sum(xs * xs, axis=-1)[:, :, None]
              - 2.0 * jnp.einsum("bqd,bsd->bqs", xs, xg)
              + jnp.sum(xg * xg, axis=-1)[:, None, :])       # [B,n_loc,N]
        big = jnp.inf
        d2 = jnp.where(mg[:, None, :], d2, big)
        d2 = jnp.where(ms[:, :, None], d2, big)
        if not loop:
            gidx = row0 + jax.lax.broadcasted_iota(jnp.int32,
                                                   (n_loc, 1), 0)
            self_hit = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
                        == gidx)                              # [n_loc, N]
            d2 = jnp.where(self_hit[None], big, d2)

        neg, idx = jax.lax.top_k(-d2, k)                      # [B,n_loc,k]
        valid = jnp.isfinite(-neg)
        idx = jnp.where(valid, idx, 0).astype(jnp.int32)
        return idx, valid

    spec_x = P(DATA_AXIS, NODE_AXIS, None)
    spec_m = P(DATA_AXIS, NODE_AXIS)
    spec_nbr = P(DATA_AXIS, NODE_AXIS, None)
    idx, valid = shard_map(
        body, mesh=mesh,
        in_specs=(spec_x, spec_m),
        out_specs=(spec_nbr, spec_nbr),
        check_vma=False,
    )(x, mask)
    return Neighborhood(idx=idx, mask=valid)


def knn_graph_sharded_ring(
    x: jnp.ndarray,      # [B, N, D] features, N sharded over NODE_AXIS
    mask: jnp.ndarray,   # [B, N]
    k: int = 16,
    *,
    mesh: Mesh,
    loop: bool = False,
) -> Neighborhood:
    """Exact kNN with ring-rotated source blocks (see module docstring):
    same Neighborhood as ``knn_graph_sharded`` — global indices, sharded
    like the queries — without ever holding the full [B, N, D] block."""
    n_node = mesh.shape[NODE_AXIS]
    B, N, D = x.shape
    n_loc = N // n_node
    ring = [(i, (i + 1) % n_node) for i in range(n_node)]

    def body(xs, ms):
        shard = jax.lax.axis_index(NODE_AXIS)
        q_gid = (shard * n_loc
                 + jax.lax.broadcasted_iota(jnp.int32, (n_loc, 1), 0)[:, 0])
        q2 = jnp.sum(xs * xs, axis=-1)                         # [B, n_loc]
        big = jnp.inf

        def fold(carry, t):
            best_d, best_i, src, sm = carry
            src_shard = (shard - t) % n_node                   # block owner
            s_gid = (src_shard * n_loc + jax.lax.broadcasted_iota(
                jnp.int32, (1, n_loc), 1))                     # [1, n_loc]
            d2 = (q2[:, :, None]
                  - 2.0 * jnp.einsum("bqd,bsd->bqs", xs, src)
                  + jnp.sum(src * src, axis=-1)[:, None, :])   # [B,nq,ns]
            d2 = jnp.where(sm[:, None, :], d2, big)
            d2 = jnp.where(ms[:, :, None], d2, big)
            if not loop:
                d2 = jnp.where((q_gid[:, None] == s_gid)[None], big, d2)
            cat_d = jnp.concatenate([best_d, d2], axis=-1)
            cat_i = jnp.concatenate(
                [best_i,
                 jnp.broadcast_to(s_gid[None], d2.shape).astype(jnp.int32)],
                axis=-1)
            neg, sel = jax.lax.top_k(-cat_d, k)
            best_i = jnp.take_along_axis(cat_i, sel, axis=-1)
            # rotate the source block to the next chip (skippable on the
            # last fold, but a static loop keeps the schedule uniform)
            src = jax.lax.ppermute(src, NODE_AXIS, ring)
            sm = jax.lax.ppermute(sm, NODE_AXIS, ring)
            return (-neg, best_i, src, sm), None

        b_loc = xs.shape[0]            # data axis is sharded too
        init = (jnp.full((b_loc, n_loc, k), big, x.dtype),
                jnp.zeros((b_loc, n_loc, k), jnp.int32), xs, ms)
        (best_d, best_i, _, _), _ = jax.lax.scan(
            fold, init, jnp.arange(n_node))
        valid = jnp.isfinite(best_d)
        return jnp.where(valid, best_i, 0), valid

    spec_x = P(DATA_AXIS, NODE_AXIS, None)
    spec_m = P(DATA_AXIS, NODE_AXIS)
    spec_nbr = P(DATA_AXIS, NODE_AXIS, None)
    idx, valid = shard_map(
        body, mesh=mesh,
        in_specs=(spec_x, spec_m),
        out_specs=(spec_nbr, spec_nbr),
        check_vma=False,
    )(x, mask)
    return Neighborhood(idx=idx, mask=valid)
