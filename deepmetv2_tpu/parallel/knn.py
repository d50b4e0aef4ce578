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

This is the building block for an edge-partitioned DynamicEdgeConv.  For
the DRN model itself data parallelism (parallel/dp.make_drn_dp_train_step)
is the practical distribution — 6.8k parameters, per-event graphs — so the
full node-sharded DRN forward is not wired; the kNN primitive is here,
tested exact against the single-device build.
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
