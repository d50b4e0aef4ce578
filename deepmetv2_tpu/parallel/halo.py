"""Edge-partitioned EdgeConv with halo exchange — the long-event scaling
path (SURVEY.md §5 "long-context" analog; BASELINE.json north star).

The reference caps per-node work at 255 neighbors on one GPU
(reference train.py:48); here an event's (eta-sorted, padded) node axis is
sharded across chips.  Because the implicit window formulation
(ops/window.py) makes every node's neighborhood a ±halo slice of the
sorted order, distribution is exact and cheap:

  * each chip owns a contiguous node shard plus its incident "edges"
    (implicitly, via the window predicate);
  * before aggregating, chips exchange ``halo`` boundary rows of the
    per-source term c and positions with their two ring neighbors — one
    ``ppermute`` each way over ICI (the GNN analog of ring attention's
    block exchange);
  * aggregation then runs fully locally (Pallas kernel on TPU, XLA window
    elsewhere) on the halo-extended shard.

Communication volume per layer is O(B · halo · H) per chip — independent
of shard size — so scaling efficiency approaches 1 as events grow.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from deepmetv2_tpu.ops.window import WindowGraph, window_max_xla

PAD_POS = 1e9


def _edge_exchange(arr: jnp.ndarray, halo: int, axis_name: str,
                   n_shards: int, boundary):
    """Exchange boundary strips with the two ring neighbors: returns
    ``(from_left, from_right)``, each ``[B, halo, F]`` — the right edge of
    the left neighbor and the left edge of the right neighbor.  Ring ends
    are filled with ``boundary`` (a scalar or per-feature [F] vector;
    ppermute leaves missing sources as zeros, which would alias real
    data)."""
    send_right = arr[:, -halo:]       # becomes right neighbor's left halo
    send_left = arr[:, :halo]         # becomes left neighbor's right halo
    from_left = jax.lax.ppermute(
        send_right, axis_name, [(i, i + 1) for i in range(n_shards - 1)])
    from_right = jax.lax.ppermute(
        send_left, axis_name, [(i + 1, i) for i in range(n_shards - 1)])
    idx = jax.lax.axis_index(axis_name)
    from_left = jnp.where(idx == 0, boundary, from_left)
    from_right = jnp.where(idx == n_shards - 1, boundary, from_right)
    return from_left, from_right


def _halo_exchange(arr: jnp.ndarray, halo: int, axis_name: str,
                   n_shards: int, boundary_value: float) -> jnp.ndarray:
    """[B, n_loc, F] → [B, halo + n_loc + halo, F] halo-extended shard."""
    from_left, from_right = _edge_exchange(arr, halo, axis_name, n_shards,
                                           boundary_value)
    return jnp.concatenate([from_left, arr, from_right], axis=1)


def window_max_sharded(
    c: jnp.ndarray,        # [B, N, H] (node axis shardable)
    pos: jnp.ndarray,      # [B, N, 2] (+1e9 rows for padded nodes)
    r2: float,
    halo: int,
    mesh: Mesh,
    node_axis: str = "node",
    data_axis: Optional[str] = "data",
    interpret: bool = False,
    overlap: bool = True,
) -> jnp.ndarray:
    """Node-sharded masked window max: numerically identical to the
    single-device ``window_max`` but with the node axis partitioned over
    ``mesh[node_axis]`` and halos exchanged via ppermute.

    ``overlap=True`` (default, requires shard size >= 2·halo) uses the
    split schedule: the ppermutes are issued FIRST, then the interior rows
    (queries >= halo from the shard edges — their whole window is local)
    are computed as a pure function of the local shard, with no data
    dependency on the collectives, so XLA's async collective machinery can
    run the exchange and the interior aggregation concurrently; the two
    boundary strips (one batched kernel call) consume the halos last.
    ``overlap=False`` (or shard < 2·halo) is plain exchange-then-compute.
    """
    n_shards = mesh.shape[node_axis]
    # align the exchanged halo so the local kernel's tiling stays aligned
    halo_pad = -(-halo // 64) * 64
    n_loc = c.shape[1] // n_shards
    if halo_pad > n_loc:
        raise ValueError(
            f"halo {halo_pad} exceeds node-shard size {n_loc} "
            f"({c.shape[1]} nodes / {n_shards} shards): single-hop halo "
            f"exchange needs shard >= halo; use fewer node shards or a "
            f"larger node bucket")
    overlap = overlap and n_loc >= 2 * halo_pad

    def kernel(c_arr, pos_arr):
        """Masked window max on one halo-self-contained array."""
        if interpret or jax.default_backend() == "cpu":
            mask = pos_arr[..., 0] < PAD_POS / 2
            return window_max_xla(c_arr, pos_arr, mask, r2, halo_pad)
        from deepmetv2_tpu.ops.pallas.edgeconv_window import window_max

        return window_max(c_arr, pos_arr, r2, halo_pad)

    def local_overlap(c_loc, pos_loc):
        B, _, H = c_loc.shape
        h = halo_pad
        # 1. issue the halo exchange — ONE fused [c ‖ pos] message pair so
        # both rides leave together; ring-end fill is per-feature (0 for c,
        # PAD_POS for pos so missing rows are never adjacent).
        payload = jnp.concatenate([c_loc, pos_loc], axis=-1)
        fill = jnp.concatenate([jnp.zeros((H,), c_loc.dtype),
                                jnp.full((2,), PAD_POS, pos_loc.dtype)])
        fl, fr = _edge_exchange(payload, h, node_axis, n_shards, fill)
        # 2. interior rows — computed from the LOCAL shard only (edge rows
        # of m_local see truncated windows and are discarded below); no
        # dependency on fl/fr, so this overlaps with the exchange.
        m_local = kernel(c_loc, pos_loc)
        # 3. boundary strips: left queries [0,h) need [from_left ‖ local
        # rows [0,2h)]; right queries [n_loc-h, n_loc) the mirror.  Batched
        # into one kernel call; queries sit at strip rows [h, 2h).
        left = jnp.concatenate([fl, payload[:, : 2 * h]], axis=1)
        right = jnp.concatenate([payload[:, -2 * h:], fr], axis=1)
        strip = jnp.concatenate([left, right], axis=0)    # [2B, 3h, H+2]
        m_strip = kernel(strip[..., :H], strip[..., H:])
        m_left, m_right = m_strip[:B, h: 2 * h], m_strip[B:, h: 2 * h]
        return jnp.concatenate([m_left, m_local[:, h:-h], m_right], axis=1)

    def local_serial(c_loc, pos_loc):
        c_ext = _halo_exchange(c_loc, halo_pad, node_axis, n_shards, 0.0)
        pos_ext = _halo_exchange(pos_loc, halo_pad, node_axis, n_shards,
                                 PAD_POS)
        return kernel(c_ext, pos_ext)[:, halo_pad:-halo_pad]

    bspec = P(data_axis, node_axis, None) if data_axis else P(None, node_axis, None)
    return shard_map(
        local_overlap if overlap else local_serial, mesh=mesh,
        in_specs=(bspec, bspec),
        out_specs=bspec,
        check_vma=False,
    )(c, pos)


def window_edgeconv_linear_sharded(
    x: jnp.ndarray,            # [B, N, H]
    g: WindowGraph,
    weight: jnp.ndarray,       # [2H, Hout]
    bias: Optional[jnp.ndarray],
    mesh: Mesh,
    node_axis: str = "node",
    data_axis: Optional[str] = "data",
    interpret: bool = False,
) -> jnp.ndarray:
    """Edge-partitioned EdgeConv(linear, max): GEMMs shard trivially along
    nodes; the aggregation runs via the halo-exchange window max."""
    H = x.shape[-1]
    w_self, w_diff = weight[:H], weight[H:]
    c = jnp.einsum("bnh,hf->bnf", x, w_diff, preferred_element_type=jnp.float32)
    a = jnp.einsum("bnh,hf->bnf", x, w_self - w_diff,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        a = a + bias
    pos = jnp.where(g.mask[..., None], g.etaphi, PAD_POS)
    m = window_max_sharded(c, pos, float(g.r) ** 2, g.halo, mesh,
                           node_axis, data_axis, interpret)
    # Padded nodes share the PAD_POS sentinel and are mutually adjacent
    # (distance 0), so the Pallas branch returns finite m there; mask them
    # out explicitly (contract: 0 output / 0 gradient at padded nodes).
    has = jnp.isfinite(m[..., :1]) & g.mask[..., None]
    return jnp.where(has, a + jnp.where(has, m, 0.0), 0.0)
