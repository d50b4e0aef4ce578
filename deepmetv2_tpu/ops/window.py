"""Implicit windowed EdgeConv — the gather-free fast path.

For eta-sorted events (data/sorting.py), all radius-graph neighbors of a
node lie within ``halo`` index positions.  The EdgeConv aggregation over
the factorized message a_i + c_j (ops/edgeconv.py) then becomes a *masked
window reduction*:

    out_i = a_i + reduce_{w in [i-halo, i+halo]} [ adj(i, w) ? c_w : id ]

with the adjacency predicate adj(i, w) = ‖ηφ_i − ηφ_w‖² < r² evaluated
inline from positions.  No neighbor lists are ever built, no gather/
scatter executes, and the degree cap disappears (every in-radius neighbor
participates, unlike the reference's 255 cap — strictly more physics).
HBM traffic drops from O(N·K·H) gathered bytes to O(N·H·W/T) streamed
bytes, a ~K/(W/T) ≈ 50x reduction at reference scale.

This module is the XLA formulation (tiled, fully fused by the compiler);
ops/pallas/edgeconv_window.py provides the hand-scheduled TPU kernel with
identical semantics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["etaphi", "mask"],
    meta_fields=["r", "halo"],
)
@dataclasses.dataclass(frozen=True)
class WindowGraph:
    """Implicit radius graph over eta-sorted padded events.

    ``r`` (radius) and ``halo`` (sorted-order window bound, see
    data/sorting.required_halo) are static pytree metadata, so a
    WindowGraph flows through jit like a Neighborhood does."""

    etaphi: jnp.ndarray  # [B, N, 2]
    mask: jnp.ndarray    # [B, N]
    r: float = 0.4
    halo: int = 128


def _window_reduce_single(
    a: jnp.ndarray,        # [N, H] per-target term (+bias)
    c: jnp.ndarray,        # [N, H] per-source term
    etaphi: jnp.ndarray,   # [N, 2]
    mask: jnp.ndarray,     # [N]
    r2: float,
    halo: int,
    tile: int,
    reduction: str,
    wchunk: int = 128,
) -> jnp.ndarray:
    N, H = c.shape
    tile = min(tile, N)
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    W = tile + 2 * halo

    # Pad once: sources by halo on both sides (+wchunk so the last chunk's
    # dynamic_slice never clamps), queries to whole tiles.
    src_pad = halo + (Np - N) + wchunk
    cp = jnp.pad(c, ((halo, src_pad), (0, 0)))
    pp = jnp.pad(etaphi, ((halo, src_pad), (0, 0)))
    mp = jnp.pad(mask, (halo, src_pad))
    ap = None if a is None else jnp.pad(a, ((0, Np - N), (0, 0)))
    qp = jnp.pad(etaphi, ((0, Np - N), (0, 0)))
    qm = jnp.pad(mask, (0, Np - N))

    n_chunks = -(-W // wchunk)
    Wp = n_chunks * wchunk

    def one_tile(i):
        q = jax.lax.dynamic_slice_in_dim(qp, i * tile, tile)        # [T,2]
        qmask = jax.lax.dynamic_slice_in_dim(qm, i * tile, tile)    # [T]
        at = (None if ap is None
              else jax.lax.dynamic_slice_in_dim(ap, i * tile, tile))  # [T,H]

        def chunk(k, carry):
            acc, deg = carry
            s = i * tile + k * wchunk
            cw = jax.lax.dynamic_slice_in_dim(cp, s, wchunk)        # [Wc,H]
            pw = jax.lax.dynamic_slice_in_dim(pp, s, wchunk)        # [Wc,2]
            mw = jax.lax.dynamic_slice_in_dim(mp, s, wchunk)        # [Wc]
            # adjacency from positions (reference metric: plain euclidean,
            # no phi wraparound — train.py:47)
            d = q[:, None, :] - pw[None, :, :]
            d2 = jnp.sum(d * d, axis=-1)                            # [T,Wc]
            # chunk k covers absolute window offsets [k*wchunk, ...); mask
            # out the beyond-window tail of the last chunk
            off = jax.lax.broadcasted_iota(jnp.int32, (1, wchunk), 1) + k * wchunk
            adj = (d2 < r2) & mw[None, :] & qmask[:, None] & (off < W)
            if reduction == "max":
                m = jnp.where(adj[:, :, None], cw[None, :, :], -jnp.inf)
                acc = jnp.maximum(acc, jnp.max(m, axis=1))
            else:
                m = jnp.where(adj[:, :, None], cw[None, :, :], 0.0)
                acc = acc + jnp.sum(m, axis=1)
            deg = deg + jnp.sum(adj, axis=1)
            return acc, deg

        init = (jnp.full((tile, H), -jnp.inf if reduction == "max" else 0.0,
                         c.dtype),
                jnp.zeros((tile,), jnp.int32))
        acc, deg = jax.lax.fori_loop(0, n_chunks, chunk, init)

        if a is None:  # raw mode: (acc with -inf empties, degree)
            return acc, deg

        has = (deg > 0)[:, None]
        if reduction == "max":
            out = jnp.where(has, at + acc, 0.0)
        elif reduction == "mean":
            out = jnp.where(has, at + acc / jnp.maximum(deg, 1)[:, None], 0.0)
        elif reduction == "sum":
            out = deg[:, None].astype(c.dtype) * at + acc
        else:
            raise ValueError(reduction)
        return out

    if n_tiles == 1:
        res = one_tile(0)
        if a is None:
            return res[0][:N], res[1][:N]
        return res[:N]
    res = jax.lax.map(one_tile, jnp.arange(n_tiles))
    if a is None:
        acc, deg = res
        return acc.reshape(Np, H)[:N], deg.reshape(Np)[:N]
    return res.reshape(Np, H)[:N]


@functools.partial(jax.jit, static_argnames=("reduction", "tile"))
def window_edgeconv_linear(
    x: jnp.ndarray,            # [B, N, H]
    g: WindowGraph,
    weight: jnp.ndarray,       # [2H, Hout] rows [self; diff]
    bias: Optional[jnp.ndarray],
    reduction: str = "max",
    tile: int = 256,
) -> jnp.ndarray:
    """EdgeConv(linear MLP) over the implicit eta-sorted radius graph.

    Numerically identical to ``edgeconv_linear`` on the *uncapped* radius
    graph (every in-radius neighbor, incl. self-loop) whenever ``g.halo``
    >= data/sorting.required_halo.
    """
    H = x.shape[-1]
    w_self, w_diff = weight[:H], weight[H:]
    c = jnp.einsum("bnh,hf->bnf", x, w_diff, preferred_element_type=jnp.float32)
    a = jnp.einsum("bnh,hf->bnf", x, w_self - w_diff,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        a = a + bias
    fn = functools.partial(
        _window_reduce_single, r2=float(g.r) ** 2, halo=g.halo, tile=tile,
        reduction=reduction)
    return jax.vmap(fn)(a, c, g.etaphi, g.mask)


@functools.partial(jax.jit, static_argnames=("r2", "halo", "tile"))
def window_max_xla(
    c: jnp.ndarray,        # [B, N, H]
    pos: jnp.ndarray,      # [B, N, 2]
    mask: jnp.ndarray,     # [B, N]
    r2: float,
    halo: int,
    tile: int = 256,
) -> jnp.ndarray:
    """XLA counterpart of the Pallas ``window_max`` kernel: masked window
    max of ``c`` with -inf where a node has no in-radius neighbor.  Used as
    the CPU/test implementation inside the halo-exchange sharded path."""
    fn = functools.partial(_window_reduce_single, r2=r2, halo=halo,
                           tile=tile, reduction="max")
    acc, _ = jax.vmap(lambda cc, pp, mm: fn(None, cc, pp, mm))(c, pos, mask)
    return acc
