"""Pallas TPU kernel: fused DRN edge-MLP EdgeConv (tier 2).

The DRN's per-round EdgeConv (reference
model/dynamic_reduction_network.py:61-79) is

    out_i = aggr_{j in N(i)} BN(elu(W1 elu(W0 [x_i ‖ x_j − x_i] + b0) + b1))

with BatchNorm over the valid *edge messages*.  The XLA formulation
(ops/edgeconv.edgeconv_mlp / models/drn._drn_edgeconv) materializes every
edge tensor — gather [B,N,K,F], two GEMM activations, the BN output, the
masked select — in HBM: ~1.3 GB of round-trips per forward at
B8/N2048/K32/H64, measured 9.9 ms fwd+bwd per round on v5e.  The FLOPs
are only ~6.4 GFLOP (≈0.1 ms of MXU): the op is pure HBM traffic.

TPU-first redesign, three moves:

1. **Factor the first layer** (as models/drn already does): with
   W0 = [W_self; W_diff] over the concat, the edge input is
   a_i + x_j·W_diff where a = x(W_self − W_diff) + b0 is node-level.
   Only x_j (H wide — the narrowest possible edge tensor) is gathered.

2. **Commute BatchNorm through the aggregation.**  BN is per-channel
   affine: BN(h) = coef·h + shift with coef = γ/√(var+ε),
   shift = β − mean·coef.  Per channel this is monotone, so

       max_j BN(h_j) = coef>0 ? coef·max_j h_j + shift
                              : coef·min_j h_j + shift
       sum_j BN(h_j) = coef·sum_j h_j + deg·shift

   and the batch statistics themselves are plain sums (Σh, Σh²) over
   valid edges.  The kernel therefore only has to emit *node-level*
   reductions (max/min or sum of the raw messages) plus two [H]
   accumulators — the [B,N,K,H] message tensor never exists outside
   VMEM.  The affine combine runs in XLA on [B,N,H] tensors, keeping
   γ/β/statistics differentiable through ordinary autodiff.

3. **One kernel per direction**, grid (B, N/T): stream the gathered
   x_j tile [T·K, H] from HBM, run both edge GEMMs on the MXU in VMEM,
   reduce, and accumulate weight gradients across the grid in revisited
   output blocks (the grid is sequential on a TPU core, so += into a
   resident block is race-free).

Gather note: Mosaic has no large-table dynamic gather (sublane gather is
single-vreg only — probed), so the x_j gather itself stays in XLA where
it is one [B,N,K,H] take_along_axis; everything downstream of it fuses.

Backward routes max/min gradients to EVERY argmax tie (the same
convention as ops/pallas/edgeconv_window; XLA's reduce-max adjoint
splits evenly among ties instead — identical in generic position).

No torch anywhere; from-scratch Pallas.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
POS_INF = float("inf")


def _elu(z):
    safe = jnp.where(z > 0, 0.0, z)
    return jnp.where(z > 0, z, jnp.exp(safe) - 1.0)


def _delu(z):
    """elu'(z) = 1 for z>0 else exp(z)."""
    safe = jnp.where(z > 0, 0.0, z)
    return jnp.where(z > 0, 1.0, jnp.exp(safe))


def _messages(a, xj, wd_ref, w1_ref, b1_ref, T, K):
    """Shared fwd recompute: returns (z0, e0, z1, h) for one tile.
    a: [T, F1]; xj: [T*K, H]."""
    cj = jnp.dot(xj, wd_ref[:], preferred_element_type=jnp.float32)
    F1 = cj.shape[-1]
    z0 = cj.reshape(T, K, F1) + a[:, None, :]
    e0 = _elu(z0)
    z1 = (jnp.dot(e0.reshape(T * K, F1), w1_ref[:],
                  preferred_element_type=jnp.float32)
          + b1_ref[0][None, :])
    h = _elu(z1)
    return z0, e0, z1, h  # h: [T*K, H2]


def _fwd_kernel(a_ref, xj_ref, mf_ref, wd_ref, w1_ref, b1_ref,
                *out_refs, aggr, T, K):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    _, _, _, h = _messages(a_ref[0], xj_ref[0], wd_ref, w1_ref, b1_ref, T, K)
    H2 = h.shape[-1]
    h3 = h.reshape(T, K, H2)
    m3 = mf_ref[0][:, :, None] > 0
    hm = jnp.where(m3, h3, 0.0)

    if aggr == "max":
        agg0_ref, agg1_ref, stats_ref = out_refs
        agg0_ref[0] = jnp.max(jnp.where(m3, h3, NEG_INF), axis=1)
        agg1_ref[0] = jnp.min(jnp.where(m3, h3, POS_INF), axis=1)
    else:
        agg0_ref, stats_ref = out_refs
        agg0_ref[0] = jnp.sum(hm, axis=1)

    ps = jnp.sum(hm, axis=(0, 1))
    pq = jnp.sum(hm * hm, axis=(0, 1))

    @pl.when(first)
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    stats_ref[0, :] += ps
    stats_ref[1, :] += pq


def _bwd_kernel(a_ref, xj_ref, mf_ref, wd_ref, w1_ref, b1_ref,
                g0_ref, g1_ref, gst_ref, r0_ref, r1_ref,
                da_ref, dxj_ref, dwd_ref, dw1_ref, db1_ref,
                *, aggr, T, K):
    """g0/g1: cotangents of agg0/agg1 ([B,N,H2] tiles; g1 zeros-shaped
    dummy for sum aggregation), gst: [2, H2] global stats cotangent,
    r0/r1: the fwd agg0/agg1 values (tie detection; dummies for sum)."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    a = a_ref[0]
    xj = xj_ref[0]
    z0, e0, z1, h = _messages(a, xj, wd_ref, w1_ref, b1_ref, T, K)
    F1 = z0.shape[-1]
    H2 = h.shape[-1]
    h3 = h.reshape(T, K, H2)
    m3 = mf_ref[0][:, :, None] > 0

    if aggr == "max":
        # argmax/argmin gradient split EVENLY among exact ties over valid
        # slots — matches XLA's reduce-max adjoint bit-for-bit (verified
        # convention), so fused == composed even on degenerate graphs
        # with duplicate slots
        tie0 = (h3 == r0_ref[0][:, None, :]) & m3
        tie1 = (h3 == r1_ref[0][:, None, :]) & m3
        c0 = jnp.maximum(jnp.sum(tie0.astype(jnp.float32), axis=1), 1.0)
        c1 = jnp.maximum(jnp.sum(tie1.astype(jnp.float32), axis=1), 1.0)
        dh = (jnp.where(tie0, (g0_ref[0] / c0)[:, None, :], 0.0)
              + jnp.where(tie1, (g1_ref[0] / c1)[:, None, :], 0.0))
    else:
        dh = jnp.broadcast_to(g0_ref[0][:, None, :], h3.shape)
    dh = dh + gst_ref[0, :][None, None, :] + 2.0 * h3 * gst_ref[1, :][None,
                                                                      None, :]
    dh = jnp.where(m3, dh, 0.0).reshape(T * K, H2)

    dz1 = dh * _delu(z1)
    e0f = e0.reshape(T * K, F1)
    # weight-gradient partials, accumulated across the sequential grid
    dw1_p = jax.lax.dot_general(e0f, dz1, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    db1_p = jnp.sum(dz1, axis=0)
    de0 = jnp.dot(dz1, w1_ref[:].T, preferred_element_type=jnp.float32)
    dz0 = (de0.reshape(T, K, F1) * _delu(z0))
    da_ref[0] = jnp.sum(dz0, axis=1)
    dz0f = dz0.reshape(T * K, F1)
    dwd_p = jax.lax.dot_general(xj, dz0f, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dxj_ref[0] = jnp.dot(dz0f, wd_ref[:].T,
                         preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        dwd_ref[:] = jnp.zeros_like(dwd_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    dwd_ref[:] += dwd_p
    dw1_ref[:] += dw1_p
    db1_ref[0, :] += db1_p


def _pick_tile(n: int, limit: int = 128) -> Optional[int]:
    """Largest multiple-of-8 divisor of n that is <= limit."""
    t = min(limit, n)
    while t >= 8:
        if n % t == 0 and t % 8 == 0:
            return t
        t -= 8
    return None


def supported(n: int, k: int, h: int, f1: int, h2: int) -> bool:
    return (_pick_tile(n) is not None and h % 8 == 0 and f1 % 8 == 0
            and h2 % 8 == 0 and k >= 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _edge_stats_agg(a, xj, maskf, wd, w1, b1, aggr: str, tile: int,
                    interpret: bool):
    return _edge_stats_agg_impl(a, xj, maskf, wd, w1, b1, aggr, tile,
                                interpret)


def _common_in_specs(T, K, H, F1, H2):
    return [
        pl.BlockSpec((1, T, F1), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),            # a
        pl.BlockSpec((1, T * K, H), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),            # xj (flat)
        pl.BlockSpec((1, T, K), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),            # maskf
        pl.BlockSpec((H, F1), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),            # w_diff
        pl.BlockSpec((F1, H2), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),            # w1
        pl.BlockSpec((1, H2), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),            # b1
    ]


def _edge_stats_agg_impl(a, xj, maskf, wd, w1, b1, aggr, tile, interpret):
    B, N, F1 = a.shape
    K = maskf.shape[-1]
    H = xj.shape[-1]
    H2 = w1.shape[-1]
    T = tile
    xjf = xj.reshape(B, N * K, H)
    b1r = b1.reshape(1, H2)

    node_spec = pl.BlockSpec((1, T, H2), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((2, H2), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)
    if aggr == "max":
        out_specs = (node_spec, node_spec, stats_spec)
        out_shape = (
            jax.ShapeDtypeStruct((B, N, H2), jnp.float32),
            jax.ShapeDtypeStruct((B, N, H2), jnp.float32),
            jax.ShapeDtypeStruct((2, H2), jnp.float32),
        )
    else:
        out_specs = (node_spec, stats_spec)
        out_shape = (
            jax.ShapeDtypeStruct((B, N, H2), jnp.float32),
            jax.ShapeDtypeStruct((2, H2), jnp.float32),
        )

    return pl.pallas_call(
        functools.partial(_fwd_kernel, aggr=aggr, T=T, K=K),
        grid=(B, N // T),
        in_specs=_common_in_specs(T, K, H, F1, H2),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(a, xjf, maskf, wd, w1, b1r)


def _esa_fwd(a, xj, maskf, wd, w1, b1, aggr, tile, interpret):
    outs = _edge_stats_agg_impl(a, xj, maskf, wd, w1, b1, aggr, tile,
                                interpret)
    return outs, (a, xj, maskf, wd, w1, b1, outs)


def _esa_bwd(aggr, tile, interpret, res, g):
    a, xj, maskf, wd, w1, b1, outs = res
    B, N, F1 = a.shape
    K = maskf.shape[-1]
    H = xj.shape[-1]
    H2 = w1.shape[-1]
    T = tile
    xjf = xj.reshape(B, N * K, H)
    b1r = b1.reshape(1, H2)

    if aggr == "max":
        g0, g1, gst = g
        r0, r1 = outs[0], outs[1]
    else:
        g0, gst = g
        zeros = jnp.zeros_like(g0)
        g1, r0, r1 = zeros, zeros, zeros

    node_spec = pl.BlockSpec((1, T, H2), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((2, H2), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)

    da, dxjf, dwd, dw1, db1 = pl.pallas_call(
        functools.partial(_bwd_kernel, aggr=aggr, T=T, K=K),
        grid=(B, N // T),
        in_specs=(_common_in_specs(T, K, H, F1, H2)
                  + [node_spec, node_spec, stats_spec,  # g0, g1, gst
                     node_spec, node_spec]),            # r0, r1
        out_specs=(
            pl.BlockSpec((1, T, F1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),             # da
            pl.BlockSpec((1, T * K, H), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),             # dxj
            pl.BlockSpec((H, F1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),             # dwd
            pl.BlockSpec((F1, H2), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),             # dw1
            pl.BlockSpec((1, H2), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),             # db1
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, F1), jnp.float32),
            jax.ShapeDtypeStruct((B, N * K, H), jnp.float32),
            jax.ShapeDtypeStruct((H, F1), jnp.float32),
            jax.ShapeDtypeStruct((F1, H2), jnp.float32),
            jax.ShapeDtypeStruct((1, H2), jnp.float32),
        ),
        interpret=interpret,
    )(a, xjf, maskf, wd, w1, b1r, g0, g1, gst, r0, r1)
    return (da, dxjf.reshape(B, N, K, H), jnp.zeros_like(maskf), dwd, dw1,
            db1.reshape(H2))


_edge_stats_agg.defvjp(_esa_fwd, _esa_bwd)


def edge_mlp_conv(
    x: jnp.ndarray,        # [B, N, H] node features
    xj: jnp.ndarray,       # [B, N, K, H] gathered neighbor features
    mask: jnp.ndarray,     # [B, N, K] bool edge validity
    mlp_params,            # {'lin0': {w [2H,F1], b}, 'lin1': {w [F1,H2], b}}
    gamma: jnp.ndarray,    # [H2]
    beta: jnp.ndarray,     # [H2]
    run_mean: jnp.ndarray,
    run_var: jnp.ndarray,
    train: bool,
    aggr: str = "add",
    eps: float = 1e-5,
    tile: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused DRN EdgeConv: returns (out [B,N,H2], batch_mean, batch_var)
    where batch_var is the biased variance over valid edge messages
    (caller derives the unbiased running update).  In eval mode the
    running statistics are used and the returned mean/var are them.

    Exactly ``aggr``-reduce of BN(edge-MLP messages) as in
    models/drn._drn_edgeconv, with BN commuted through the reduction
    (see module docstring); float summation order differs (documented).
    """
    H = x.shape[-1]
    w0, b0 = mlp_params["lin0"]["w"], mlp_params["lin0"]["b"]
    w1, b1 = mlp_params["lin1"]["w"], mlp_params["lin1"]["b"]
    w_self, w_diff = w0[:H], w0[H:]
    a = jnp.einsum("bnh,hf->bnf", x, w_self - w_diff,
                   preferred_element_type=jnp.float32) + b0
    maskf = mask.astype(jnp.float32)
    if tile is None:
        tile = _pick_tile(x.shape[1])
        assert tile is not None, "edge_mlp_conv: unsupported N"

    outs = _edge_stats_agg(a, xj, maskf, w_diff, w1, b1, aggr, tile,
                           interpret)
    if aggr == "max":
        maxh, minh, stats = outs
    else:
        sumh, stats = outs

    deg = jnp.sum(maskf, axis=-1)                      # [B, N]
    n = jnp.maximum(jnp.sum(deg), 1.0)
    if train:
        mean = stats[0] / n
        var = jnp.maximum(stats[1] / n - mean * mean, 0.0)
    else:
        mean, var = run_mean, run_var
    coef = gamma * jax.lax.rsqrt(var + eps)            # [H2]
    shift = beta - mean * coef

    has = (deg > 0)[..., None]
    if aggr == "max":
        # empty rows hold ±inf sentinels; zero them BEFORE the affine so
        # no inf enters the autodiff graph (0·inf = NaN in the coef
        # cotangent) — the outer `has` mask discards them anyway
        maxh = jnp.where(has, maxh, 0.0)
        minh = jnp.where(has, minh, 0.0)
        picked = jnp.where(coef[None, None, :] > 0, maxh, minh)
        out = jnp.where(has, picked * coef + shift, 0.0)
    elif aggr == "add":
        out = jnp.where(has, sumh * coef + deg[..., None] * shift, 0.0)
    elif aggr == "mean":
        d = jnp.maximum(deg, 1.0)[..., None]
        out = jnp.where(has, (sumh / d) * coef + shift, 0.0)
    else:
        raise ValueError(f"unknown aggr {aggr!r}")
    return out, mean, var
