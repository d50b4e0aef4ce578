"""Pallas TPU kernel: implicit windowed EdgeConv aggregation.

The hot op of the flagship model (SURVEY.md §3.3): for eta-sorted events,
``m_i = max_{w : ‖ηφ_i − ηφ_w‖² < r²} c_w`` over a contiguous index window
— the gather-free form of radius-graph EdgeConv-max (see ops/window.py for
the XLA formulation and the math).

Kernel structure (forward), grid = (B, N/T):
  * the per-source array ``c`` and positions stay in HBM; each program DMAs
    its tile's window ``[W, F]`` into VMEM scratch (W = T + 2·halo);
  * adjacency is computed inline from positions on the VPU — the graph is
    never materialized — and applied as an arithmetic -inf bias (Mosaic
    cannot reshape bool vectors to 3D);
  * the window is swept in 8-row (sublane) chunks; each chunk does aligned
    [T, 8, F] elementwise work, accumulating a running max into [T, F].

TPU layout constraints honored here (Mosaic requires the minor dim of 3D
vectors and all lane-dim slices to be 128-aligned):
  * features ride the lane axis at F = round_up(H, 128) (wrapper pads);
  * positions are carried in a 128-lane array (eta in lane 0, phi lane 1)
    and reduced with an in-kernel lane mask — no 2-wide slices anywhere;
  * window chunks advance along sublanes (multiples of 8).

Padding contract (arranged by the wrapper): position rows outside the real
event carry +1e9, so padded nodes are never adjacent to anything and the
kernel needs no mask input.  Empty rows yield -inf, turned into the PyG
empty-neighborhood convention (0) by the wrapper.

Backward is the mirrored kernel: grad routes to every argmax tie
(c[s,h] == m[q,h] under adjacency), recomputing adjacency from positions —
no residual graph storage at all.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepmetv2_tpu.ops.window import WindowGraph

NEG_INF = float("-inf")  # python float: jnp consts can't be captured by kernels
PAD_POS = 1e9
LANE = 128
WCHUNK = 8  # window sublane chunk


def _lane_mask_f32(shape3):
    """[1, 1, 128] mask selecting lanes 0 (eta) and 1 (phi)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    return jnp.where(lanes < 2, 1.0, 0.0)


def _fwd_kernel(c_hbm, pos_hbm, q_ref, out_ref, cwin, pwin, sems,
                *, tile, w_win, r2):
    b = pl.program_id(0)
    i = pl.program_id(1)
    s = i * tile  # window start in the halo-padded source arrays

    cp = pltpu.make_async_copy(c_hbm.at[b, pl.ds(s, w_win), :], cwin,
                               sems.at[0])
    pp = pltpu.make_async_copy(pos_hbm.at[b, pl.ds(s, w_win), :], pwin,
                               sems.at[1])
    cp.start()
    pp.start()
    q = q_ref[0]                      # [T, 128] query positions (lanes 0,1)
    cp.wait()
    pp.wait()

    T = q.shape[0]
    F = cwin.shape[1]
    lmask = _lane_mask_f32((1, 1, LANE))
    n_chunks = w_win // WCHUNK

    def chunk(k, acc):
        pw = pwin[pl.ds(k * WCHUNK, WCHUNK), :]          # [Wc, 128]
        cw = cwin[pl.ds(k * WCHUNK, WCHUNK), :]          # [Wc, F]
        diff = q[:, None, :] - pw[None, :, :]            # [T, Wc, 128]
        d2 = jnp.sum(diff * diff * lmask, axis=2)        # [T, Wc]
        bias = jnp.where(d2 < r2, 0.0, NEG_INF)          # [T, Wc]
        masked = cw[None, :, :] + bias[:, :, None]       # [T, Wc, F]
        return jnp.maximum(acc, jnp.max(masked, axis=1))

    acc0 = jnp.full((T, F), NEG_INF, cwin.dtype)
    out_ref[0] = jax.lax.fori_loop(0, n_chunks, chunk, acc0)


def _bwd_kernel(pos_hbm, m_hbm, g_hbm, ct_ref, pt_ref, dc_ref,
                mwin, gwin, pwin, sems, *, tile, w_win, r2):
    """dc[s,h] = Σ_q [adj(q,s) ∧ c[s,h] == m[q,h]] · g[q,h].

    Source-tile centric: the queries whose windows include source s lie in
    the same symmetric window around s, so the structure mirrors forward
    with (m, g) windows DMA'd instead of c."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    s = i * tile

    mc = pltpu.make_async_copy(m_hbm.at[b, pl.ds(s, w_win), :], mwin, sems.at[0])
    gc = pltpu.make_async_copy(g_hbm.at[b, pl.ds(s, w_win), :], gwin, sems.at[1])
    pc = pltpu.make_async_copy(pos_hbm.at[b, pl.ds(s, w_win), :], pwin, sems.at[2])
    mc.start()
    gc.start()
    pc.start()
    ct = ct_ref[0]                    # [T, F] this tile's c values
    pt = pt_ref[0]                    # [T, 128] this tile's positions
    mc.wait()
    gc.wait()
    pc.wait()

    lmask = _lane_mask_f32((1, 1, LANE))
    n_chunks = w_win // WCHUNK

    def chunk(k, acc):
        pw = pwin[pl.ds(k * WCHUNK, WCHUNK), :]          # [Wc, 128] query pos
        mw = mwin[pl.ds(k * WCHUNK, WCHUNK), :]          # [Wc, F] query max
        gw = gwin[pl.ds(k * WCHUNK, WCHUNK), :]          # [Wc, F] query grad
        diff = pt[:, None, :] - pw[None, :, :]           # [T, Wc, 128]
        d2 = jnp.sum(diff * diff * lmask, axis=2)        # [T, Wc]
        adjf = jnp.where(d2 < r2, 1.0, 0.0)              # [T, Wc]
        eq = ct[:, None, :] == mw[None, :, :]            # [T, Wc, F] bool
        hit = jnp.where(eq, adjf[:, :, None], 0.0)       # [T, Wc, F]
        return acc + jnp.sum(hit * gw[None, :, :], axis=1)

    acc0 = jnp.zeros((ct.shape[0], ct.shape[1]), ct.dtype)
    dc_ref[0] = jax.lax.fori_loop(0, n_chunks, chunk, acc0)


def _pad_lane(arr, value=0.0):
    """Pad the feature axis up to a lane multiple."""
    H = arr.shape[-1]
    F = -(-H // LANE) * LANE
    if F == H:
        return arr
    return jnp.pad(arr, ((0, 0), (0, 0), (0, F - H)), constant_values=value)


def _grid_params(N, halo, tile):
    assert N % tile == 0, f"N={N} must be a multiple of tile={tile}"
    halo_pad = -(-halo // WCHUNK) * WCHUNK           # align halo to chunks
    w_win = tile + 2 * halo_pad
    assert w_win % WCHUNK == 0
    return halo_pad, w_win


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def window_max(c, pos, r2: float, halo: int, tile: int = 128,
               interpret: bool = False):
    """``m[b,i,:] = max over w with ‖pos_i − pos_w‖² < r2 of c[b,w,:]``
    (window-limited to ±halo in the sorted order); -inf where no neighbor.

    ``pos`` is ``[B, N, 2]`` with +1e9 rows for padded nodes (see wrapper).
    """
    return _window_max_impl(c, pos, r2, halo, tile, interpret)


def _prep_pos(pos, halo_pad):
    """[B, N, 2] → halo-padded [B, Np, 128] (eta lane 0, phi lane 1,
    padding rows at +1e9)."""
    p = jnp.pad(pos, ((0, 0), (halo_pad, halo_pad), (0, 0)),
                constant_values=PAD_POS)
    return jnp.pad(p, ((0, 0), (0, 0), (0, LANE - p.shape[-1])))


def _window_max_impl(c, pos, r2, halo, tile, interpret):
    B, N, H = c.shape
    tile = min(tile, N)
    halo_pad, w_win = _grid_params(N, halo, tile)
    cpad = _pad_lane(jnp.pad(c, ((0, 0), (halo_pad, halo_pad), (0, 0))))
    ppad = _prep_pos(pos, halo_pad)
    qpos = _prep_pos(pos, 0)
    F = cpad.shape[-1]

    kernel = functools.partial(_fwd_kernel, tile=tile, w_win=w_win, r2=r2)
    m = pl.pallas_call(
        kernel,
        grid=(B, N // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),            # c_pad (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),            # pos_pad (HBM)
            pl.BlockSpec((1, tile, LANE), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),           # query pos tile
        ],
        out_specs=pl.BlockSpec((1, tile, F), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, F), c.dtype),
        scratch_shapes=[
            pltpu.VMEM((w_win, F), c.dtype),
            pltpu.VMEM((w_win, LANE), pos.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(cpad, ppad, qpos)
    return m[..., :H]


def _window_max_fwd(c, pos, r2, halo, tile, interpret):
    m = _window_max_impl(c, pos, r2, halo, tile, interpret)
    return m, (c, pos, m)


def _window_max_bwd(r2, halo, tile, interpret, res, g):
    c, pos, m = res
    B, N, H = c.shape
    tile_ = min(tile, N)
    halo_pad, w_win = _grid_params(N, halo, tile_)
    # m of padded/empty rows is -inf; grads there are irrelevant but must
    # not poison the equality check -> replace by +inf (never equals a real
    # c) and zero the incoming grad.  Lane padding uses the same sentinels.
    inf = float("inf")
    finite = jnp.isfinite(m)
    m_safe = jnp.where(finite, m, inf)
    g_safe = jnp.where(finite, g, 0.0)
    mpad = _pad_lane(jnp.pad(m_safe, ((0, 0), (halo_pad, halo_pad), (0, 0)),
                             constant_values=inf), value=inf)
    gpad = _pad_lane(jnp.pad(g_safe, ((0, 0), (halo_pad, halo_pad), (0, 0))))
    ppad = _prep_pos(pos, halo_pad)
    qpos = _prep_pos(pos, 0)
    cl = _pad_lane(c)
    F = cl.shape[-1]

    kernel = functools.partial(_bwd_kernel, tile=tile_, w_win=w_win, r2=r2)
    dc = pl.pallas_call(
        kernel,
        grid=(B, N // tile_),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),            # pos_pad (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),            # m_pad (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),            # g_pad (HBM)
            pl.BlockSpec((1, tile_, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),           # c tile
            pl.BlockSpec((1, tile_, LANE), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),           # pos tile
        ],
        out_specs=pl.BlockSpec((1, tile_, F), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, F), c.dtype),
        scratch_shapes=[
            pltpu.VMEM((w_win, F), c.dtype),                 # m window
            pltpu.VMEM((w_win, F), c.dtype),                 # g window
            pltpu.VMEM((w_win, LANE), pos.dtype),            # pos window
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(ppad, mpad, gpad, cl, qpos)
    return dc[..., :H], jnp.zeros_like(pos)


window_max.defvjp(_window_max_fwd, _window_max_bwd)


def window_edgeconv_linear_pallas(
    x: jnp.ndarray,            # [B, N, H]
    g: WindowGraph,
    weight: jnp.ndarray,       # [2H, Hout] rows [self; diff]
    bias: Optional[jnp.ndarray],
    tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in equivalent of ops/window.window_edgeconv_linear('max') with
    the aggregation running as a Pallas kernel.  The GEMMs stay in XLA
    (MXU-friendly as-is); only the irregular part is hand-scheduled."""
    H = x.shape[-1]
    w_self, w_diff = weight[:H], weight[H:]
    c = jnp.einsum("bnh,hf->bnf", x, w_diff, preferred_element_type=jnp.float32)
    a = jnp.einsum("bnh,hf->bnf", x, w_self - w_diff,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        a = a + bias
    pos = jnp.where(g.mask[..., None], g.etaphi, PAD_POS)
    m = window_max(c, pos, float(g.r) ** 2, g.halo, tile, interpret)
    has = jnp.isfinite(m[..., :1])
    return jnp.where(has, a + jnp.where(has, m, 0.0), 0.0)
