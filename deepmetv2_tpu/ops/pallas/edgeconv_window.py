"""Pallas TPU kernel: implicit windowed EdgeConv aggregation.

The hot op of the flagship model (SURVEY.md §3.3): for spatially sorted
events, ``m_i = max_{w : ‖ηφ_i − ηφ_w‖² < r²} c_w`` over a contiguous
index window — the gather-free form of radius-graph EdgeConv-max (see
ops/window.py for the XLA formulation and the math).  Any row order works
given halo >= the order's in-radius span (data/sorting.required_span_*);
the fast layout is the CELL order (eta-quantile blocks x phi,
data/sorting.cell_sort_batch), where the per-tile eta+phi chunk prune
skips most of the window (measured 1.4x at N=2048 / 1.6x at N=8192 over a
plain eta sort on v5e, despite the wider halo).

Layout: **lane-packed events.**  With hidden size H dividing the 128-lane
vector width, ``pack = 128 // H`` events ride side-by-side in the lane
axis: ``c_packed[b', n, e*H + h] = c[b'*pack + e, n, h]``, and the (eta,
phi) coordinates are *broadcast per lane* (each event's scalar repeated
across its H lanes).  Consequences:

  * the adjacency predicate is a fully elementwise 3D compare — no
    lane-masked position reductions, no degenerate [.., 2] arrays;
  * every lane carries real data (the unpacked variant wastes (128−H)/128
    of the VPU);
  * events stay independent automatically: a lane only ever combines
    values in its own lane group.

Kernel structure (forward), grid = (B/pack, N/T): DMA the SUPERTILE's
halo window of c and both coordinate planes ([W, 128] each) into VMEM
once, then process the supertile's query rows in ``subtile``-row groups,
each sweeping only its own interval-pruned window chunks and
accumulating a running max into its slice of the [T, 128] output.

Two-level tiling rationale: consecutive query tiles' windows overlap by
w_win − tile rows, so small tiles re-DMA almost the whole window every
step (w_win/tile ≈ 50-100x redundant HBM traffic at N=8192) — but small
tiles are exactly what makes the eta+phi interval prune tight.  The
supertile (default 128 rows) amortizes one window DMA across 8
subtiles; the prune keeps its 16-row granularity (per-subtile chunk
runs, offset by the subtile's position inside the supertile window).

Padding contract (arranged by the wrapper): coordinates of padded nodes /
padded batch lanes carry +1e9, so they are never adjacent to anything and
the kernel needs no mask input.  Empty rows yield -inf, turned into the
PyG empty-neighborhood convention (0) by the wrapper.

Backward is the mirrored kernel: grad routes to every argmax tie
(c[s,h] == m[q,h] under adjacency), recomputing adjacency from positions —
no residual graph storage at all.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepmetv2_tpu.ops.window import WindowGraph

NEG_INF = float("-inf")  # python float: jnp consts can't be captured by kernels
PAD_POS = 1e9
LANE = 128
WCHUNK = 16  # default window sublane chunk swept per loop iteration
DEFAULT_TILE = 512    # supertile: query rows sharing one window DMA
DEFAULT_SUBTILE = 16  # prune granularity inside the supertile
DEFAULT_ISPLIT = 1    # independent sub-slab streams per chunk (ILP knob)
# (bench.py sweeps (tile, subtile, wchunk) across shapes and records the
# winners; the interval runs are per SUBTILE, so pruning stays as tight
# as the old tile=16 kernel while the DMA amortizes over the supertile.
# tile 512/sub 16 measured fastest across the v5e sweep — incl. 3x on
# the former 8192xH64 cliff row: 18.4 -> 6.15 ms)


N_INTERVALS = 4  # needed-chunk runs per tile (cell order: <= 3 phi windows
# in adjacent eta blocks, +1 for block-straddling tiles; the last interval
# conservatively merges any overflow runs).  Eta order degenerates to one
# run — intervals 1..3 are empty and their fori_loops exit immediately.


def _fwd_kernel(c_hbm, eta_hbm, phi_hbm, qe_ref, qp_ref, lo_ref, hi_ref,
                out_ref, cwin, ewin, pwin, sems, *, tile, w_win, r2,
                wchunk, subtile, isplit=1):
    b = pl.program_id(0)
    i = pl.program_id(1)
    s = i * tile  # window start in the halo-padded source arrays

    copies = [
        pltpu.make_async_copy(src.at[b, pl.ds(s, w_win), :], dst, sems.at[j])
        for j, (src, dst) in enumerate(
            [(c_hbm, cwin), (eta_hbm, ewin), (phi_hbm, pwin)])
    ]
    for cp in copies:
        cp.start()
    qe = qe_ref[0]                    # [T, 128] per-lane query eta
    qp = qp_ref[0]
    for cp in copies:
        cp.wait()

    T, F = qe.shape
    n_sub = tile // subtile

    # Per subtile: sweep its N_INTERVALS needed-chunk runs (eta+phi
    # interval prune, wrapper) — statically unrolled so each run is a
    # plain fori_loop with a register-carried accumulator; empty runs
    # exit immediately.  The runs are computed relative to the SUBTILE's
    # own window; q_off shifts them into the shared supertile window.
    for sub in range(n_sub):
        rows = slice(sub * subtile, (sub + 1) * subtile)
        qe_s, qp_s = qe[rows], qp[rows]
        q_off = (sub * subtile) // wchunk
        g = (i * n_sub + sub) * N_INTERVALS

        def chunk(k, acc, qe_s=qe_s, qp_s=qp_s):
            # isplit > 1: the chunk's sublane slab is processed as
            # independent sub-slabs with separate partial maxima,
            # breaking the dependent compare-select-reduce chain so the
            # VPU can overlap the streams (VERDICT r3 #3 experiment).
            w2 = wchunk // isplit
            parts = []
            for p_ in range(isplit):
                sl = pl.ds(k * wchunk + p_ * w2, w2)
                cw = cwin[sl, :]                                 # [Wc, F]
                de = qe_s[:, None, :] - ewin[sl, :][None, :, :]  # [S,Wc,F]
                dp = qp_s[:, None, :] - pwin[sl, :][None, :, :]
                d2 = de * de + dp * dp
                parts.append(
                    jnp.max(jnp.where(d2 < r2, cw[None, :, :], NEG_INF),
                            axis=1))
            m = parts[0]
            for q_ in parts[1:]:
                m = jnp.maximum(m, q_)
            return jnp.maximum(acc, m)

        acc = jnp.full((subtile, F), NEG_INF, cwin.dtype)
        for j in range(N_INTERVALS):
            acc = jax.lax.fori_loop(lo_ref[b, g + j] + q_off,
                                    hi_ref[b, g + j] + q_off, chunk, acc)
        out_ref[0, rows, :] = acc


def _bwd_kernel(eta_hbm, phi_hbm, m_hbm, g_hbm, ct_ref, qe_ref, qp_ref,
                lo_ref, hi_ref, dc_ref, mwin, gwin, ewin, pwin, sems, *,
                tile, w_win, r2, wchunk, subtile, isplit=1):
    """dc[s,h] = Σ_q [adj(q,s) ∧ c[s,h] == m[q,h]] · g[q,h].

    Source-tile centric: the queries whose windows include source s lie in
    the same symmetric window around s, so the structure mirrors forward
    with (m, g) windows DMA'd instead of c; ``qe/qp`` are THIS tile's
    (source) coordinates, ewin/pwin the window (query) coordinates.  The
    needed-run intervals are the forward's — the adjacency relation is
    symmetric, so the pruned set is identical.  Same supertile window /
    subtile prune split as the forward."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    s = i * tile

    copies = [
        pltpu.make_async_copy(src.at[b, pl.ds(s, w_win), :], dst, sems.at[j])
        for j, (src, dst) in enumerate(
            [(m_hbm, mwin), (g_hbm, gwin), (eta_hbm, ewin), (phi_hbm, pwin)])
    ]
    for cp in copies:
        cp.start()
    ct = ct_ref[0]                    # [T, F] this tile's c values
    qe = qe_ref[0]                    # [T, F] per-lane source coords
    qp = qp_ref[0]
    for cp in copies:
        cp.wait()

    n_sub = tile // subtile
    for sub in range(n_sub):
        rows = slice(sub * subtile, (sub + 1) * subtile)
        ct_s, qe_s, qp_s = ct[rows], qe[rows], qp[rows]
        q_off = (sub * subtile) // wchunk
        g = (i * n_sub + sub) * N_INTERVALS

        def chunk(k, acc, ct_s=ct_s, qe_s=qe_s, qp_s=qp_s):
            w2 = wchunk // isplit
            parts = []
            # the argmax-tie equality runs in f32: Mosaic v5e has no bf16
            # vector compare ("Target does not support this comparison"),
            # and bf16->f32 is injective so equality is preserved exactly
            ct_c = ct_s.astype(jnp.float32)
            for p_ in range(isplit):
                sl = pl.ds(k * wchunk + p_ * w2, w2)
                mw = mwin[sl, :].astype(jnp.float32)             # [Wc, F]
                gw = gwin[sl, :].astype(jnp.float32)             # [Wc, F]
                de = qe_s[:, None, :] - ewin[sl, :][None, :, :]  # [S,Wc,F]
                dp = qp_s[:, None, :] - pwin[sl, :][None, :, :]
                d2 = de * de + dp * dp
                hit = (d2 < r2) & (ct_c[:, None, :] == mw[None, :, :])
                parts.append(
                    jnp.sum(jnp.where(hit, gw[None, :, :], 0.0), axis=1))
            m = parts[0]
            for q_ in parts[1:]:
                m = m + q_
            return acc + m

        acc = jnp.zeros((subtile, ct.shape[1]), jnp.float32)
        for j in range(N_INTERVALS):
            acc = jax.lax.fori_loop(lo_ref[b, g + j] + q_off,
                                    hi_ref[b, g + j] + q_off, chunk, acc)
        dc_ref[0, rows, :] = acc.astype(dc_ref.dtype)


# ------------------------------------------------------------ packing


def _pack_factor(H: int, dtype=jnp.float32) -> int:
    """Events per lane group — 128 lanes regardless of dtype.

    The obvious bf16 move (256 elements per (8,128) vreg -> pack 256//H
    events) was MEASURED NET-NEGATIVE on v5e: the coordinate planes and
    the adjacency compare stay f32 (tie analysis) and dominate the op
    count, so doubling the lane width doubles their vreg footprint while
    the bf16 value ops see no 2x issue rate; with the relayouts the
    kernel ran 30-45% slower (2048x32: 0.51->0.67 ms, 8192x32:
    5.06->7.36).  Same-width bf16 packing is neutral (0.52 / 5.23 ms) —
    kept for the halved window DMA/VMEM at memory-bound shapes."""
    del dtype
    return LANE // H if H <= LANE and LANE % H == 0 else 1


def _pack_features(arr: jnp.ndarray, pack: int, fill: float = 0.0):
    """[B, N, H] → [ceil(B/pack), N, pack*H] lane packing."""
    B, N, H = arr.shape
    Bp = -(-B // pack)
    if Bp * pack != B:
        arr = jnp.pad(arr, ((0, Bp * pack - B), (0, 0), (0, 0)),
                      constant_values=fill)
    return (arr.reshape(Bp, pack, N, H).transpose(0, 2, 1, 3)
            .reshape(Bp, N, pack * H))


def _unpack_features(arr: jnp.ndarray, pack: int, B: int, H: int):
    Bp, N, F = arr.shape
    out = (arr.reshape(Bp, N, pack, H).transpose(0, 2, 1, 3)
           .reshape(Bp * pack, N, H))
    return out[:B]


def _pack_coords(coord: jnp.ndarray, pack: int, H: int):
    """[B, N] per-event coordinate → [ceil(B/pack), N, pack*H] with the
    value broadcast across each event's lane group (+1e9 batch padding)."""
    rep = jnp.broadcast_to(coord[..., None], coord.shape + (H,))
    return _pack_features(rep, pack, fill=PAD_POS)


def _lane_pad(arr, value=0.0, lanes=LANE):
    H = arr.shape[-1]
    F = -(-H // lanes) * lanes
    if F == H:
        return arr
    return jnp.pad(arr, ((0, 0), (0, 0), (0, F - H)), constant_values=value)


def _grid_params(N, halo, tile, wchunk):
    assert N % tile == 0, f"N={N} must be a multiple of tile={tile}"
    halo_pad = -(-halo // 64) * 64
    w_win = tile + 2 * halo_pad
    # The chunk loop sweeps whole wchunk slabs; round the window up and
    # right-pad the source arrays to match, so a partial trailing chunk can
    # never be silently dropped (PAD_POS rows are never adjacent to
    # anything, so the extra rows are inert).
    extra = -w_win % wchunk
    return halo_pad, w_win + extra, extra


def _axis_needed(coord, halo_pad, extra, tile, r, n_tiles, n_chunks, wchunk):
    """[B, n_tiles, C] bool: chunk c's range of ``coord`` overlaps tile t's
    range ± r.  Conservative for ANY row ordering — a chunk whose coordinate
    interval misses [tile_min − r, tile_max + r] cannot hold an in-radius
    pair for this tile along that axis."""
    B, N = coord.shape
    c = jnp.where(coord < PAD_POS / 2, coord, jnp.inf)
    ct = c.reshape(B, n_tiles, tile)
    qmin = jnp.min(ct, axis=-1)                               # inf if empty
    qmax = jnp.max(jnp.where(jnp.isfinite(ct), ct, -jnp.inf), axis=-1)

    cpad = jnp.pad(c, ((0, 0), (halo_pad, halo_pad + extra)),
                   constant_values=jnp.inf)
    G = (N + 2 * halo_pad + extra) // wchunk
    cg = cpad.reshape(B, G, wchunk)
    gmin = jnp.min(cg, axis=-1)
    gmax = jnp.max(jnp.where(jnp.isfinite(cg), cg, -jnp.inf), axis=-1)
    base = (jnp.arange(n_tiles) * tile) // wchunk             # [n_tiles]
    idx = base[:, None] + jnp.arange(n_chunks)[None, :]       # [n_tiles, C]
    cmin = gmin[:, idx]                                       # [B, n_tiles, C]
    cmax = gmax[:, idx]
    return ((cmin <= qmax[..., None] + r) &
            (cmax >= qmin[..., None] - r))                    # [B, n_tiles, C]


def _intervals(needed, m):
    """[Bp, n_tiles, C] bool → (lo, hi) int32 [Bp, n_tiles * m]: the first
    m-1 contiguous runs of needed chunks exactly, with runs >= m merged
    into the last interval (conservative — the kernel re-checks adjacency
    elementwise, so over-coverage only costs time).  Flattened to 2D: SMEM
    lane-pads the last axis of >=3D arrays catastrophically."""
    Bp, nT, C = needed.shape
    prev = jnp.pad(needed[..., :-1], ((0, 0), (0, 0), (1, 0)))
    rid = jnp.cumsum((needed & ~prev).astype(jnp.int32), axis=-1)
    k = jnp.arange(C)
    los, his = [], []
    for j in range(m):
        in_j = needed & ((rid == j + 1) if j < m - 1 else (rid >= m))
        hi_j = jnp.max(jnp.where(in_j, k + 1, 0), axis=-1)
        lo_j = jnp.min(jnp.where(in_j, k, C), axis=-1)
        los.append(jnp.minimum(lo_j, hi_j))
        his.append(hi_j)
    lo = jnp.stack(los, axis=-1).astype(jnp.int32).reshape(Bp, nT * m)
    hi = jnp.stack(his, axis=-1).astype(jnp.int32).reshape(Bp, nT * m)
    return lo, hi


def _chunk_bounds(eta, phi, halo_pad, extra, tile, r, pack, n_chunks,
                  wchunk):
    """Per-(packed-batch, tile) prune structure for the window kernels:
    N_INTERVALS chunk runs [lo, hi) that can contain neighbors, from chunk
    eta AND phi interval overlap (the phi test is what makes a cell-sorted
    layout fast; on a plain eta sort it collapses to one eta run).  The
    radius relation is symmetric, so the same runs serve the forward
    (query-centric) and backward (source-centric) kernels.

    ``eta``/``phi``: [B, N] with PAD_POS on padded rows.  Shapes must align
    to the wchunk grid (checked by the caller).
    Returns int32 (lo, hi), each [Bp, n_tiles * N_INTERVALS].
    """
    B, N = eta.shape
    n_tiles = N // tile
    args = (halo_pad, extra, tile, r, n_tiles, n_chunks, wchunk)
    needed = (_axis_needed(eta, *args) & _axis_needed(phi, *args))

    Bp = -(-B // pack)
    if Bp * pack != B:
        needed = jnp.pad(needed, ((0, Bp * pack - B), (0, 0), (0, 0)))
    needed = needed.reshape(Bp, pack, n_tiles, n_chunks).any(axis=1)
    return _intervals(needed, N_INTERVALS)


def _prepare(c, pos, halo_pad, extra, pack, m_fill=0.0):
    """Pack + halo-pad all kernel operands (``extra`` right-pad rows keep
    the last tile's window a whole number of WCHUNK slabs)."""
    B, N, H = c.shape
    cpk = _lane_pad(_pack_features(c, pack, fill=m_fill), value=m_fill)
    eta = _lane_pad(_pack_coords(pos[..., 0], pack, H), value=PAD_POS)
    phi = _lane_pad(_pack_coords(pos[..., 1], pack, H), value=PAD_POS)

    def halo(arr, fill):
        return jnp.pad(arr, ((0, 0), (halo_pad, halo_pad + extra), (0, 0)),
                       constant_values=fill)

    return halo(cpk, m_fill), halo(eta, PAD_POS), halo(phi, PAD_POS), eta, phi


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def window_max(c, pos, r2: float, halo: int, tile: int = DEFAULT_TILE,
               interpret: bool = False, wchunk: int = WCHUNK,
               subtile: int = DEFAULT_SUBTILE, isplit: int = 1):
    """``m[b,i,:] = max over w with ‖pos_i − pos_w‖² < r2 of c[b,w,:]``
    (window-limited to ±halo in the sorted order); -inf where no neighbor.

    ``pos`` is ``[B, N, 2]`` with +1e9 rows for padded nodes (see wrapper).
    ``tile`` is the supertile (rows sharing one window DMA), ``subtile``
    the interval-prune granularity within it.
    """
    return _window_max_impl(c, pos, r2, halo, tile, interpret, wchunk,
                            subtile, isplit)


def _bounds_or_static(pos, halo_pad, extra, w_win, subtile, r2, pack, Bp,
                      n_sub_tiles, wchunk, dynamic):
    """Dynamic eta+phi-pruned chunk runs at SUBTILE granularity when
    shapes align to the wchunk grid; otherwise the static full sweep
    (tiny-shape test configs, where subtile == tile): run 0 covers the
    whole window, the rest are empty.  ``w_win`` is always a wchunk
    multiple (see _grid_params)."""
    assert w_win % wchunk == 0
    if dynamic:
        n_chunks = (subtile + 2 * halo_pad + extra) // wchunk
        return _chunk_bounds(pos[..., 0], pos[..., 1], halo_pad, extra,
                             subtile, r2 ** 0.5, pack, n_chunks, wchunk)
    lo = jnp.zeros((Bp, n_sub_tiles, N_INTERVALS), jnp.int32)
    hi = lo.at[..., 0].set(w_win // wchunk)
    return (lo.reshape(Bp, n_sub_tiles * N_INTERVALS),
            hi.reshape(Bp, n_sub_tiles * N_INTERVALS))


def _pick_tiles(tile: int, subtile: int, wchunk: int, N: int,
                halo_pad: int):
    """(tile, subtile, dynamic): N must divide into whole supertiles
    (fall back to one tile for odd node counts); the subtile prune needs
    every granularity aligned to the wchunk grid, else the kernel runs
    one static full-window sweep per supertile (subtile == tile)."""
    tile = min(tile, N)
    if N % tile != 0:
        tile = N
    subtile = min(subtile, tile)
    if (tile % subtile == 0 and subtile % wchunk == 0
            and tile % wchunk == 0 and halo_pad % wchunk == 0):
        return tile, subtile, True
    return tile, tile, False


def _window_max_impl(c, pos, r2, halo, tile, interpret, wchunk=WCHUNK,
                     subtile: int = DEFAULT_SUBTILE, isplit: int = 1):
    B, N, H = c.shape
    halo_pad = -(-halo // 64) * 64
    tile, subtile, dynamic = _pick_tiles(tile, subtile, wchunk, N, halo_pad)
    halo_pad, w_win, extra = _grid_params(N, halo, tile, wchunk)
    pack = _pack_factor(H, c.dtype)
    cpad, eta_pad, phi_pad, qe, qp = _prepare(c, pos, halo_pad, extra, pack)
    Bp, _, F = qe.shape
    lo, hi = _bounds_or_static(pos, halo_pad, extra, w_win, subtile, r2,
                               pack, Bp, N // subtile, wchunk, dynamic)

    if wchunk % isplit != 0:
        isplit = 1
    kernel = functools.partial(_fwd_kernel, tile=tile, w_win=w_win, r2=r2,
                               wchunk=wchunk, subtile=subtile, isplit=isplit)
    m = pl.pallas_call(
        kernel,
        grid=(Bp, N // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # c_pad (HBM)
            pl.BlockSpec(memory_space=pl.ANY),            # eta_pad (HBM)
            pl.BlockSpec(memory_space=pl.ANY),            # phi_pad (HBM)
            pl.BlockSpec((1, tile, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),           # query eta
            pl.BlockSpec((1, tile, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),           # query phi
            pl.BlockSpec(memory_space=pltpu.SMEM),        # lo [Bp, nT*M]
            pl.BlockSpec(memory_space=pltpu.SMEM),        # hi [Bp, nT*M]
        ],
        out_specs=pl.BlockSpec((1, tile, F), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, N, F), c.dtype),
        scratch_shapes=[
            pltpu.VMEM((w_win, F), c.dtype),
            pltpu.VMEM((w_win, F), jnp.float32),
            pltpu.VMEM((w_win, F), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(cpad, eta_pad, phi_pad, qe, qp, lo, hi)
    return _unpack_features(m, pack, B, H)


def _window_max_fwd(c, pos, r2, halo, tile, interpret, wchunk, subtile,
                    isplit):
    m = _window_max_impl(c, pos, r2, halo, tile, interpret, wchunk, subtile,
                        isplit)
    return m, (c, pos, m)


def _window_max_bwd(r2, halo, tile, interpret, wchunk, subtile, isplit,
                    res, g):
    c, pos, m = res
    B, N, H = c.shape
    halo_pad = -(-halo // 64) * 64
    tile_, subtile, dynamic = _pick_tiles(tile, subtile, wchunk, N, halo_pad)
    halo_pad, w_win, extra = _grid_params(N, halo, tile_, wchunk)
    pack = _pack_factor(H, c.dtype)
    # m of padded/empty rows is -inf; grads there are irrelevant but must
    # not poison the equality check -> replace by +inf (never equals a real
    # c) and zero the incoming grad.  All pads use the same sentinels.
    inf = float("inf")
    finite = jnp.isfinite(m)
    m_safe = jnp.where(finite, m, inf)
    g_safe = jnp.where(finite, g, 0.0)

    mpad, eta_pad, phi_pad, qe, qp = _prepare(m_safe, pos, halo_pad, extra,
                                              pack, m_fill=inf)
    gpk = _lane_pad(_pack_features(g_safe, pack))
    gpad = jnp.pad(gpk, ((0, 0), (halo_pad, halo_pad + extra), (0, 0)))
    cl = _lane_pad(_pack_features(c, pack))
    Bp, _, F = qe.shape
    lo, hi = _bounds_or_static(pos, halo_pad, extra, w_win, subtile, r2,
                               pack, Bp, N // subtile, wchunk, dynamic)

    if wchunk % isplit != 0:
        isplit = 1
    kernel = functools.partial(_bwd_kernel, tile=tile_, w_win=w_win, r2=r2,
                               wchunk=wchunk, subtile=subtile, isplit=isplit)
    dc = pl.pallas_call(
        kernel,
        grid=(Bp, N // tile_),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # eta_pad (HBM)
            pl.BlockSpec(memory_space=pl.ANY),            # phi_pad (HBM)
            pl.BlockSpec(memory_space=pl.ANY),            # m_pad (HBM)
            pl.BlockSpec(memory_space=pl.ANY),            # g_pad (HBM)
            pl.BlockSpec((1, tile_, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),           # c tile
            pl.BlockSpec((1, tile_, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),           # tile eta
            pl.BlockSpec((1, tile_, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),           # tile phi
            pl.BlockSpec(memory_space=pltpu.SMEM),        # lo [Bp, nT*M]
            pl.BlockSpec(memory_space=pltpu.SMEM),        # hi [Bp, nT*M]
        ],
        out_specs=pl.BlockSpec((1, tile_, F), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, N, F), c.dtype),
        scratch_shapes=[
            pltpu.VMEM((w_win, F), c.dtype),                 # m window
            pltpu.VMEM((w_win, F), c.dtype),                 # g window
            pltpu.VMEM((w_win, F), jnp.float32),             # eta window
            pltpu.VMEM((w_win, F), jnp.float32),             # phi window
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(eta_pad, phi_pad, mpad, gpad, cl, qe, qp, lo, hi)
    return _unpack_features(dc, pack, B, H), jnp.zeros_like(pos)


window_max.defvjp(_window_max_fwd, _window_max_bwd)


def window_edgeconv_linear_pallas(
    x: jnp.ndarray,            # [B, N, H]
    g: WindowGraph,
    weight: jnp.ndarray,       # [2H, Hout] rows [self; diff]
    bias: Optional[jnp.ndarray],
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    wchunk: int = WCHUNK,
    subtile: int = DEFAULT_SUBTILE,
    isplit: int = DEFAULT_ISPLIT,
    dtype=None,
) -> jnp.ndarray:
    """Drop-in equivalent of ops/window.window_edgeconv_linear('max') with
    the aggregation running as a Pallas kernel.  The GEMMs stay in XLA
    (MXU-friendly as-is); only the irregular part is hand-scheduled.

    ``dtype=jnp.bfloat16`` (opt-in, ModelConfig.compute_dtype): the GEMMs
    run MXU-bf16 with f32 accumulation and the aggregation kernel carries
    bf16 VALUES (halved window DMA, 256//H events per vreg) while the
    coordinate planes and adjacency compare stay f32.  Aggregation max
    over bf16 is exact selection (returns an input bitwise), so the only
    precision loss is the single rounding of c into bf16; the backward's
    tie detection (c == m) is likewise exact.  Output returns as f32."""
    H = x.shape[-1]
    w_self, w_diff = weight[:H], weight[H:]
    if dtype is not None and dtype != jnp.float32:
        xe, wd, ws = x.astype(dtype), w_diff.astype(dtype),             (w_self - w_diff).astype(dtype)
        c = jnp.einsum("bnh,hf->bnf", xe, wd,
                       preferred_element_type=jnp.float32)
        a = jnp.einsum("bnh,hf->bnf", xe, ws,
                       preferred_element_type=jnp.float32)
    else:
        c = jnp.einsum("bnh,hf->bnf", x, w_diff,
                       preferred_element_type=jnp.float32)
        a = jnp.einsum("bnh,hf->bnf", x, w_self - w_diff,
                       preferred_element_type=jnp.float32)
    if bias is not None:
        a = a + bias
    if dtype is not None and dtype != jnp.float32:
        c = c.astype(dtype)
    pos = jnp.where(g.mask[..., None], g.etaphi, PAD_POS)
    m = window_max(c, pos, float(g.r) ** 2, g.halo, tile, interpret, wchunk,
                   subtile, isplit)
    m = m.astype(jnp.float32)
    # Padded nodes all sit at the same PAD_POS sentinel, so they are
    # adjacent to each OTHER (distance 0): their m is a real number, not
    # -inf.  Mask them explicitly — the op's contract (like ops/window.py)
    # is 0 output and 0 gradient at padded nodes.
    has = jnp.isfinite(m[..., :1]) & g.mask[..., None]
    return jnp.where(has, a + jnp.where(has, m, 0.0), 0.0)
