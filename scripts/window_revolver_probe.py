"""Probe: two-slot revolver DMA overlap for the window kernel's
halo-window copies (the ~0.05 ms/pass fixed term the r5 op-ablation
audit identified).

The production forward kernel issues-and-waits its three [w_win, F]
window-plane copies at the top of every grid step.  This probe clones
the kernel with double-buffered window scratch: step (b, i) waits on the
copies issued by step-1 into its slot (step parity) and issues step+1's
copies into the other slot before computing — hiding the DMA behind the
chunk sweeps.  The compute body is instantiated twice under static
``pl.when`` parity branches so the hot loop never indexes scratch
dynamically.

Measures fwd-only production vs revolver on the headline shape and the
overhead-dominated 512x32 shape; correctness asserted against the
production kernel's output exactly.
"""

from __future__ import annotations

import functools
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bench import _slope_time, _make_graph_inputs, R  # noqa: E402

import deepmetv2_tpu.ops.pallas.edgeconv_window as W  # noqa: E402


def _revolver_fwd_kernel(c_hbm, eta_hbm, phi_hbm, qe_ref, qp_ref, lo_ref,
                         hi_ref, out_ref, cwin, ewin, pwin, sems, *, tile,
                         w_win, r2, wchunk, subtile, isplit=1):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    ni = pl.num_programs(1)
    step = b * ni + i
    last = step == nb * ni - 1
    # next step's (b, i) in row-major grid order
    nxt_b = jnp.where(i + 1 < ni, b, b + 1)
    nxt_i = jnp.where(i + 1 < ni, i + 1, 0)

    planes = [(c_hbm, cwin), (eta_hbm, ewin), (phi_hbm, pwin)]

    def issue(slot, src_b, src_i):
        s = src_i * tile
        for j, (src, dst) in enumerate(planes):
            pltpu.make_async_copy(src.at[src_b, pl.ds(s, w_win), :],
                                  dst.at[slot], sems.at[slot, j]).start()

    def wait(slot, src_b, src_i):
        s = src_i * tile
        for j, (src, dst) in enumerate(planes):
            pltpu.make_async_copy(src.at[src_b, pl.ds(s, w_win), :],
                                  dst.at[slot], sems.at[slot, j]).wait()

    def compute(slot):
        qe = qe_ref[0]
        qp = qp_ref[0]
        T, F = qe.shape
        n_sub = tile // subtile
        cw_s, ew_s, pw_s = cwin.at[slot], ewin.at[slot], pwin.at[slot]
        for sub in range(n_sub):
            rows = slice(sub * subtile, (sub + 1) * subtile)
            qe_s, qp_s = qe[rows], qp[rows]
            q_off = (sub * subtile) // wchunk
            g = (i * n_sub + sub) * W.N_INTERVALS

            def chunk(k, acc, qe_s=qe_s, qp_s=qp_s):
                sl = pl.ds(k * wchunk, wchunk)
                cw = cw_s[sl, :]
                de = qe_s[:, None, :] - ew_s[sl, :][None, :, :]
                dp = qp_s[:, None, :] - pw_s[sl, :][None, :, :]
                d2 = de * de + dp * dp
                m = jnp.max(jnp.where(d2 < r2, cw[None, :, :], W.NEG_INF),
                            axis=1)
                return jnp.maximum(acc, m)

            acc = jnp.full((subtile, F), W.NEG_INF, cwin.dtype)
            for j in range(W.N_INTERVALS):
                acc = jax.lax.fori_loop(lo_ref[b, g + j] + q_off,
                                        hi_ref[b, g + j] + q_off, chunk,
                                        acc)
            out_ref[0, rows, :] = acc

    @pl.when(step == 0)
    def _():
        issue(0, b, i)

    for par in (0, 1):
        @pl.when((step % 2 == par) & jnp.logical_not(last))
        def _(par=par):
            issue(1 - par, nxt_b, nxt_i)

    for par in (0, 1):
        @pl.when(step % 2 == par)
        def _(par=par):
            wait(par, b, i)
            compute(par)


def _revolver_impl(c, pos, r2, halo, tile, wchunk, subtile):
    """Clone of _window_max_impl with the revolver kernel + doubled
    scratch."""
    B, N, H = c.shape
    halo_pad = -(-halo // 64) * 64
    tile, subtile, dynamic = W._pick_tiles(tile, subtile, wchunk, N,
                                           halo_pad)
    halo_pad, w_win, extra = W._grid_params(N, halo, tile, wchunk)
    pack = W._pack_factor(H, c.dtype)
    cpad, eta_pad, phi_pad, qe, qp = W._prepare(c, pos, halo_pad, extra,
                                                pack)
    Bp, _, F = qe.shape
    lo, hi = W._bounds_or_static(pos, halo_pad, extra, w_win, subtile, r2,
                                 pack, Bp, N // subtile, wchunk, dynamic)
    kernel = functools.partial(_revolver_fwd_kernel, tile=tile,
                               w_win=w_win, r2=r2, wchunk=wchunk,
                               subtile=subtile)
    m = pl.pallas_call(
        kernel,
        grid=(Bp, N // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tile, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, F), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, N, F), c.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, w_win, F), c.dtype),
            pltpu.VMEM((2, w_win, F), jnp.float32),
            pltpu.VMEM((2, w_win, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(cpad, eta_pad, phi_pad, qe, qp, lo, hi)
    return W._unpack_features(m, pack, B, H)


def main():
    from deepmetv2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    out = {}
    for (B_, N_, H_) in ((8, 2048, 32), (8, 512, 32)):
        batch, etaphi, halo, x, w, bias = _make_graph_inputs(
            B_, N_, H_, seed=N_ + H_)
        c = jnp.einsum("bnh,hf->bnf", x, w[H_:],
                       preferred_element_type=jnp.float32)
        pos = jnp.where(batch.mask[..., None], etaphi, W.PAD_POS)
        r2 = float(R) ** 2

        base = jax.block_until_ready(
            W._window_max_impl(c, pos, r2, int(halo), W.DEFAULT_TILE,
                               False))
        rev = jax.block_until_ready(
            _revolver_impl(c, pos, r2, int(halo), W.DEFAULT_TILE,
                           W.WCHUNK, W.DEFAULT_SUBTILE))
        a_ = np.asarray(jnp.where(jnp.isfinite(base), base, 0.0))
        b_ = np.asarray(jnp.where(jnp.isfinite(rev), rev, 0.0))
        exact = bool(np.array_equal(a_, b_))
        print(f"{N_}x{H_}: exact={exact}", flush=True)
        assert exact, "revolver output differs"

        def body_of(fn):
            def body(cc, _):
                mm = fn(cc, pos)
                return cc + 1e-12 * jnp.where(jnp.isfinite(mm), mm, 0.0), None
            return body

        t_base = _slope_time(
            body_of(lambda cc, p: W._window_max_impl(
                cc, p, r2, int(halo), W.DEFAULT_TILE, False)),
            c, ks=(16, 64), label=f"base {N_}x{H_}")
        t_rev = _slope_time(
            body_of(lambda cc, p: _revolver_impl(
                cc, p, r2, int(halo), W.DEFAULT_TILE, W.WCHUNK,
                W.DEFAULT_SUBTILE)),
            c, ks=(16, 64), label=f"rev {N_}x{H_}")
        out[f"{N_}x{H_}"] = {"base_ms": round(t_base * 1e3, 5),
                             "revolver_ms": round(t_rev * 1e3, 5),
                             "speedup": round(t_base / t_rev, 4),
                             "exact": exact}
        print(out[f"{N_}x{H_}"], flush=True)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
