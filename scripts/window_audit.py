"""Instruction-level audit of the window kernel's chunk loop (VERDICT r4
#4: "break 0.54 or prove the ceiling").

The bench VPU model assumes 15 elementwise ops per swept (query, window,
lane) element (fwd ~7 + bwd ~8, bench.py:VPU_OPS_PER_ELEM) at a 4-issue
f32 peak.  The headline shape sits at 0.54 of that model — either ~46%
of issue slots are lost (fixable), or the model under-counts the real
per-element cost (re-baseline).

Method: time FORWARD kernel variants that differ only in the chunk
body's op count, on the exact headline inputs (B8 N2048 H32, cell
order).  If measured time tracks the static op count linearly, the loop
is issue-bound and the residual intercept is the per-chunk overhead
(loop control, pointer math, accumulator) the 15-op model ignores.

Variants (ops per element in the chunk body, counting sub/mul/fma/cmp/
select/max as 1):
  full       7: de, dp, de*de, +dp*dp, cmp, select, max   (production)
  dotform    6: t=qe*we, +qp*wp, t-wh, cmp, select, max   (norm trick:
              per-row norms hoisted out of the pair sweep)
  nophi      5: de, de*de, cmp, select, max               (eta-only, WRONG
              adjacency — op-count probe)
  noadj      2: cw+de ... max                             (no adjacency at
              all, forces the sweep; lower bound of the value path)

Run on the real TPU: python scripts/window_audit.py
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
from bench import _slope_time, _make_graph_inputs, B, N, H, R  # noqa: E402

import deepmetv2_tpu.ops.pallas.edgeconv_window as W  # noqa: E402


def make_fwd_kernel(variant: str):
    """_fwd_kernel clone with an ablated chunk body (see module doc)."""

    def kernel(c_hbm, eta_hbm, phi_hbm, qe_ref, qp_ref, lo_ref, hi_ref,
               out_ref, cwin, ewin, pwin, sems, *, tile, w_win, r2,
               wchunk, subtile, isplit=1):
        b = pl.program_id(0)
        i = pl.program_id(1)
        s = i * tile
        copies = [
            pltpu.make_async_copy(src.at[b, pl.ds(s, w_win), :], dst,
                                  sems.at[j])
            for j, (src, dst) in enumerate(
                [(c_hbm, cwin), (eta_hbm, ewin), (phi_hbm, pwin)])
        ]
        for cp in copies:
            cp.start()
        qe = qe_ref[0]
        qp = qp_ref[0]
        for cp in copies:
            cp.wait()

        T, F = qe.shape
        n_sub = tile // subtile

        for sub in range(n_sub):
            rows = slice(sub * subtile, (sub + 1) * subtile)
            qe_s, qp_s = qe[rows], qp[rows]
            if variant == "dotform":
                qh_s = 0.5 * (qe_s * qe_s + qp_s * qp_s)    # [S, F]
            q_off = (sub * subtile) // wchunk
            g = (i * n_sub + sub) * W.N_INTERVALS

            def chunk(k, acc, qe_s=qe_s, qp_s=qp_s):
                sl = pl.ds(k * wchunk, wchunk)
                cw = cwin[sl, :]
                if variant == "full":
                    de = qe_s[:, None, :] - ewin[sl, :][None, :, :]
                    dp = qp_s[:, None, :] - pwin[sl, :][None, :, :]
                    d2 = de * de + dp * dp
                    m = jnp.max(jnp.where(d2 < r2, cw[None, :, :],
                                          W.NEG_INF), axis=1)
                elif variant == "dotform":
                    # hit ⟺ qe·we + qp·wp − wh > qh  (d2 < r2 rearranged);
                    # wh recomputed per chunk (3/S extra ops per element —
                    # arrays can't be ds-sliced, only refs)
                    ew = ewin[sl, :]
                    pw = pwin[sl, :]
                    wh = 0.5 * (ew * ew + pw * pw - r2)
                    t = (qe_s[:, None, :] * ew[None, :, :]
                         + qp_s[:, None, :] * pw[None, :, :])
                    t = t - wh[None, :, :]
                    m = jnp.max(jnp.where(t > qh_s[:, None, :],
                                          cw[None, :, :], W.NEG_INF), axis=1)
                elif variant == "nophi":
                    de = qe_s[:, None, :] - ewin[sl, :][None, :, :]
                    d2 = de * de
                    m = jnp.max(jnp.where(d2 < r2, cw[None, :, :],
                                          W.NEG_INF), axis=1)
                elif variant == "noadj":
                    de = qe_s[:, None, :] - ewin[sl, :][None, :, :]
                    m = jnp.max(cw[None, :, :] + de, axis=1)
                else:
                    raise ValueError(variant)
                return jnp.maximum(acc, m)

            acc = jnp.full((subtile, F), W.NEG_INF, cwin.dtype)
            for j in range(W.N_INTERVALS):
                acc = jax.lax.fori_loop(lo_ref[b, g + j] + q_off,
                                        hi_ref[b, g + j] + q_off, chunk, acc)
            out_ref[0, rows, :] = acc

    return kernel


OPS = {"full": 7, "dotform": 6, "nophi": 5, "noadj": 2}


def main():
    from deepmetv2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    batch, etaphi, halo, x, w, bias = _make_graph_inputs(B, N, H, seed=0)
    c = jnp.einsum("bnh,hf->bnf", x, w[H:],
                   preferred_element_type=jnp.float32)
    pos = jnp.where(batch.mask[..., None], etaphi, W.PAD_POS)
    r2 = float(R) ** 2

    out = {"config": {"B": B, "N": N, "H": H, "halo": int(halo)}}
    ref = None
    orig = W._fwd_kernel
    for variant, ops in OPS.items():
        # swap the kernel body under the production wrapper so tiling,
        # DMA, prune bounds, and packing are IDENTICAL across variants
        W._fwd_kernel = make_fwd_kernel(variant)
        try:
            fn = functools.partial(W._window_max_impl, r2=r2,
                                   halo=int(halo), tile=W.DEFAULT_TILE,
                                   interpret=False)
            m = jax.block_until_ready(fn(c, pos))
            if variant == "full":
                ref = m
            elif variant == "dotform":
                # same predicate algebraically; must agree except on
                # exact-r2 boundary pairs (measure-zero on real data)
                a_ = np.asarray(jnp.where(jnp.isfinite(ref), ref, 0.0))
                b_ = np.asarray(jnp.where(jnp.isfinite(m), m, 0.0))
                out["dotform_max_abs_diff"] = float(np.max(np.abs(a_ - b_)))

            def body(cc, _):
                mm = fn(cc, pos)
                return cc + 1e-12 * jnp.where(jnp.isfinite(mm), mm, 0.0), None

            t = _slope_time(body, c, ks=(16, 64), label=variant)
            out[variant] = {"ms": round(t * 1e3, 5), "ops_per_elem": ops}
            print(f"{variant}: {t * 1e3:.4f} ms ({ops} ops/elem)",
                  flush=True)
        finally:
            W._fwd_kernel = orig
    # fit t = a * ops + b across the adjacency-preserving variants
    xs = np.array([OPS[v] for v in ("full", "dotform", "nophi")])
    ys = np.array([out[v]["ms"] for v in ("full", "dotform", "nophi")])
    a, b = np.polyfit(xs, ys, 1)
    out["fit"] = {"ms_per_op": round(float(a), 5),
                  "intercept_ms": round(float(b), 5),
                  "r2_points": 3}
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
