"""DynamicReductionNetwork — the graph-coarsening model family.

TPU-native rebuild of reference model/dynamic_reduction_network.py:27-103:
iteratively contracts feature-space kNN graphs until a per-event vector
remains.

Per reduction round (×2):
  1. kNN graph (k=16) rebuilt in *feature space*, symmetrized
     (knn_graph + to_undirected — ops/graph.py);
  2. EdgeConv whose edge-MLP is Linear(2H→3H/2)+ELU+Linear(3H/2→H)+ELU+
     BatchNorm (BatchNorm runs over valid *edge messages*, matching the
     reference's BatchNorm1d at the end of convnn), aggregation ctor-param;
  3. normalized-cut edge weights → handshake matching (graclus
     replacement, ops/coarsen.py) → cluster-max pooling.
Then global max pool and the output MLP.

Divergence from reference (documented): graclus's sequential greedy
matching is replaced by deterministic parallel handshake matching — same
objective (heavy-edge matching on normalized-cut weights), different tie
resolution, so clusterings are equivalent in quality but not bit-identical.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from deepmetv2_tpu.config import DRNConfig
from deepmetv2_tpu.data.batching import EventBatch, Neighborhood
from deepmetv2_tpu.nn.core import (
    BatchNormState,
    batchnorm_init,
    elu,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)
from deepmetv2_tpu.ops.coarsen import (
    global_max_pool,
    handshake_matching,
    max_pool,
    normalized_cut_weights,
)
from deepmetv2_tpu.ops.graph import to_undirected
from deepmetv2_tpu.ops.segment import gather_neighbors

Params = Dict[str, Any]
State = Dict[str, Any]

# Default datanorm constants from the commented DRN Net (reference
# model/net.py:20-31), REORDERED to match the actual feature order of the
# data pipeline [px,py,pt,eta,d0,dz,mass,puppiWeight,pdgId,charge,fromPV]
# (reference model/data_loader.py:72).  The reference's own list is in a
# different order than its data (it would scale puppiWeight by 1/211 and
# fromPV by 1 — one more inconsistency in that dormant code path); here
# each constant is matched to its named feature.
DEFAULT_NORM = (
    1.0 / 2950.0, 1.0 / 2950.0, 1.0 / 2950.0, 1.0 / 5.265625,
    1.0 / 143.875, 1.0 / 589.0, 1.0 / 1.2050781,
    1.0,           # puppiWeight
    1.0 / 211.0,   # pdgId
    1.0,           # charge
    1.0 / 7.0,     # fromPV
)


def drn_init(key: jax.Array, cfg: DRNConfig = DRNConfig(),
             norm=None, dtype=jnp.float32,
             met_bias: float = 0.0) -> Tuple[Params, State]:
    """``met_bias`` > 0 initializes the output layer's MET logit bias to
    softplus⁻¹(met_bias) — set it to the training set's mean |genMET| so
    the softplus head starts on the right scale.  Raw MET magnitudes are
    O(10²) GeV while AdamW moves parameters ~lr per step, so a zero-init
    head needs tens of thousands of steps just to climb into range (the
    reference's commented head has the same conditioning problem,
    model/net.py:33)."""
    H = cfg.hidden_dim
    keys = jax.random.split(key, 2 + cfg.pool_rounds)
    if norm is None:
        norm = DEFAULT_NORM[: cfg.input_dim]
    params: Params = {
        "datanorm": jnp.asarray(norm, dtype),
        "inputnet": mlp_init(keys[0], (cfg.input_dim, H // 2, H, H), dtype),
        "output": mlp_init(keys[1], (H, H, H // 2, cfg.output_dim), dtype),
        "convs": [],
    }
    if met_bias > 0 and cfg.head == "polar":
        # softplus⁻¹(m) = m + log1p(−exp(−m)) in OUTPUT units (the head
        # multiplies by cfg.output_scale).  Only the polar head needs
        # this: a cartesian head regresses a ~zero-mean (METx, METy) vector.
        m = met_bias / cfg.output_scale
        inv = m + float(jnp.log1p(-jnp.exp(-jnp.asarray(m))))
        last = sorted(params["output"].keys())[-1]
        b = params["output"][last]["b"]
        params["output"][last]["b"] = b.at[0].set(inv)
    state: State = {"convs": []}
    for r in range(cfg.pool_rounds):
        conv = {"mlp": mlp_init(keys[2 + r], (2 * H, 3 * H // 2, H), dtype)}
        bn_p, bn_s = batchnorm_init(H, dtype)
        conv["bn"] = bn_p
        params["convs"].append(conv)
        state["convs"].append(bn_s)
    return params, state


def _edge_batchnorm(params, st: BatchNormState, msgs: jnp.ndarray,
                    edge_mask: jnp.ndarray, train: bool,
                    momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over valid edge messages ([B,N,K,H] + [B,N,K] mask) —
    the reference applies BatchNorm1d to the [E,H] message matrix."""
    if train:
        m = edge_mask[..., None]
        n = jnp.maximum(jnp.sum(m), 1).astype(msgs.dtype)
        mean = jnp.sum(jnp.where(m, msgs, 0), axis=(0, 1, 2)) / n
        diff = jnp.where(m, msgs - mean, 0)
        var = jnp.sum(diff * diff, axis=(0, 1, 2)) / n
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_st = BatchNormState(
            mean=(1 - momentum) * st.mean + momentum * mean,
            var=(1 - momentum) * st.var + momentum * unbiased,
            count=st.count + 1,
        )
    else:
        mean, var = st.mean, st.var
        new_st = st
    inv = jax.lax.rsqrt(var + eps)
    return (msgs - mean) * inv * params["gamma"] + params["beta"], new_st


def _fused_conv_available(mlp, x, nbr: Neighborhood,
                          force, interpret: bool) -> bool:
    """Fused Pallas edge-MLP conv (ops/pallas/edge_mlp.py) eligibility:
    the 2-layer DRN MLP shape, supported tiling, a TPU backend (or
    interpret mode), and not inside a GSPMD-sharded trace (pallas_call
    has no SPMD partitioning rule — the XLA formulation shards for
    free)."""
    if force == "xla":
        return False
    if len(mlp) != 2:
        return False
    from deepmetv2_tpu.ops.pallas.edge_mlp import supported
    from deepmetv2_tpu.parallel import context as pctx

    B, N, H = x.shape
    K = nbr.idx.shape[-1]
    F1 = mlp["lin0"]["w"].shape[-1]
    H2 = mlp["lin1"]["w"].shape[-1]
    if not supported(N, K, H, F1, H2):
        return False
    if force == "fused":
        return True
    if pctx.xla_window_forced():
        return False
    if interpret:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _drn_edgeconv(conv_params, bn_state, x, nbr: Neighborhood, aggr: str,
                  train: bool, gather_fn=gather_neighbors,
                  conv_force=None, conv_interpret: bool = False):
    """EdgeConv with the DRN's nonlinear edge-MLP + edge BatchNorm.
    ``gather_fn(x, nbr)`` fetches neighbor features — the node-sharded path
    (parallel/dyn.py) swaps in an all-gather-backed gather.

    The first edge-MLP layer is *factored*: with W = [W_self; W_diff]
    split over the concat [x_i ‖ x_j − x_i],

        layer1(e) = x_i (W_self − W_diff) + x_j W_diff + b = a_i + c_j

    so the per-edge [E, 2H] GEMM becomes two node-level GEMMs (MXU,
    O(N·2H·F) instead of O(E·2H·F)) and the gather fetches the
    precomputed per-source term c instead of raw features — the [B,N,K,2H]
    edge-feature concat is never materialized.  Exact same math as the
    concat form up to float summation order (the identical factorization
    tier-1 EdgeConv uses, ops/edgeconv.py)."""
    mlp = conv_params["mlp"]
    if _fused_conv_available(mlp, x, nbr, conv_force, conv_interpret):
        from deepmetv2_tpu.ops.pallas.edge_mlp import edge_mlp_conv

        bn_p = conv_params["bn"]
        xj = gather_fn(x, nbr)                        # [B, N, K, H]
        out, mean, var = edge_mlp_conv(
            x, xj, nbr.mask, mlp, bn_p["gamma"], bn_p["beta"],
            bn_state.mean, bn_state.var, train, aggr,
            interpret=conv_interpret)
        if train:
            momentum = 0.1
            n = jnp.maximum(jnp.sum(nbr.mask), 1).astype(var.dtype)
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
            new_bn = BatchNormState(
                mean=(1 - momentum) * bn_state.mean + momentum * mean,
                var=(1 - momentum) * bn_state.var + momentum * unbiased,
                count=bn_state.count + 1,
            )
        else:
            new_bn = bn_state
        return out, new_bn
    H = x.shape[-1]
    w0, b0 = mlp["lin0"]["w"], mlp["lin0"]["b"]
    w_self, w_diff = w0[:H], w0[H:]
    a = jnp.einsum("bnh,hf->bnf", x, w_self - w_diff,
                   preferred_element_type=jnp.float32) + b0
    c = jnp.einsum("bnh,hf->bnf", x, w_diff,
                   preferred_element_type=jnp.float32)
    cj = gather_fn(c, nbr)                                # [B, N, K, F]
    h = elu(a[:, :, None, :] + cj)
    for i in range(1, len(mlp)):                          # ELU after each
        h = elu(linear_apply(mlp[f"lin{i}"], h))
    h, new_bn = _edge_batchnorm(conv_params["bn"], bn_state, h, nbr.mask,
                                train)
    m = nbr.mask[..., None]
    if aggr == "max":
        out = jnp.max(jnp.where(m, h, -jnp.inf), axis=2)
        out = jnp.where(jnp.any(m, axis=2), out, 0.0)
    elif aggr == "add":
        out = jnp.sum(jnp.where(m, h, 0.0), axis=2)
    elif aggr == "mean":
        s = jnp.sum(jnp.where(m, h, 0.0), axis=2)
        out = s / jnp.maximum(jnp.sum(m, axis=2), 1)
    else:
        raise ValueError(f"unknown aggr {aggr!r}")
    return out, new_bn


def _compact_size(n: int) -> int:
    """Static post-pool capacity: 3N/4 rounded up to a 128 multiple (the
    fused graph kernels' tiling unit), floored at 128."""
    return max(128, -(-(3 * n) // (4 * 128)) * 128)


def _compact_nodes(h: jnp.ndarray, mask: jnp.ndarray):
    """Gather pooled representatives into the front ``_compact_size(N)``
    slots (ascending index, order-preserving — index tie-breaks in the
    next round's graph build and matching are unchanged).  The next
    round's O(N²) graph build and O(N·K) conv then run on the compacted
    capacity: measured ~9 ms off the B8/N2048/H64 DRN train step on v5e.

    Overflow (more representatives than slots — requires the handshake
    matching to pair under half the active nodes, not observed with 4
    rounds) deterministically drops the highest-index representatives.
    ``compact_dropped`` computes the would-be-dropped count for a pooled
    mask; drn_apply surfaces it through its ``diag`` out-param and bench's
    DRN numerics gate asserts it is zero on the bench shapes.
    The reference keeps torch's dynamic shapes instead
    (model/dynamic_reduction_network.py:92-99); static capacities are the
    TPU-native equivalent."""
    from deepmetv2_tpu.ops.segment import _batched_take

    B, N = mask.shape
    ncomp = _compact_size(N)
    if ncomp >= N:
        return h, mask
    key = jnp.where(mask, jnp.arange(N, dtype=jnp.int32)[None, :], N)
    order = jnp.argsort(key, axis=1)[:, :ncomp]
    return (_batched_take(h, order),
            jnp.take_along_axis(mask, order, axis=1))


def compact_dropped(mask: jnp.ndarray) -> jnp.ndarray:
    """Valid representatives ``_compact_nodes`` would drop from this pooled
    mask (overflow diagnostic): worst event's ``survivors - capacity``,
    floored at 0.  Zero in normal operation (capacity is 3N/4; handshake
    matching pairs well over half the active nodes)."""
    N = mask.shape[1]
    ncomp = _compact_size(N)
    if ncomp >= N:
        return jnp.zeros((), jnp.int32)
    return jnp.maximum(
        jnp.max(jnp.sum(mask.astype(jnp.int32), axis=1)) - ncomp, 0)


def drn_apply(
    params: Params,
    state: State,
    x: jnp.ndarray,        # [B, N, input_dim] all 11 features
    mask: jnp.ndarray,     # [B, N]
    train: bool = False,
    cfg: DRNConfig = DRNConfig(),
    knn_fn=None,
    gather_fn=gather_neighbors,
    graph_force=None,
    graph_interpret: bool = False,
    conv_force=None,
    conv_interpret: bool = False,
    diag: Optional[dict] = None,
) -> Tuple[jnp.ndarray, State]:
    """Forward → per-event outputs [B, output_dim]
    (reference model/dynamic_reduction_network.py:82-103).

    ``diag`` (eager-only out-param): a dict that collects per-round
    diagnostics — currently ``compact_dropped``, the representatives the
    inter-round compaction would truncate (see ``compact_dropped``).

    Default path: the fused dynamic-graph build + dense cut matching
    (ops/dyn_graph.py — Pallas kernels on TPU, the composed XLA
    formulation elsewhere; ``graph_force``/``graph_interpret`` pin a
    strategy for tests).  ``knn_fn(h, mask)`` / ``gather_fn(h, nbr)``
    override the graph build and neighbor fetch — the node-sharded
    DynamicEdgeConv (parallel/dyn.py) injects its distributed top-k and
    all-gather-backed gather here and keeps the list-based matching."""
    from deepmetv2_tpu.ops.dyn_graph import build_dyn_graph, cut_matching

    h = params["datanorm"] * x
    h = mlp_apply(params["inputnet"], h, final_act=True)

    new_states: List[BatchNormState] = []
    for r in range(cfg.pool_rounds):
        round_gather = gather_fn
        if knn_fn is None:
            g = build_dyn_graph(h, mask, k=cfg.k, cap=cfg.und_cap,
                                force=graph_force,
                                interpret=graph_interpret,
                                want_mirror=cfg.mirror_gather)
            nbr = g.nbr
            if g.mirror is not None and gather_fn is gather_neighbors:
                # symmetric list: the conv backward runs as a mirror
                # gather instead of XLA's scatter-add adjoint
                from deepmetv2_tpu.ops.segment import gather_neighbors_mirror

                mirror = g.mirror
                round_gather = (
                    lambda v, n, m=mirror: gather_neighbors_mirror(v, n, m))
        else:
            g = None
            nbr = to_undirected(knn_fn(h, mask), cap=cfg.und_cap)
        h, bn_s = _drn_edgeconv(params["convs"][r], state["convs"][r], h,
                                nbr, cfg.aggr, train, round_gather,
                                conv_force, conv_interpret)
        new_states.append(bn_s)
        if g is not None:
            cluster, partner = cut_matching(g, h, mask)
        else:
            # graph structure is discrete — no gradient flows through the
            # matching weights (the composed path used to compute a dead
            # backward through this gather every step)
            w = normalized_cut_weights(jax.lax.stop_gradient(h), nbr)
            cluster, partner = handshake_matching(w, nbr, mask)
        h, mask = max_pool(h, cluster, partner, mask)
        if (cfg.compact_pool and knn_fn is None
                and r < cfg.pool_rounds - 1):
            if diag is not None:
                diag.setdefault("compact_dropped", []).append(
                    compact_dropped(mask))
            h, mask = _compact_nodes(h, mask)

    pooled = global_max_pool(h, mask)
    out = mlp_apply(params["output"], pooled)
    return out, {"convs": new_states}


def drn_net_apply(params, state, batch: EventBatch, train: bool = False,
                  cfg: DRNConfig = DRNConfig(), knn_fn=None,
                  gather_fn=gather_neighbors, graph_force=None,
                  graph_interpret: bool = False, conv_force=None,
                  conv_interpret: bool = False):
    """Output head on top of ``drn_apply``.

    ``cfg.head == 'polar'``: the commented-out DRN ``Net`` head (reference
    model/net.py:14-37) — MET magnitude via softplus, phi via
    pi·(2·sigmoid − 1).  ``cfg.head == 'cartesian'``: direct (METx, METy)
    regression (no wraparound discontinuity, no saturating sigmoid)."""
    x = jnp.concatenate(
        [batch.x_cont, batch.x_cat.astype(batch.x_cont.dtype)], axis=-1)
    out, new_state = drn_apply(params, state, x, batch.mask, train, cfg,
                               knn_fn, gather_fn, graph_force,
                               graph_interpret, conv_force, conv_interpret)
    if cfg.head == "cartesian":
        return cfg.output_scale * out[:, 0:2], new_state
    met = cfg.output_scale * jax.nn.softplus(out[:, 0:1])
    metphi = jnp.pi * (2.0 * jax.nn.sigmoid(out[:, 1:2]) - 1.0)
    return jnp.concatenate([met, metphi], axis=1), new_state
