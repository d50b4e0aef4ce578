"""Benchmark: EdgeConv fwd+bwd throughput on the current accelerator.

Prints ONE JSON line:
  {"metric": "edgeconv_fwd_bwd_edges_per_s", "value": ..., "unit": "edges/s",
   "vs_baseline": ...}

``value``: true radius-graph edges processed per second through forward AND
backward of this framework's flagship EdgeConv path — the implicit windowed
Pallas kernel over eta-sorted events (ops/pallas/edgeconv_window.py), which
evaluates every in-radius pair (the reference caps at 255 neighbors;
we don't).

``vs_baseline``: speedup versus the reference *design* — an explicit
neighbor-list gather-concat-GEMM-scatter EdgeConv (the algorithm
torch_cluster/PyG executes on CUDA, reference model/graph_met_network.py:38)
implemented in XLA on the same hardware, same graph, same numerics.  The
reference repo publishes no throughput numbers (BASELINE.md), so its own
algorithmic structure is the baseline.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from deepmetv2_tpu.data import collate, synthetic_events
from deepmetv2_tpu.data.batching import Neighborhood
from deepmetv2_tpu.data.sorting import required_halo, sort_by_eta
from deepmetv2_tpu.ops.edgeconv import edgeconv_linear
from deepmetv2_tpu.ops.graph import radius_graph
from deepmetv2_tpu.ops.segment import gather_neighbors
from deepmetv2_tpu.ops.window import WindowGraph

# Reference-scale bucketed batch: events up to ~2k candidates, dR=0.4.
B, N, H, K, R = 8, 2048, 32, 256, 0.4
WARMUP, ITERS = 5, 30


def _naive_edgeconv(x, nbr, w, b):
    """Reference-design EdgeConv: materialize all E edge features, per-edge
    GEMM, segment-max — the algorithm the CUDA extension stack executes."""
    xj = gather_neighbors(x, nbr)                                # [B,N,K,H]
    xi = jnp.broadcast_to(x[:, :, None, :], xj.shape)
    e = jnp.concatenate([xi, xj - xi], axis=-1)                  # [B,N,K,2H]
    msg = jnp.einsum("bnkh,hf->bnkf", e, w,
                     preferred_element_type=jnp.float32) + b
    msg = jnp.where(nbr.mask[..., None], msg, -jnp.inf)
    out = jnp.max(msg, axis=2)
    return jnp.where(jnp.any(nbr.mask, axis=-1, keepdims=True), out, 0.0)


REPEATS = 4  # take the min: the axon tunnel adds sporadic multi-ms stalls


def _time(fn, *args) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(WARMUP - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main() -> None:
    events = synthetic_events(B, seed=0, n_min=N - 256, n_max=N - 1)
    batch = collate(events, buckets=(N,))
    batch, _ = sort_by_eta(batch)
    phi = jnp.arctan2(batch.x_cont[..., 1], batch.x_cont[..., 0])
    etaphi = jnp.stack([batch.x_cont[..., 3], phi], axis=-1)
    halo = required_halo(batch, R)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
    x = jnp.where(batch.mask[..., None], x, 0.0)
    w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32) * 0.1)
    bias = jnp.zeros((H,), jnp.float32)

    nbr = radius_graph(etaphi, batch.mask, r=R, k=K)
    edges = float(jnp.sum(nbr.mask))

    def grad_of(fn):
        return jax.jit(jax.value_and_grad(
            lambda x, w: jnp.sum(fn(x, w) ** 2), argnums=(0, 1)))

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        from deepmetv2_tpu.ops.pallas.edgeconv_window import (
            window_edgeconv_linear_pallas,
        )
        g = WindowGraph(etaphi, batch.mask, r=R, halo=halo)
        fast = grad_of(lambda x, w: window_edgeconv_linear_pallas(
            x, g, w, bias))
    else:
        from deepmetv2_tpu.ops.window import window_edgeconv_linear
        g = WindowGraph(etaphi, batch.mask, r=R, halo=halo)
        fast = grad_of(lambda x, w: window_edgeconv_linear(x, g, w, bias))

    t_fast = _time(fast, x, w)
    naive = grad_of(lambda x, w: _naive_edgeconv(x, nbr, w, bias))
    t_naive = _time(naive, x, w)
    factored = grad_of(lambda x, w: edgeconv_linear(x, nbr, w, bias, "max"))
    t_factored = _time(factored, x, w)

    # End-to-end train step (graph build + fwd + loss + bwd + AdamW) on the
    # flagship model, window mode — the full per-step pipeline of reference
    # train.py:39-54 as ONE compiled program.
    from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
    from deepmetv2_tpu.models import graph_met_init
    from deepmetv2_tpu.train.step import init_train_state, make_train_step

    halo_c = max(64, -(-halo // 64) * 64)
    cfg = Config(graph=GraphConfig(mode="window", window_halo=halo_c),
                 data=DataConfig(batch_size=B, node_buckets=(N,)))
    params, bn = graph_met_init(jax.random.PRNGKey(0))
    state = init_train_state(params, bn, cfg)
    step = make_train_step(cfg)

    # Inference throughput (serving path): jitted forward + loss, no grad.
    # MUST run before the train-step timing: train_step donates its state,
    # whose leaves alias these params/bn buffers (donation deletes them).
    from deepmetv2_tpu.train.step import make_eval_step

    eval_step = make_eval_step(cfg)
    t_infer = _time(lambda: eval_step(params, bn, batch))

    def time_steps(step, state, iters):
        s, loss = step(state, batch)          # compile + warmup
        for _ in range(2):
            s, loss = step(s, batch)
        jax.block_until_ready(loss)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for _ in range(iters):
                s, loss = step(s, batch)
            jax.block_until_ready(loss)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_step = time_steps(step, state, ITERS)

    result = {
        "metric": "edgeconv_fwd_bwd_edges_per_s",
        "value": edges / t_fast,
        "unit": "edges/s",
        "vs_baseline": t_naive / t_fast,
        "extras": {
            "config": {"B": B, "N": N, "H": H, "K": K, "r": R, "halo": halo,
                       "true_edges": edges},
            "window_pallas_ms": t_fast * 1e3,
            "naive_refdesign_ms": t_naive * 1e3,
            "factored_nbrlist_ms": t_factored * 1e3,
            "train_step_window_ms": t_step * 1e3,
            "train_step_events_per_s": B / t_step,
            "inference_step_ms": t_infer * 1e3,
            "inference_events_per_s": B / t_infer,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
