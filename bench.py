"""Benchmark: EdgeConv fwd+bwd throughput on the current accelerator.

Prints ONE JSON line:
  {"metric": "edgeconv_fwd_bwd_edges_per_s", "value": ..., "unit": "edges/s",
   "vs_baseline": ...}

``value`` is the throughput of this framework's factorized EdgeConv
(ops/edgeconv.py tier 1: two node GEMMs + gather-max) through forward AND
backward.  ``vs_baseline`` is the speedup versus the reference *design* —
an edge-materialized gather-concat-GEMM-scatter EdgeConv (what PyG/
torch_cluster does, reference model/graph_met_network.py:38) implemented in
XLA on the same hardware, same graph, same numerics.  The reference repo
publishes no throughput numbers (BASELINE.md), so its own algorithmic
structure is the baseline.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from deepmetv2_tpu.data.batching import Neighborhood
from deepmetv2_tpu.ops.edgeconv import edgeconv_linear
from deepmetv2_tpu.ops.segment import gather_neighbors


# Bench configuration: a bucketed batch of large events
# (reference-scale: events up to ~5k candidates, <=255 neighbors).
B, N, K, H = 8, 2048, 256, 32
WARMUP, ITERS = 3, 20


def _make_inputs(seed: int = 0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    # synthetic neighbor lists: ring-local neighborhoods (realistic locality)
    base = np.arange(N)[:, None]
    offs = np.arange(K)[None, :] - K // 2
    idx = (base + offs) % N
    nbr_idx = jnp.asarray(np.broadcast_to(idx, (B, N, K)).astype(np.int32))
    nbr_mask = jnp.ones((B, N, K), bool)
    w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32) * 0.1)
    b = jnp.zeros((H,), jnp.float32)
    return x, Neighborhood(nbr_idx, nbr_mask), w, b


def _naive_edgeconv(x, nbr, w, b):
    """Reference-design EdgeConv: materialize all E edge features, per-edge
    GEMM, segment-max — the algorithm the CUDA stack executes."""
    xj = gather_neighbors(x, nbr)                                # [B,N,K,H]
    xi = jnp.broadcast_to(x[:, :, None, :], xj.shape)
    e = jnp.concatenate([xi, xj - xi], axis=-1)                  # [B,N,K,2H]
    msg = jnp.einsum("bnkh,hf->bnkf", e, w,
                     preferred_element_type=jnp.float32) + b
    msg = jnp.where(nbr.mask[..., None], msg, -jnp.inf)
    out = jnp.max(msg, axis=2)
    return jnp.where(jnp.any(nbr.mask, axis=-1, keepdims=True), out, 0.0)


def _time_fwd_bwd(fn, x, nbr, w, b) -> float:
    """Seconds per iteration of value+grad (grads w.r.t. x and w)."""

    def loss(x, w):
        return jnp.sum(fn(x, nbr, w, b) ** 2)

    g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    for _ in range(WARMUP):
        out = g(x, w)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = g(x, w)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    x, nbr, w, b = _make_inputs()
    edges = B * N * K

    t_fast = _time_fwd_bwd(
        lambda x, nbr, w, b: edgeconv_linear(x, nbr, w, b, "max"), x, nbr, w, b)
    t_naive = _time_fwd_bwd(_naive_edgeconv, x, nbr, w, b)

    edges_per_s = edges / t_fast
    result = {
        "metric": "edgeconv_fwd_bwd_edges_per_s",
        "value": edges_per_s,
        "unit": "edges/s",
        "vs_baseline": t_naive / t_fast,
        "extras": {
            "config": {"B": B, "N": N, "K": K, "H": H},
            "fast_ms_per_iter": t_fast * 1e3,
            "naive_ms_per_iter": t_naive * 1e3,
            "naive_edges_per_s": edges / t_naive,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
