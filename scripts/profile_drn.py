"""Component-level timing of the DRN/DynamicEdgeConv hot path on the
current accelerator (VERDICT r2 #1: "first add a DRN section to bench.py
... so BENCH_r03.json shows where the time goes").

Times, via the same slope method as bench.py:
  * knn_graph          feature-space kNN build (per round)
  * to_undirected      symmetrization
  * edgeconv_mlp       tier-2 EdgeConv fwd+bwd (the DRN conv block)
  * coarsen            normalized_cut + handshake matching + max_pool
  * drn_train_step     full train step (2 rounds of all of the above
                       + input/output MLPs + loss + bwd + AdamW)

Reference scale: B8, N2048, H64, k16 (reference
model/dynamic_reduction_network.py:39-40 with a 2048-candidate bucket).
"""

from __future__ import annotations

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _slope_time, _grad_chain, K_FAST  # noqa: E402

from deepmetv2_tpu.config import Config, DRNConfig  # noqa: E402
from deepmetv2_tpu.data import collate, synthetic_events  # noqa: E402
from deepmetv2_tpu.models.drn import drn_init  # noqa: E402
from deepmetv2_tpu.nn.core import mlp_apply, mlp_init  # noqa: E402
from deepmetv2_tpu.ops.coarsen import (  # noqa: E402
    handshake_matching, max_pool, normalized_cut_weights)
from deepmetv2_tpu.ops.edgeconv import edgeconv_mlp  # noqa: E402
from deepmetv2_tpu.ops.graph import knn_graph, to_undirected  # noqa: E402
from deepmetv2_tpu.train.step import (  # noqa: E402
    init_train_state, make_drn_train_step)

B, N, H, K = 8, 2048, 64, 16


def main():
    from deepmetv2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
    n_valid = rng.integers(N - 256, N, size=B)
    mask = jnp.asarray(np.arange(N)[None, :] < n_valid[:, None])
    h = jnp.where(mask[..., None], h, 0.0)

    out = {}

    def record(name, value):
        out[name] = value
        print(f"{name}: {value:.3f}", flush=True)

    # 1. kNN build (chained: fold the mean neighbor index back into h)
    def knn_body(carry, _):
        hh = carry
        nbr = knn_graph(hh, mask, k=K, loop=False)
        return hh + 1e-12 * jnp.mean(nbr.idx.astype(jnp.float32)), None

    record("knn_graph_ms", _slope_time(knn_body, h, ks=(3, 12), label="knn") * 1e3)

    # 2. to_undirected (on a fixed kNN graph)
    nbr0 = jax.block_until_ready(knn_graph(h, mask, k=K, loop=False))

    def und_body(carry, _):
        hh = carry
        und = to_undirected(nbr0)
        return hh + 1e-12 * jnp.mean(und.idx.astype(jnp.float32)), None

    record("to_undirected_ms",
           _slope_time(und_body, h, ks=(3, 12), label="undirected") * 1e3)

    und = jax.block_until_ready(to_undirected(nbr0))

    # 3. tier-2 EdgeConv fwd+bwd over the symmetrized graph (edge-MLP =
    # Linear(2H,3H/2)+ELU+Linear(3H/2,H)+ELU, the DRN convnn minus edge BN)
    mlp_p = mlp_init(jax.random.PRNGKey(0), (2 * H, 3 * H // 2, H))

    def conv_fn(x, p):
        return edgeconv_mlp(x, und, lambda e: mlp_apply(p, e, final_act=True),
                            reduction="sum")

    def conv_body(carry, _):
        x, p = carry
        _, (dx, dp) = jax.value_and_grad(
            lambda x, p: jnp.sum(conv_fn(x, p) ** 2), argnums=(0, 1))(x, p)
        fold = lambda a, g: a + 1e-12 * g
        return (fold(x, dx), jax.tree_util.tree_map(fold, p, dp)), None

    record("edgeconv_mlp_fwd_bwd_ms", _slope_time(
        conv_body, (h, mlp_p), ks=(3, 12), label="edgeconv_mlp") * 1e3)

    # 4. coarsening stage
    def coarsen_body(carry, _):
        hh = carry
        w = normalized_cut_weights(hh, und)
        cluster, partner = handshake_matching(w, und, mask)
        pooled, _ = max_pool(hh, cluster, partner, mask)
        return hh + 1e-12 * pooled, None

    record("coarsen_ms",
           _slope_time(coarsen_body, h, ks=(3, 12), label="coarsen") * 1e3)

    # 5. full DRN train step
    events = synthetic_events(B * 4, seed=1, n_min=N - 256, n_max=N - 1)
    batch = jax.device_put(collate(events[:B], buckets=(N,)))
    cfg = Config(drn=DRNConfig(head="cartesian", output_scale=100.0))
    params, bn = drn_init(jax.random.PRNGKey(0), cfg.drn)
    step = make_drn_train_step(cfg)
    state = init_train_state(params, bn, cfg)

    record("drn_train_step_ms", _slope_time(
        lambda s, _: (step(s, batch)[0], None), state, ks=(3, 12),
        label="drn_step") * 1e3)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
