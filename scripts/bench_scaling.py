"""Scaling-efficiency benchmark: edges/s across device counts.

Measures the two multi-chip configurations (SURVEY.md §2c, §5):

  * dp — data parallel: events shard over the ``data`` mesh axis, weak
    scaling (fixed per-device batch), gradient psum over the mesh;
  * ep — edge partitioned: each event's eta-sorted node axis shards over
    the ``node`` axis, strong scaling (fixed global problem), per-layer
    ±halo boundary exchange (ppermute) inside the EdgeConv aggregation.

Prints one JSON line per (mode, n_devices) and a summary with scaling
efficiency relative to the 1-device run — the BASELINE.json north-star
metric (≥80 % edges/s efficiency).

Run on real hardware it measures true scaling.  Without a multi-chip TPU
(this dev environment tunnels to ONE v5e chip) use ``--force_cpu`` to run
the identical program on a virtual N-device CPU mesh: collectives,
shardings, and halo logic are exercised for real, but all virtual devices
share the host's cores, so CPU "efficiency" numbers measure emulation
overhead, not hardware scaling — treat them as plumbing validation only.

    python scripts/bench_scaling.py --force_cpu --devices 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["dp", "ep", "both"], default="both")
    p.add_argument("--devices", type=int, default=8,
                   help="max device count (powers of two up to this)")
    p.add_argument("--force_cpu", action="store_true",
                   help="virtual CPU mesh (see module docstring)")
    p.add_argument("--events_per_device", type=int, default=2)
    p.add_argument("--nodes", type=int, default=1024,
                   help="padded nodes per event (dp mode)")
    p.add_argument("--ep_nodes", type=int, default=4096,
                   help="padded nodes per event (ep mode, sharded axis)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--repeats", type=int, default=3)
    return p.parse_args()


def main() -> int:
    args = parse_args()
    if args.force_cpu:
        from deepmetv2_tpu.parallel.multihost import force_cpu_devices
        force_cpu_devices(args.devices)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
    from deepmetv2_tpu.data import collate, synthetic_events
    from deepmetv2_tpu.data.sorting import required_halo, sort_by_eta
    from deepmetv2_tpu.models import graph_met_init
    from deepmetv2_tpu.ops.graph import radius_graph
    from deepmetv2_tpu.parallel.dp import make_dp_train_step
    from deepmetv2_tpu.parallel.ep import make_ep_train_step
    from deepmetv2_tpu.parallel.mesh import make_mesh, shard_batch
    from deepmetv2_tpu.train.step import init_train_state

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32, 64)
              if n <= min(args.devices, n_avail)]
    on_cpu = jax.default_backend() == "cpu"
    print(f"# backend={jax.default_backend()} devices={n_avail} "
          f"counts={counts}", file=sys.stderr)

    def make_batch(n_events: int, n_max: int, seed: int = 0):
        events = synthetic_events(n_events, seed=seed, n_min=n_max // 2,
                                  n_max=n_max - 1)
        batch = collate(events, buckets=(n_max,), pad_events_to=n_events)
        batch, _ = sort_by_eta(batch)
        return batch

    def count_edges(batch, r):
        phi = jnp.arctan2(batch.x_cont[..., 1], batch.x_cont[..., 0])
        etaphi = jnp.stack([batch.x_cont[..., 3], phi], axis=-1)
        nbr = radius_graph(etaphi, batch.mask, r=r, k=256)
        return float(jnp.sum(nbr.mask))

    def time_step(step, state, batch):
        s, loss = step(state, batch)
        for _ in range(2):
            s, loss = step(s, batch)
        jax.block_until_ready(loss)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, loss = step(s, batch)
            jax.block_until_ready(loss)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    results = {}

    if args.mode in ("dp", "both"):
        base = None
        for n in counts:
            B = args.events_per_device * n
            batch = make_batch(B, args.nodes)
            halo = max(64, -(-required_halo(batch, 0.4) // 64) * 64)
            cfg = Config(graph=GraphConfig(mode="window", window_halo=halo),
                         data=DataConfig(batch_size=B,
                                         node_buckets=(args.nodes,)))
            mesh = make_mesh(n_data=n, n_node=1)
            state = init_train_state(
                *graph_met_init(jax.random.PRNGKey(0)), cfg)
            with mesh:
                sb = shard_batch(batch, mesh)
                t = time_step(make_dp_train_step(cfg, mesh), state, sb)
            edges = count_edges(batch, 0.4)
            eps = edges / t
            base = base or eps
            eff = eps / (base * n)
            results[("dp", n)] = (eps, eff)
            print(json.dumps({
                "mode": "dp", "devices": n, "events": B,
                "step_ms": t * 1e3, "edges_per_s": eps,
                "weak_scaling_efficiency": eff}))

    if args.mode in ("ep", "both"):
        base = None
        B = 2
        batch = make_batch(B, args.ep_nodes, seed=1)
        halo = max(64, -(-required_halo(batch, 0.4) // 64) * 64)
        edges = count_edges(batch, 0.4)
        for n in counts:
            if args.ep_nodes // n < 2 * halo:
                print(f"# ep n={n}: shard < halo, skipping", file=sys.stderr)
                continue
            cfg = Config(graph=GraphConfig(mode="window", window_halo=halo),
                         data=DataConfig(batch_size=B,
                                         node_buckets=(args.ep_nodes,)))
            mesh = make_mesh(n_data=1, n_node=n)
            state = init_train_state(
                *graph_met_init(jax.random.PRNGKey(0)), cfg)
            with mesh:
                sb = shard_batch(batch, mesh, shard_nodes=n > 1)
                step = make_ep_train_step(cfg, mesh, interpret=on_cpu)
                t = time_step(step, state, sb)
            eps = edges / t
            base = base or eps
            eff = eps / base / n
            results[("ep", n)] = (eps, eff)
            print(json.dumps({
                "mode": "ep", "devices": n, "nodes": args.ep_nodes,
                "step_ms": t * 1e3, "edges_per_s": eps,
                "strong_scaling_efficiency": eff}))

    summary = {f"{m}@{n}": {"edges_per_s": eps, "efficiency": eff}
               for (m, n), (eps, eff) in results.items()}
    print(json.dumps({"summary": summary,
                      "note": ("virtual CPU mesh — plumbing validation, "
                               "not hardware scaling") if on_cpu else
                              "real device mesh"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
