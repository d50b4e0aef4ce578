"""Training CLI — equivalent of reference train.py:62-145.

    python -m deepmetv2_tpu.cli.train --data data_dytt --ckpts ckpts_dytt
    python -m deepmetv2_tpu.cli.train --synthetic 200 --epochs 5  # hermetic

Flags mirror the reference (--data, --ckpts, --restore_file) plus named
overrides for the previously hard-coded hyperparameters.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import os.path as osp

import jax

from deepmetv2_tpu.config import Config, DataConfig, TrainConfig
from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
from deepmetv2_tpu.models import graph_met_init
from deepmetv2_tpu.train.loop import fit
from deepmetv2_tpu.train.step import init_train_state


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--restore_file", default=None,
                   help="checkpoint stem in --ckpts to resume from "
                        "('best' or 'last')")
    p.add_argument("--data", default="data", help="data folder (npz slices)")
    p.add_argument("--ckpts", default="ckpts", help="checkpoint folder")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="train on N generated events instead of --data")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=0, help="model init seed")
    p.add_argument("--model", choices=["graphmet", "drn"], default="graphmet",
                   help="'graphmet': flagship per-candidate weight regressor "
                        "(reference model/net.py:38-47); 'drn': "
                        "DynamicReductionNetwork direct (MET, phi) head "
                        "(the reference's commented-out Net, "
                        "model/net.py:12-37)")
    p.add_argument("--drn_aggr", choices=["add", "max", "mean"], default=None,
                   help="DRN EdgeConv aggregation (default from config: "
                        "'add', the reference DRN ctor default)")
    p.add_argument("--drn_head", choices=["polar", "cartesian"], default=None,
                   help="DRN output head: 'polar' (reference commented Net, "
                        "softplus MET + sigmoid phi; CAN COLLAPSE — the "
                        "saturating activations trap training at MET=0 / "
                        "phi=pi with vanishing gradients) or 'cartesian' "
                        "(direct METx/METy regression; recommended)")
    p.add_argument("--ring_knn", action="store_true",
                   help="node-sharded DRN runs (--model drn --mesh DxN): "
                        "build each round's kNN graph with the "
                        "ring-pipelined top-k instead of the all-gather "
                        "build — O(B*n_loc*(D+k)) peak per-chip memory, "
                        "for events larger than one chip")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="EdgeConv hot-path precision "
                        "(ModelConfig.compute_dtype): bfloat16 runs the "
                        "conv GEMMs MXU-bf16 (f32 accumulation) and the "
                        "window aggregation on bf16 values; positions and "
                        "adjacency stay f32")
    p.add_argument("--grad_clip", type=float, default=None,
                   help="global-norm gradient clipping (default: off, "
                        "matching the reference)")
    p.add_argument("--plateau_patience", type=int, default=None,
                   help="ReduceLROnPlateau patience in epochs (default from "
                        "config: 500, the reference's setting — which never "
                        "fires inside a 100-epoch run; lower it to let the "
                        "LR actually decay on a plateau)")
    p.add_argument("--bn_refresh", type=int, default=None, metavar="M",
                   help="precise-BN: refresh BatchNorm running stats with M "
                        "training batches before each validation pass "
                        "(default: off; recommended ~30 for --model drn)")
    p.add_argument("--mode", choices=["sequential", "bucketed"],
                   default="sequential", help="batching mode")
    p.add_argument("--graph_mode", choices=["window", "neighbor_list"],
                   default="window",
                   help="'window': implicit sorted-order radius graph "
                        "(Pallas fast path, uncapped degree; the halo is "
                        "sized from the dataset automatically); "
                        "'neighbor_list': explicit capped-degree lists "
                        "(reference-cap semantics, train.py:48)")
    p.add_argument("--sort_mode", choices=["cell", "eta"], default=None,
                   help="window-mode row order: 'cell' (eta-quantile-block "
                        "x phi, fastest kernel layout; default) or 'eta' "
                        "(plain eta sort; the default for edge-partitioned "
                        "--mesh DxN runs, where it minimizes the halo "
                        "exchanged between node shards — pass 'cell' "
                        "explicitly to trade ICI bytes for kernel speed)")
    p.add_argument("--from_torch", default=None,
                   help="warm-start from a reference .pth.tar checkpoint")
    p.add_argument("--mesh", default=None, metavar="DxN",
                   help="multi-chip training over a device mesh: 'D' = "
                        "data-parallel over D chips, 'DxN' = data x node "
                        "(edge-partitioned window mode with halo "
                        "exchange), e.g. --mesh 4 or --mesh 2x4. "
                        "batch_size must divide by D; node buckets by N")
    return p


def apply_graph_mode(cfg: Config, args, all_events, presorted: bool = False,
                     loaders=None) -> Config:
    """Resolve --graph_mode into the config; in window mode, size the
    compiled halo from the data (max sorted-order neighbor span, rounded up
    to the 64-row DMA grid).  ``presorted=True`` only when the caller's
    loaders were built with ``presort_eta=True`` — it makes the compiled
    steps trust the batch order and skip their device argsort.  With
    ``loaders`` given, the halo is sized on the loaders' ACTUAL emitted row
    order (required for cell-sorted loaders, whose span differs from the
    eta-sorted one); otherwise from raw events assuming eta order."""
    from deepmetv2_tpu.config import GraphConfig
    from deepmetv2_tpu.data.sorting import required_halo_events

    if args.graph_mode != "window":
        return cfg
    if loaders is not None:
        spans = [ld.required_halo(cfg.graph.delta_r)
                 for ld in loaders if len(ld)]
        halo = (max(spans) if spans
                else required_halo_events(all_events, cfg.graph.delta_r))
    else:
        halo = required_halo_events(all_events, cfg.graph.delta_r)
    halo = max(64, -(-halo // 64) * 64)
    return dataclasses.replace(
        cfg, graph=dataclasses.replace(cfg.graph, mode="window",
                                       window_halo=halo,
                                       presorted=presorted))


def parse_mesh(spec):
    """'D' or 'DxN' → (n_data, n_node), with a readable error on malformed
    values like '4x' or '2x4x1'."""
    if not spec:
        return None
    parts = spec.lower().split("x")
    try:
        dims = [int(p) for p in parts]
    except ValueError:
        dims = []
    if not dims or len(dims) > 2 or any(d < 1 for d in dims):
        raise SystemExit(f"--mesh: expected 'D' or 'DxN' with positive "
                         f"integers (e.g. 4 or 2x4), got {spec!r}")
    return (dims[0], dims[1] if len(dims) > 1 else 1)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    mesh_dims = parse_mesh(args.mesh)

    from deepmetv2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = Config(data=DataConfig(batch_size=args.batch_size))
    if args.lr is not None:
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, lr=args.lr))
    if args.grad_clip is not None:
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim,
                                           grad_clip_norm=args.grad_clip))
    if args.epochs is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=args.epochs))
    if args.compute_dtype is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype=args.compute_dtype))
    if args.bn_refresh is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, bn_refresh_batches=args.bn_refresh))
    if args.plateau_patience is not None:
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(
                cfg.optim, plateau_patience=args.plateau_patience))
    if args.model == "drn" and (args.drn_head or cfg.drn.head) == "polar":
        # observed failure mode (150-epoch synthetic run): softplus MET
        # saturates at 0 and sigmoid phi at pi within one epoch, gradients
        # ~1e-11, training frozen.  Faithful to the reference's commented
        # head (model/net.py:14-37) but a trap for real runs.
        print("warning: the polar DRN head saturates easily and can freeze "
              "training (softplus MET -> 0, sigmoid phi -> pi); "
              "--drn_head cartesian is the robust choice")
    drn_over = {}
    if args.drn_aggr is not None:
        drn_over["aggr"] = args.drn_aggr
    if args.drn_head is not None:
        drn_over["head"] = args.drn_head
    if args.ring_knn:
        if not (args.model == "drn" and mesh_dims and mesh_dims[1] > 1):
            raise SystemExit("--ring_knn requires --model drn and a "
                             "node-sharded mesh (--mesh DxN, N > 1)")
        drn_over["ring_knn"] = True
    if drn_over:
        cfg = dataclasses.replace(
            cfg, drn=dataclasses.replace(cfg.drn, **drn_over))

    # Window mode: the loader pre-sorts spatially on the host once per
    # batch (memoized) and apply_graph_mode marks the config presorted, so
    # the compiled steps never run a device argsort.  Default row order is
    # 'cell' (fastest kernel layout); edge-partitioned runs use 'eta',
    # which minimizes the halo exchanged between node shards.
    ep_run = bool(mesh_dims and mesh_dims[1] > 1)
    sort_mode = args.sort_mode or ("eta" if ep_run else "cell")
    if args.sort_mode == "cell" and ep_run:
        # supported (the ±halo exchange is row-order-agnostic given the
        # order's own span as the halo; exactness in tests/test_halo.py) —
        # but the cell span is ~2-3x the eta span, so this trades ICI halo
        # bytes for the cell order's kernel speed; see ARCHITECTURE §4.
        print("note: cell-order edge partitioning exchanges the (wider) "
              "cell span as its halo; 'eta' minimizes ICI traffic")
    presort = args.graph_mode == "window" and args.model != "drn"
    presort_kw = dict(presort_eta=presort, presort_mode=sort_mode,
                      presort_r=cfg.graph.delta_r)
    if args.synthetic:
        events = synthetic_events(args.synthetic, seed=42)
        loaders = fetch_dataloader(
            events=events, batch_size=cfg.data.batch_size,
            validation_split=cfg.data.validation_split,
            buckets=cfg.data.node_buckets, mode=args.mode, **presort_kw)
    else:
        data_dir = osp.join(os.environ.get("PWD", "."), args.data)
        loaders = fetch_dataloader(
            data_dir=data_dir, batch_size=cfg.data.batch_size,
            validation_split=cfg.data.validation_split,
            buckets=cfg.data.node_buckets, mode=args.mode, **presort_kw)

    cfg = apply_graph_mode(
        cfg, args, loaders["train"].dataset, presorted=presort,
        loaders=[loaders["train"], loaders["test"]] if presort else None)
    print(len(loaders["train"]), len(loaders["test"]))
    if cfg.graph.mode == "window":
        order = sort_mode if presort else "eta (device sort)"
        print(f"graph mode: window (halo {cfg.graph.window_halo}, "
              f"order {order})")
    print("devices:", jax.devices())

    if args.from_torch:
        from deepmetv2_tpu.compat import import_torch_checkpoint
        params, bn_state, _ = import_torch_checkpoint(args.from_torch)
    elif args.model == "drn":
        import numpy as np
        from deepmetv2_tpu.models.drn import drn_init
        ds = loaders["train"].dataset
        idx = loaders["train"].indices
        qts = [float(np.hypot(ds[int(i)][1][0], ds[int(i)][1][1]))
               for i in idx]
        met_bias = float(np.mean(qts)) if qts else 0.0
        # Data-dependent datanorm: 1/std per feature over the training
        # candidates (the reference's fixed constants are scaled for its
        # CMS ntuples; the right generalization is the dataset's own
        # scale — same spirit as the reference's hand-tuned list).
        # Single streaming pass: O(n_features) memory, no copy of the set.
        n_feat = ds[int(idx[0])][0].shape[1]
        cnt, s1, s2 = 0, np.zeros(n_feat), np.zeros(n_feat)
        for i in idx:
            x = ds[int(i)][0]
            cnt += x.shape[0]
            s1 += x.sum(axis=0)
            s2 += (x.astype(np.float64) ** 2).sum(axis=0)
        var = np.maximum(s2 / cnt - (s1 / cnt) ** 2, 0.0)
        std = np.sqrt(var)
        norm = tuple(1.0 / np.where(std > 1e-6, std, 1.0))
        # Data-dependent output scale: the head emits O(1) units, the
        # target is O(10^2) GeV — see DRNConfig.output_scale.
        if met_bias > 0:
            cfg = dataclasses.replace(
                cfg, drn=dataclasses.replace(cfg.drn, output_scale=met_bias))
        print(f"drn: output scale = mean |genMET| = {met_bias:.1f}; "
              f"datanorm from training-set feature stds")
        params, bn_state = drn_init(jax.random.PRNGKey(args.seed), cfg.drn,
                                    norm=norm, met_bias=met_bias)
    else:
        params, bn_state = graph_met_init(jax.random.PRNGKey(args.seed),
                                          cfg.model)
    state = init_train_state(params, bn_state, cfg)

    mesh, shard_nodes = None, False
    if mesh_dims:
        from deepmetv2_tpu.parallel.mesh import make_mesh
        n_data, n_node = mesh_dims
        if cfg.data.batch_size % n_data != 0:
            raise SystemExit(f"--mesh: batch_size {cfg.data.batch_size} "
                             f"not divisible by data axis {n_data}")
        bad = [b for b in cfg.data.node_buckets if b % n_node != 0]
        if bad:
            raise SystemExit(f"--mesh: node buckets {bad} not divisible "
                             f"by node axis {n_node}")
        mesh = make_mesh(n_data=n_data, n_node=n_node)
        shard_nodes = n_node > 1
        print(f"mesh: {n_data} data x {n_node} node over "
              f"{len(jax.devices())} devices"
              + (" (edge-partitioned)" if shard_nodes else ""))

    ckpt_dir = osp.join(os.environ.get("PWD", "."), args.ckpts)
    fit(state, cfg, loaders["train"], loaders["test"], ckpt_dir,
        restore_file=args.restore_file, model=args.model,
        mesh=mesh, shard_nodes=shard_nodes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
