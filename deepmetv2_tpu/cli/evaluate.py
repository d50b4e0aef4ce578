"""Standalone evaluation CLI — equivalent of reference evaluate.py:167-219.

    python -m deepmetv2_tpu.cli.evaluate --data data_dytt --ckpts ckpts_dytt \
        --restore_file best

Loads a checkpoint (native .ckpt, or a reference .pth.tar via --from_torch),
runs the validation split, writes ``<restore_file>.resolutions``.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

from deepmetv2_tpu.config import Config
from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
from deepmetv2_tpu.train.loop import evaluate
from deepmetv2_tpu.utils import artifacts


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--restore_file", default="best")
    p.add_argument("--data", default="data")
    p.add_argument("--ckpts", default="ckpts")
    p.add_argument("--synthetic", type=int, default=0, metavar="N")
    p.add_argument("--batch_size", type=int, default=40)  # evaluate.py:176
    p.add_argument("--graph_mode", choices=["window", "neighbor_list"],
                   default="window", help="see cli.train --graph_mode")
    p.add_argument("--from_torch", default=None,
                   help="evaluate a reference .pth.tar instead of a .ckpt")
    p.add_argument("--model", choices=["graphmet", "drn"], default="graphmet",
                   help="model family the checkpoint belongs to")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from deepmetv2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # Evaluate under the RUN's resolved config (fit writes config.json next
    # to the checkpoints): model family hyperparameters like the DRN head /
    # aggregation / output scale must match what was trained.
    from deepmetv2_tpu.cli.common import load_run_config
    cfg = load_run_config(osp.join(os.environ.get("PWD", "."), args.ckpts))

    if args.synthetic:
        events = synthetic_events(args.synthetic, seed=42)
        loaders = fetch_dataloader(events=events, batch_size=args.batch_size,
                                   validation_split=0.2,
                                   buckets=cfg.data.node_buckets)
    else:
        data_dir = osp.join(os.environ.get("PWD", "."), args.data)
        loaders = fetch_dataloader(data_dir=data_dir,
                                   batch_size=args.batch_size,
                                   validation_split=0.2,
                                   buckets=cfg.data.node_buckets)

    from deepmetv2_tpu.cli.train import apply_graph_mode
    cfg = apply_graph_mode(cfg, args, loaders["test"].dataset)

    ckpt_dir = osp.join(os.environ.get("PWD", "."), args.ckpts)
    # a --from_torch evaluation may target a fresh artifact dir
    os.makedirs(ckpt_dir, exist_ok=True)
    from deepmetv2_tpu.cli.common import load_model_for_eval
    params, bn_state, eval_step = load_model_for_eval(args, cfg, ckpt_dir)
    test_metrics, resolutions = evaluate(params, bn_state, eval_step,
                                         loaders["test"], cfg,
                                         model=args.model)
    artifacts.save(resolutions,
                   osp.join(ckpt_dir, f"{args.restore_file}.resolutions"))
    print("validation loss:", test_metrics["loss"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
