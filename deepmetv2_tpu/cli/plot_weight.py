"""Learned-weight diagnostics CLI — reference plt_weight.py equivalent.

    python -m deepmetv2_tpu.cli.plot_weight --ckpts ckpts --restore_file best \
        --data data   (or --synthetic N)

Runs the model over the validation split, accumulates per-class weight
histograms and qT spectra, saves ``weight.plt`` (lz4 pickle, reference
layout) and renders PNGs.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import jax

from deepmetv2_tpu.config import Config
from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
from deepmetv2_tpu.models import graph_met_init
from deepmetv2_tpu.plotting import compute_weight_summary, plot_weight_summary
from deepmetv2_tpu.train.checkpoint import load_checkpoint
from deepmetv2_tpu.train.step import init_train_state, make_eval_step
from deepmetv2_tpu.utils import artifacts


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--restore_file", default=None)
    p.add_argument("--data", default="data")
    p.add_argument("--ckpts", default="ckpts")
    p.add_argument("--synthetic", type=int, default=0, metavar="N")
    p.add_argument("--batch_size", type=int, default=60)  # plt_weight.py:213
    p.add_argument("--from_torch", default=None)
    args = p.parse_args(argv)

    from deepmetv2_tpu.cli.common import load_run_config
    cfg = load_run_config(osp.join(os.environ.get("PWD", "."), args.ckpts))
    if args.synthetic:
        events = synthetic_events(args.synthetic, seed=42)
        loaders = fetch_dataloader(events=events, batch_size=args.batch_size,
                                   validation_split=0.5,
                                   buckets=cfg.data.node_buckets)
    else:
        loaders = fetch_dataloader(
            data_dir=osp.join(os.environ.get("PWD", "."), args.data),
            batch_size=args.batch_size, validation_split=0.5,
            buckets=cfg.data.node_buckets)

    if args.from_torch:
        from deepmetv2_tpu.compat import import_torch_checkpoint
        params, bn_state, _ = import_torch_checkpoint(args.from_torch)
    else:
        params, bn_state = graph_met_init(jax.random.PRNGKey(0), cfg.model)
        if args.restore_file:
            ckpt_dir = osp.join(os.environ.get("PWD", "."), args.ckpts)
            template = init_train_state(params, bn_state, cfg)
            state, _ = load_checkpoint(
                osp.join(ckpt_dir, args.restore_file + ".ckpt"),
                template=template)
            params, bn_state = state.params, state.bn_state

    eval_step = make_eval_step(cfg)
    summary = compute_weight_summary(eval_step, params, bn_state,
                                     loaders["test"], cfg)
    # artifacts land next to the checkpoints (the reference wrote
    # weight.plt into the cwd, plt_weight.py:205 — an accident of its
    # flat layout, not a contract)
    out_dir = osp.join(os.environ.get("PWD", "."), args.ckpts)
    os.makedirs(out_dir, exist_ok=True)
    dest = osp.join(out_dir, "weight.plt")
    artifacts.save(summary, dest)
    print("wrote", dest)
    for w in plot_weight_summary(summary, osp.join(out_dir, "weight_")):
        print("wrote", w)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
