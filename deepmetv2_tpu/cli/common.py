"""Shared CLI plumbing for the evaluate/predict drivers."""

from __future__ import annotations

import os.path as osp

from deepmetv2_tpu.config import Config


def load_run_config(ckpt_dir: str) -> Config:
    """Defaults with the MODEL-SEMANTIC sections of the run's resolved
    config (fit writes config.json next to the checkpoints) grafted in:
    model / drn determine how a checkpoint must be interpreted (hidden
    dims, DRN head, aggregation, output scale).  Graph construction and
    data sections are NOT grafted — they describe the training run's
    dataset (e.g. a window halo sized for it) and are re-derived by each
    CLI from its own input and flags."""
    import dataclasses
    import sys

    path = osp.join(ckpt_dir, "config.json")
    if not osp.exists(path):
        print(f"note: no {path}; interpreting the checkpoint with DEFAULT "
              "model hyperparameters (a DRN trained with a non-default "
              "head/aggr/output_scale would be misread)", file=sys.stderr)
        return Config()
    with open(path) as f:
        run = Config.from_json(f.read())
    return dataclasses.replace(Config(), model=run.model, drn=run.drn)


def load_model_for_eval(args, cfg: Config, ckpt_dir: str):
    """(params, bn_state, eval_step) from the CLI's checkpoint flags.

    Handles the three sources — reference ``.pth.tar`` (--from_torch,
    GraphMETNetwork only), native ``.ckpt`` for either model family — and
    builds the matching jitted eval step.
    """
    import jax

    from deepmetv2_tpu.models import graph_met_init
    from deepmetv2_tpu.train.checkpoint import load_checkpoint
    from deepmetv2_tpu.train.step import init_train_state, make_eval_step

    if args.from_torch:
        if args.model != "graphmet":
            raise SystemExit(
                "--from_torch checkpoints are GraphMETNetwork state_dicts "
                "(reference model/net.py:41-43); use --model graphmet")
        from deepmetv2_tpu.compat import import_torch_checkpoint
        params, bn_state, _ = import_torch_checkpoint(args.from_torch)
    else:
        if args.model == "drn":
            from deepmetv2_tpu.models.drn import drn_init
            init = drn_init(jax.random.PRNGKey(0), cfg.drn)
        else:
            init = graph_met_init(jax.random.PRNGKey(0), cfg.model)
        template = init_train_state(*init, cfg)
        state, _ = load_checkpoint(
            osp.join(ckpt_dir, args.restore_file + ".ckpt"),
            template=template)
        params, bn_state = state.params, state.bn_state

    if args.model == "drn":
        from deepmetv2_tpu.train.step import make_drn_eval_step
        eval_step = make_drn_eval_step(cfg)
    else:
        eval_step = make_eval_step(cfg)
    return params, bn_state, eval_step
