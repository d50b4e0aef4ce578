"""Batch inference CLI — a serving surface the reference lacks.

    python -m deepmetv2_tpu.cli.predict --ckpts ckpts --restore_file best \
        --data data_znunu --out predictions.npz

Loads a checkpoint (native .ckpt or reference .pth.tar via --from_torch),
runs the model over ALL events (no train/val split), and writes one npz:

  * graphmet: ``met_x, met_y, met, met_phi`` per event (the −Σ wᵢpᵢ
    estimate, reference model/net.py:55-56 sign convention) plus the
    per-candidate ``weights`` (padded [n_events, n_max], with ``n_valid``);
  * drn: ``met_x, met_y, met, met_phi`` from the direct (MET, φ) head.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np

from deepmetv2_tpu.config import Config
from deepmetv2_tpu.data import fetch_dataloader, synthetic_events


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--restore_file", default="best")
    p.add_argument("--data", default="data")
    p.add_argument("--ckpts", default="ckpts")
    p.add_argument("--synthetic", type=int, default=0, metavar="N")
    p.add_argument("--batch_size", type=int, default=40)
    p.add_argument("--graph_mode", choices=["window", "neighbor_list"],
                   default="window", help="see cli.train --graph_mode")
    p.add_argument("--from_torch", default=None)
    p.add_argument("--model", choices=["graphmet", "drn"], default="graphmet")
    p.add_argument("--out", default="predictions.npz")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from deepmetv2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from deepmetv2_tpu.cli.common import load_run_config
    cfg = load_run_config(osp.join(os.environ.get("PWD", "."), args.ckpts))
    if args.synthetic:
        events = synthetic_events(args.synthetic, seed=42)
        loaders = fetch_dataloader(events=events,
                                   batch_size=args.batch_size,
                                   validation_split=0.0,
                                   buckets=cfg.data.node_buckets)
    else:
        data_dir = osp.join(os.environ.get("PWD", "."), args.data)
        loaders = fetch_dataloader(data_dir=data_dir,
                                   batch_size=args.batch_size,
                                   validation_split=0.0,
                                   buckets=cfg.data.node_buckets)
    loader = loaders["train"]  # split 0.0 → all events (in seeded
    #                            permutation order; un-permuted on output)

    from deepmetv2_tpu.cli.train import apply_graph_mode
    cfg = apply_graph_mode(cfg, args, loader.dataset)

    ckpt_dir = osp.join(os.environ.get("PWD", "."), args.ckpts)
    from deepmetv2_tpu.cli.common import load_model_for_eval
    params, bn_state, eval_step = load_model_for_eval(args, cfg, ckpt_dir)

    from deepmetv2_tpu.train.metrics import _neg_weighted_met

    mets, weights, nvalids = [], [], []
    for batch in loader:
        out, _, _ = eval_step(params, bn_state, batch)
        if args.model == "drn":
            mets.append(out)                          # already [B, 2]
        else:
            mets.append(_neg_weighted_met(out, batch))
            weights.append(np.asarray(out))           # ragged buckets
        nvalids.append(batch.num_valid)

    met = np.asarray(jnp.concatenate(mets, axis=0))
    nv = np.asarray(jnp.concatenate([jnp.asarray(v) for v in nvalids]))
    # Batch padding (empty events, num_valid == 0) is appended at the END
    # of each batch by collate, so the first len(batch_idx) rows of each
    # batch_size-row block are the real events, in plan order.
    real = np.zeros(len(nv), dtype=bool)
    row = 0
    for batch_idx in loader._batches:
        real[row: row + len(batch_idx)] = True
        row += loader.batch_size
    idx = np.concatenate(list(loader._batches))
    # The loader iterates in (seeded) permutation order; un-permute so row
    # i of every output array is event i of the input dataset.
    order = np.argsort(idx)
    met = met[real][order]
    arrays = {
        "event_index": idx[order],   # == arange: row i is input event i
        "met_x": met[:, 0],
        "met_y": met[:, 1],
        "met": np.hypot(met[:, 0], met[:, 1]),
        "met_phi": np.arctan2(met[:, 1], met[:, 0]),
        "n_valid": nv[real][order],
    }
    if weights:
        n_max = max(w.shape[1] for w in weights)
        wpad = np.zeros((len(nv), n_max), np.float32)
        row = 0
        for w in weights:
            wpad[row:row + w.shape[0], : w.shape[1]] = w
            row += w.shape[0]
        arrays["weights"] = wpad[real][order]

    np.savez_compressed(args.out, **arrays)
    print(f"wrote {args.out}: {int(real.sum())} events"
          + (", per-candidate weights included"
             if "weights" in arrays else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
