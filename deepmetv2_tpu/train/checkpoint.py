"""Checkpoint save/restore — reference utils.py:59-101 contract, JAX-native.

``last.ckpt`` every epoch, ``best.ckpt`` on validation improvement, each a
self-contained lz4+pickle archive of
``{epoch, params, bn_state, opt_state, sched_state}`` with all device
arrays materialized to numpy.  Restore rebuilds exact training state
(model + optimizer moments + plateau controller), matching the reference's
resume path (train.py:92-98).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from deepmetv2_tpu.train.schedule import ReduceLROnPlateau
from deepmetv2_tpu.train.step import TrainState
from deepmetv2_tpu.utils import artifacts


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    state: TrainState,
    scheduler: ReduceLROnPlateau,
    epoch: int,
    is_best: bool,
    checkpoint_dir: str,
) -> str:
    """Write ``last.ckpt`` (or ``best.ckpt``) — reference utils.py:59-79."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    name = "best.ckpt" if is_best else "last.ckpt"
    path = osp.join(checkpoint_dir, name)
    payload = {
        "epoch": int(epoch),
        "params": _to_host(state.params),
        "bn_state": _to_host(state.bn_state),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "sched_state": scheduler.state_dict(),
        "format_version": 1,
    }
    artifacts.save(payload, path)
    return path


def load_checkpoint(
    path: str,
    template: Optional[TrainState] = None,
    scheduler: Optional[ReduceLROnPlateau] = None,
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a checkpoint (reference utils.py:82-101).

    ``template``: a freshly-initialized TrainState whose treedef is used to
    rebuild typed structures (NamedTuples survive pickling, so this is only
    needed to restore device placement / dtypes consistently).
    """
    if not osp.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    payload = artifacts.load(path)
    state = TrainState(
        params=payload["params"],
        bn_state=payload["bn_state"],
        opt_state=payload["opt_state"],
        step=np.asarray(payload["step"], np.int32),
    )
    if template is not None:
        # adopt the template's structure (asserts matching treedefs)
        t_leaves, t_def = jax.tree_util.tree_flatten(template)
        s_leaves, s_def = jax.tree_util.tree_flatten(state)
        assert len(t_leaves) == len(s_leaves), (
            f"checkpoint/template mismatch: {len(s_leaves)} vs {len(t_leaves)} leaves"
        )
        state = jax.tree_util.tree_unflatten(t_def, s_leaves)
    if scheduler is not None and payload.get("sched_state"):
        scheduler.load_state_dict(payload["sched_state"])
    return state, payload
