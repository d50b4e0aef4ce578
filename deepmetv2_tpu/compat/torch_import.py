"""One-way importer: reference ``.pth.tar`` checkpoints → deepmetv2_tpu pytrees.

The reference persists ``{epoch, state_dict, optim_dict, sched_dict}``
(reference train.py:110-113, utils.py:59-79).  This module converts the
``state_dict`` of the trained ``Net`` (GraphMETNetwork) into the
(params, state) pytrees of models/graph_met.py, for golden-parity tests and
warm-starting TPU runs from the committed P100 checkpoints.

Layout conversions:
* torch ``nn.Linear.weight`` is ``[out, in]`` → transposed to ``[in, out]``;
* PyG EdgeConv's edge-MLP Linear ``[H, 2H]`` → transposed ``[2H, H]``; its
  row blocks [0:H]=x_i ("self") and [H:2H]=x_j−x_i ("diff") map directly
  onto the factorized edgeconv_linear convention (ops/edgeconv.py);
* BatchNorm running statistics land in the non-trainable state pytree.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from deepmetv2_tpu.nn.core import BatchNormState


def _load_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    import torch  # local import: torch is only needed for interop

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return {k: v.detach().numpy() for k, v in sd.items()}, ckpt


def _lin(sd, prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "w": jnp.asarray(sd[f"{prefix}.weight"].T),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _bn(sd, prefix: str) -> Tuple[Dict[str, jnp.ndarray], BatchNormState]:
    params = {
        "gamma": jnp.asarray(sd[f"{prefix}.weight"]),
        "beta": jnp.asarray(sd[f"{prefix}.bias"]),
    }
    state = BatchNormState(
        mean=jnp.asarray(sd[f"{prefix}.running_mean"]),
        var=jnp.asarray(sd[f"{prefix}.running_var"]),
        count=jnp.asarray(sd[f"{prefix}.num_batches_tracked"], jnp.int32),
    )
    return params, state


def import_torch_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Load a reference ``.pth.tar`` → (params, state, meta).

    ``meta`` carries epoch / optimizer hyperparams / plateau-scheduler state
    for full training resume from a reference checkpoint.
    """
    sd, ckpt = _load_state_dict(path)
    g = "graphnet"

    params: Dict[str, Any] = {
        "embed_charge": {"w": jnp.asarray(sd[f"{g}.embed_charge.weight"])},
        "embed_pdgid": {"w": jnp.asarray(sd[f"{g}.embed_pdgid.weight"])},
        "embed_pv": {"w": jnp.asarray(sd[f"{g}.embed_pv.weight"])},
        "embed_continuous": _lin(sd, f"{g}.embed_continuous.0"),
        "embed_categorical": _lin(sd, f"{g}.embed_categorical.0"),
        "encode_all": _lin(sd, f"{g}.encode_all.0"),
        "output": {
            "lin0": _lin(sd, f"{g}.output.0"),
            "lin1": _lin(sd, f"{g}.output.2"),
        },
    }
    bn_all_p, bn_all_s = _bn(sd, f"{g}.bn_all")
    params["bn_all"] = bn_all_p
    state: Dict[str, Any] = {"bn_all": bn_all_s, "convs": []}

    params["convs"] = []
    depth = 0
    while f"{g}.conv_continuous.{depth}.0.nn.0.weight" in sd:
        edge = _lin(sd, f"{g}.conv_continuous.{depth}.0.nn.0")
        bn_p, bn_s = _bn(sd, f"{g}.conv_continuous.{depth}.1")
        params["convs"].append({"edge": edge, "bn": bn_p})
        state["convs"].append(bn_s)
        depth += 1

    meta = {
        "epoch": int(ckpt.get("epoch", 0)),
        "optim": (ckpt.get("optim_dict") or {}).get("param_groups", None),
        "sched": ckpt.get("sched_dict", None),
    }
    return params, state, meta
