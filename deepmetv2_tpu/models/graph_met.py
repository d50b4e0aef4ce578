"""GraphMETNetwork — the flagship per-candidate weight regressor.

Functional JAX re-design of the reference's active model
(model/graph_met_network.py:11-69 and the ``Net`` sigmoid wrapper,
model/net.py:38-47):

* three categorical embeddings — charge[3,H/4], |pdgId|[7,H/4], fromPV[8,H/4];
* continuous encoder Linear(8→H/2)+ELU, categorical encoder
  Linear(3H/4→H/2)+ELU, joint encoder Linear(H→H)+ELU + BatchNorm;
* ``conv_depth`` residual blocks  emb += BN(EdgeConv_linear(emb));
* head Linear(H→H/2)+ELU+Linear(H/2→1) → sigmoid → w ∈ (0,1) per candidate.

All EdgeConv blocks use the factorized linear path (ops/edgeconv.py tier 1):
per-edge GEMMs never happen; each block is two [N,H]×[H,H] MXU GEMMs plus
one gather-max.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from deepmetv2_tpu.config import ModelConfig
from deepmetv2_tpu.data.batching import EventBatch, Neighborhood
from deepmetv2_tpu.nn.core import (
    BatchNormState,
    batchnorm_apply,
    batchnorm_init,
    elu,
    embedding_apply,
    embedding_init,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)
from deepmetv2_tpu.ops.edgeconv import Graph, edgeconv

Params = Dict[str, Any]
State = Dict[str, Any]


def pdg_remap(pdg: jnp.ndarray, pdgs=(1, 2, 11, 13, 22, 130, 211)) -> jnp.ndarray:
    """Map |pdgId| ∈ {1,2,11,13,22,130,211} → {0..6}.

    The reference iterates ``torch.where`` per class
    (model/graph_met_network.py:52-55); here a single vectorized
    equality-argmax.  Unknown ids (incl. padding zeros) map to class 0 —
    the reference would index out of bounds on such data, so behavior only
    differs on inputs the reference cannot process.
    """
    table = jnp.asarray(pdgs, dtype=pdg.dtype)
    matches = jnp.abs(pdg)[..., None] == table
    return jnp.argmax(matches, axis=-1).astype(jnp.int32)


def graph_met_init(key: jax.Array, cfg: ModelConfig = ModelConfig(),
                   dtype=jnp.float32) -> Tuple[Params, State]:
    H = cfg.hidden_dim
    keys = jax.random.split(key, 8 + cfg.conv_depth)
    params: Params = {
        "embed_charge": embedding_init(keys[0], 3, H // 4, dtype),
        "embed_pdgid": embedding_init(keys[1], 7, H // 4, dtype),
        "embed_pv": embedding_init(keys[2], 8, H // 4, dtype),
        "embed_continuous": linear_init(keys[3], cfg.continuous_dim, H // 2, dtype),
        "embed_categorical": linear_init(keys[4], 3 * H // 4, H // 2, dtype),
        "encode_all": linear_init(keys[5], H, H, dtype),
        "output": mlp_init(keys[6], (H, H // 2, cfg.output_dim), dtype),
    }
    bn_all_p, bn_all_s = batchnorm_init(H, dtype)
    params["bn_all"] = bn_all_p
    state: State = {"bn_all": bn_all_s, "convs": []}
    params["convs"] = []
    for d in range(cfg.conv_depth):
        edge = linear_init(keys[7 + d], 2 * H, H, dtype)
        bn_p, bn_s = batchnorm_init(H, dtype)
        params["convs"].append({"edge": edge, "bn": bn_p})
        state["convs"].append(bn_s)
    return params, state


def graph_met_apply(
    params: Params,
    state: State,
    batch: EventBatch,
    nbr: Neighborhood,
    train: bool = False,
    cfg: ModelConfig = ModelConfig(),
) -> Tuple[jnp.ndarray, State]:
    """Forward pass → raw (pre-sigmoid) per-candidate scores ``[B, N]``.

    Mirrors reference model/graph_met_network.py:47-69; padded nodes produce
    garbage scores that every consumer masks via ``batch.mask``.
    """
    x_cat = batch.x_cat
    emb_cont = elu(linear_apply(params["embed_continuous"], batch.x_cont))
    emb_chrg = embedding_apply(
        params["embed_charge"], jnp.clip(x_cat[..., 1] + 1, 0, 2)
    )
    emb_pv = embedding_apply(
        params["embed_pv"], jnp.clip(x_cat[..., 2], 0, 7)
    )
    emb_pdg = embedding_apply(
        params["embed_pdgid"], pdg_remap(x_cat[..., 0], cfg.pdgs)
    )

    emb_cat = elu(linear_apply(
        params["embed_categorical"],
        jnp.concatenate([emb_chrg, emb_pdg, emb_pv], axis=-1),
    ))
    enc = elu(linear_apply(
        params["encode_all"], jnp.concatenate([emb_cat, emb_cont], axis=-1)
    ))
    emb, bn_all_s = batchnorm_apply(
        params["bn_all"], state["bn_all"], enc, batch.mask, train
    )

    conv_states: List[BatchNormState] = []
    for d, conv in enumerate(params["convs"]):
        h = edgeconv(emb, nbr, conv["edge"]["w"], conv["edge"]["b"], "max",
                     dtype=(jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                            else None))
        h, bn_s = batchnorm_apply(conv["bn"], state["convs"][d], h,
                                  batch.mask, train)
        conv_states.append(bn_s)
        emb = emb + h  # residual (reference model/graph_met_network.py:65)

    out = mlp_apply(params["output"], emb)  # Linear+ELU+Linear
    scores = jnp.squeeze(out, axis=-1)
    return scores, {"bn_all": bn_all_s, "convs": conv_states}


def net_apply(
    params: Params,
    state: State,
    batch: EventBatch,
    nbr: Neighborhood,
    train: bool = False,
    cfg: ModelConfig = ModelConfig(),
) -> Tuple[jnp.ndarray, State]:
    """``Net``: sigmoid over the graph-net scores → weights in (0,1)
    (reference model/net.py:45-47).  Padded slots are zeroed."""
    scores, new_state = graph_met_apply(params, state, batch, nbr, train, cfg)
    w = jax.nn.sigmoid(scores)
    return jnp.where(batch.mask, w, 0.0), new_state
