"""Minimal functional NN layer — the ATen-dense-ops tier rebuilt for JAX.

The reference leans on torch C++/CUDA dense ops (``nn.Linear``,
``nn.BatchNorm1d``, ``nn.Embedding``, ``nn.ELU``; reference
model/graph_met_network.py:15-44).  Here each module is a pair of pure
functions — ``*_init(key, ...) -> params`` and ``*_apply(params, x)`` —
over plain dict pytrees: trivially jit/grad/shard-able, orbax-friendly,
no framework magic.

Initialization matches torch defaults (Kaiming-uniform for Linear with
fan-in bound, N(0,1) for Embedding) so from-scratch training behaves like
the reference; parity tests instead import the reference's trained weights
(compat/torch_import.py).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def elu(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """ELU matching torch.nn.ELU (alpha=1)."""
    safe = jnp.where(x > 0, 0.0, x)  # avoid exp overflow in the dead branch
    return jnp.where(x > 0, x, alpha * (jnp.exp(safe) - 1.0))


# ---------------------------------------------------------------- Linear


def linear_init(key: jax.Array, in_dim: int, out_dim: int,
                dtype=jnp.float32) -> Params:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        # stored as [in, out] (JAX convention; transposed vs torch's [out, in])
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...h,hf->...f", x, params["w"],
                      preferred_element_type=x.dtype) + params["b"]


# ------------------------------------------------------------- Embedding


def embedding_init(key: jax.Array, vocab: int, dim: int,
                   dtype=jnp.float32) -> Params:
    """torch nn.Embedding default init: N(0, 1)."""
    return {"w": jax.random.normal(key, (vocab, dim), dtype)}


def embedding_apply(params: Params, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["w"], idx, axis=0)


# ---------------------------------------------------------------- MLP


def mlp_init(key: jax.Array, dims: Sequence[int], dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"lin{i}": linear_init(keys[i], dims[i], dims[i + 1], dtype)
        for i in range(len(dims) - 1)
    }


def mlp_apply(params: Params, x: jnp.ndarray, act=elu,
              final_act: bool = False) -> jnp.ndarray:
    n = len(params)
    for i in range(n):
        x = linear_apply(params[f"lin{i}"], x)
        if i < n - 1 or final_act:
            x = act(x)
    return x


# ----------------------------------------------------- masked BatchNorm


class BatchNormState(NamedTuple):
    """Non-trainable running statistics (torch BatchNorm1d buffers)."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # num_batches_tracked


def batchnorm_init(dim: int, dtype=jnp.float32) -> Tuple[Params, BatchNormState]:
    params = {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}
    state = BatchNormState(
        mean=jnp.zeros((dim,), dtype),
        var=jnp.ones((dim,), dtype),
        count=jnp.zeros((), jnp.int32),
    )
    return params, state


def batchnorm_apply(
    params: Params,
    state: BatchNormState,
    x: jnp.ndarray,        # [B, N, H] node features
    mask: jnp.ndarray,     # [B, N]
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, BatchNormState]:
    """BatchNorm1d over all *real* nodes in the batch.

    The reference normalizes over the concatenated node dimension
    (model/graph_met_network.py:32,39: BatchNorm1d on [sum_N, H]); with
    padding, statistics must exclude pad nodes or they'd be biased toward
    zero.  Matches torch semantics: biased variance for normalization,
    unbiased for the running buffer, momentum 0.1.
    Padded rows receive garbage values — every consumer masks.
    """
    if train:
        m = mask[..., None]
        n = jnp.maximum(jnp.sum(m), 1).astype(x.dtype)
        mean = jnp.sum(jnp.where(m, x, 0), axis=(0, 1)) / n
        diff = jnp.where(m, x - mean, 0)
        var = jnp.sum(diff * diff, axis=(0, 1)) / n              # biased
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = BatchNormState(
            mean=(1 - momentum) * state.mean + momentum * mean,
            var=(1 - momentum) * state.var + momentum * unbiased,
            count=state.count + 1,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * inv * params["gamma"] + params["beta"]
    return out, new_state
