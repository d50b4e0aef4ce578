"""Loss functions — reference model/net.py:49-90, padded-batch form.

The reference's ``scatter_add(weights*px, batch)`` segment reduction
becomes a masked sum over the node axis: dense, fused by XLA into the
surrounding arithmetic (no scatter kernel at all).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from deepmetv2_tpu.data.batching import EventBatch
from deepmetv2_tpu.ops.segment import masked_sum


def weighted_met(weights: jnp.ndarray, batch: EventBatch) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-event weighted momentum sums  METx = Σ_i w_i·px_i,  METy = Σ_i w_i·py_i
    (reference model/net.py:55-56; note the sign convention — the *negative*
    of this sum is the MET estimate, applied downstream)."""
    px = batch.x_cont[..., 0]
    py = batch.x_cont[..., 1]
    metx = masked_sum(weights * px, batch.mask, axis=1)
    mety = masked_sum(weights * py, batch.mask, axis=1)
    return metx, mety


def loss_fn(weights: jnp.ndarray, batch: EventBatch) -> jnp.ndarray:
    """0.5 · mean_B[ (METx + genMETx)² + (METy + genMETy)² ]
    (reference model/net.py:49-62; truth[:,0:2] holds genMET px/py).

    The mean runs over *real* events only (events padded into a batch to
    keep shapes static have num_valid == 0 and are excluded), so a padded
    final batch produces the same value the reference gets on its ragged
    final batch."""
    metx, mety = weighted_met(weights, batch)
    true_px = batch.y[:, 0]
    true_py = batch.y[:, 1]
    per_event = (metx + true_px) ** 2 + (mety + true_py) ** 2
    ev = batch.num_valid > 0
    total = jnp.sum(jnp.where(ev, per_event, 0.0))
    return 0.5 * total / jnp.maximum(jnp.sum(ev), 1)


def drn_met_vector(pred: jnp.ndarray, head: str = "polar") -> jnp.ndarray:
    """Head output → cartesian MET estimate [B, 2].  'polar' converts the
    (MET, phi) head (reference model/net.py:33-35: softplus magnitude, phi
    in (−π, π)); 'cartesian' passes (METx, METy) through."""
    if head == "cartesian":
        return pred[:, 0:2]
    met, metphi = pred[:, 0], pred[:, 1]
    return jnp.stack([met * jnp.cos(metphi), met * jnp.sin(metphi)], axis=1)


def drn_loss_fn(pred: jnp.ndarray, batch: EventBatch,
                head: str = "polar") -> jnp.ndarray:
    """Vector MET regression for the DRN head: 0.5 · mean_B ‖v_pred − genMET‖².

    The reference keeps the DRN ``Net`` commented out with no loss wired
    (model/net.py:12-37); this is the regression its (MET, phi) head
    implies, with the same 0.5·MSE convention as ``loss_fn``
    (model/net.py:49-62) and the same real-event masking."""
    v = drn_met_vector(pred, head)
    per_event = (v[:, 0] - batch.y[:, 0]) ** 2 + (v[:, 1] - batch.y[:, 1]) ** 2
    ev = batch.num_valid > 0
    total = jnp.sum(jnp.where(ev, per_event, 0.0))
    return 0.5 * total / jnp.maximum(jnp.sum(ev), 1)


def u_perp_par_loss(weights: jnp.ndarray, batch: EventBatch) -> jnp.ndarray:
    """Alternative recoil-decomposition loss (reference model/net.py:71-90;
    present but unused by the reference training loop — kept for parity)."""
    qtx = batch.y[:, 0]
    qty = batch.y[:, 0]  # sic — the reference uses truth[:,0] for BOTH
    v_qt = jnp.stack([qtx, qty], axis=1)

    metx, mety = weighted_met(weights, batch)
    vec = jnp.stack([-metx, -mety], axis=1)

    dot = jnp.einsum("bi,bi->b", vec, v_qt)
    qt2 = jnp.einsum("bi,bi->b", v_qt, v_qt)
    response = dot / qt2
    v_par = response[:, None] * v_qt
    u_par = jnp.sqrt(jnp.einsum("bi,bi->b", v_par, v_par)) - jnp.sqrt(qt2)
    v_perp = vec - v_par
    u_perp = jnp.sqrt(jnp.einsum("bi,bi->b", v_perp, v_perp))
    return 0.5 * jnp.mean(u_par**2 + u_perp**2)
