"""Fused Pallas DRN edge-MLP conv (ops/pallas/edge_mlp.py) vs the XLA
formulation (models/drn._drn_edgeconv XLA branch) — values, BN state, and
gradients, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmetv2_tpu.data.batching import Neighborhood
from deepmetv2_tpu.models.drn import _drn_edgeconv
from deepmetv2_tpu.nn.core import BatchNormState, batchnorm_init, mlp_init


def _setup(B=2, N=32, K=8, H=16, seed=0, empty_row=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, N, K)).astype(np.int32))
    mask = jnp.asarray(rng.random((B, N, K)) < 0.7)
    # no self loops, and at least one fully-empty neighborhood
    iota = jnp.arange(N)[None, :, None]
    mask = mask & (idx != iota)
    if empty_row:
        mask = mask.at[:, 3].set(False)
    nbr = Neighborhood(idx=jnp.where(mask, idx, 0), mask=mask)
    key = jax.random.PRNGKey(seed)
    mlp = mlp_init(key, (2 * H, 3 * H // 2, H))
    bn_p, bn_s = batchnorm_init(H)
    # non-trivial BN params incl. a NEGATIVE gamma channel (exercises the
    # coef<0 -> min branch of the commuted max aggregation)
    bn_p = {
        "gamma": bn_p["gamma"].at[0].set(-0.7).at[1].set(1.3),
        "beta": bn_p["beta"] + 0.1,
    }
    bn_s = BatchNormState(mean=bn_s.mean + 0.05,
                          var=bn_s.var * 1.5, count=bn_s.count)
    conv = {"mlp": mlp, "bn": bn_p}
    return conv, bn_s, x, nbr


@pytest.mark.parametrize("aggr", ["add", "max", "mean"])
@pytest.mark.parametrize("train", [True, False])
def test_fused_matches_xla(aggr, train):
    conv, bn_s, x, nbr = _setup()
    out_x, st_x = _drn_edgeconv(conv, bn_s, x, nbr, aggr, train,
                                conv_force="xla")
    out_f, st_f = _drn_edgeconv(conv, bn_s, x, nbr, aggr, train,
                                conv_force="fused", conv_interpret=True)
    np.testing.assert_allclose(out_f, out_x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(st_f.mean, st_x.mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(st_f.var, st_x.var, rtol=1e-4, atol=1e-6)
    assert int(st_f.count) == int(st_x.count)
    # empty neighborhoods give exactly 0
    assert np.all(np.asarray(out_f[:, 3]) == 0.0)


@pytest.mark.parametrize("aggr", ["add", "max"])
def test_fused_grads_match_xla(aggr):
    conv, bn_s, x, nbr = _setup(seed=3)

    def loss(conv_p, xx, force):
        out, _ = _drn_edgeconv(conv_p, bn_s, xx, nbr, aggr, True,
                               conv_force=force,
                               conv_interpret=(force == "fused"))
        # nonuniform weighting so max-ties/argmax routing is exercised
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * jnp.sin(w))

    from jax.flatten_util import ravel_pytree

    gx = jax.grad(loss, argnums=(0, 1))(conv, x, "xla")
    gf = jax.grad(loss, argnums=(0, 1))(conv, x, "fused")
    flat_x, _ = ravel_pytree(gx)
    flat_f, _ = ravel_pytree(gf)
    scale = jnp.maximum(jnp.max(jnp.abs(flat_x)), 1e-6)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_x),
                               rtol=5e-4, atol=float(scale) * 1e-5)


def test_unsupported_shapes_fall_back():
    # N=30 has no multiple-of-8 tile divisor -> must run the XLA branch
    conv, bn_s, x, nbr = _setup(N=30, empty_row=False)
    out, _ = _drn_edgeconv(conv, bn_s, x, nbr, "add", True,
                           conv_force=None, conv_interpret=True)
    out_x, _ = _drn_edgeconv(conv, bn_s, x, nbr, "add", True,
                             conv_force="xla")
    np.testing.assert_allclose(out, out_x, rtol=1e-6)


def test_drn_apply_fused_conv_matches():
    """End-to-end drn_apply: fused conv vs XLA conv (graph build pinned
    composed so only the conv differs)."""
    from deepmetv2_tpu.config import DRNConfig
    from deepmetv2_tpu.models.drn import drn_apply, drn_init

    cfg = DRNConfig(input_dim=4, hidden_dim=16, k=4, pool_rounds=2)
    rng = np.random.default_rng(7)
    B, N = 2, 32
    x = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) < 0.9)
    params, state = drn_init(jax.random.PRNGKey(1), cfg)
    out_x, st_x = drn_apply(params, state, x, mask, True, cfg,
                            graph_force="composed", conv_force="xla")
    out_f, st_f = drn_apply(params, state, x, mask, True, cfg,
                            graph_force="composed", conv_force="fused",
                            conv_interpret=True)
    np.testing.assert_allclose(out_f, out_x, rtol=5e-4, atol=1e-5)
    for a, b in zip(st_f["convs"], st_x["convs"]):
        np.testing.assert_allclose(a.mean, b.mean, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(a.var, b.var, rtol=1e-3, atol=1e-5)


def test_compact_pool_matches_uncompacted():
    """Inter-round node compaction (DRNConfig.compact_pool) is exact up
    to float re-association: same graphs/matchings on relabeled indices.

    N must be >= 512: ``_compact_size(N) < N`` first holds there (at
    N=256 the capacity equals N and ``_compact_nodes`` returns early, so
    a smaller test never executes the gather/truncation path — r4
    advisor finding)."""
    from deepmetv2_tpu.config import DRNConfig
    from deepmetv2_tpu.models.drn import _compact_size, drn_apply, drn_init

    rng = np.random.default_rng(11)
    B, N = 2, 512
    assert _compact_size(N) < N      # the compaction path actually runs
    x = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) < 0.9)
    base = dict(input_dim=4, hidden_dim=16, k=4, pool_rounds=2)
    params, state = drn_init(jax.random.PRNGKey(1),
                             DRNConfig(**base))
    outs = {}
    diag = {}
    for compact in (False, True):
        cfg = DRNConfig(**base, compact_pool=compact)
        outs[compact], _ = drn_apply(params, state, x, mask, True, cfg,
                                     graph_force="composed",
                                     conv_force="xla",
                                     diag=diag if compact else None)
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4,
                               atol=1e-5)
    # overflow diagnostic recorded, and no representatives were dropped
    assert [int(d) for d in diag["compact_dropped"]] == [0]


def test_compact_nodes_overflow_truncates_deterministically():
    """When survivors exceed the 3N/4 capacity, _compact_nodes keeps the
    lowest-index representatives and compact_dropped reports exactly the
    would-be-dropped count (r4 advisor finding: silent truncation)."""
    from deepmetv2_tpu.models.drn import (_compact_nodes, _compact_size,
                                          compact_dropped)

    N = 512
    ncomp = _compact_size(N)          # 384
    assert ncomp < N
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(size=(1, N, 4)).astype(np.float32))
    # 500 survivors > 384 slots: 116 must be dropped
    mask = np.zeros((1, N), dtype=bool)
    keep = np.sort(rng.choice(N, size=500, replace=False))
    mask[0, keep] = True
    mask = jnp.asarray(mask)

    assert int(compact_dropped(mask)) == 500 - ncomp
    hc, mc = _compact_nodes(h, mask)
    assert hc.shape[1] == ncomp and bool(jnp.all(mc))
    # lowest-index survivors, in order
    np.testing.assert_array_equal(np.asarray(hc[0]),
                                  np.asarray(h[0, keep[:ncomp]]))
