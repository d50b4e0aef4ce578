"""Full per-stage accounting of the fused DRN train step (VERDICT r4 #2:
"publish a per-stage table for the full 25.35 ms step ... stages that sum
to the step").

Times every stage of train/step.make_drn_train_step at the exact shapes
the compiled step uses (round 1: N=2048, K=32, H=64; round 2 at the
compacted capacity N=1536), each as fwd(+bwd where the step
differentiates through it), via bench.py's slope method.  The ``sum`` row
is the arithmetic total; ``drn_train_step_ms`` is the measured step — the
difference is XLA fusion/scheduling overlap (expected NEGATIVE gap: the
step overlaps stages the standalone timings serialize).

Run on the real TPU:  python scripts/profile_drn_stages.py
"""

from __future__ import annotations

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _slope_time  # noqa: E402

from deepmetv2_tpu.config import Config, DRNConfig  # noqa: E402
from deepmetv2_tpu.data import collate, synthetic_events  # noqa: E402
from deepmetv2_tpu.models.drn import (  # noqa: E402
    _compact_nodes, _compact_size, drn_init)
from deepmetv2_tpu.nn.core import mlp_apply  # noqa: E402
from deepmetv2_tpu.ops.coarsen import global_max_pool, max_pool  # noqa: E402
from deepmetv2_tpu.ops.dyn_graph import (  # noqa: E402
    build_dyn_graph, cut_matching)
from deepmetv2_tpu.ops.pallas.edge_mlp import edge_mlp_conv  # noqa: E402
from deepmetv2_tpu.ops.segment import gather_neighbors  # noqa: E402
from deepmetv2_tpu.train.step import (  # noqa: E402
    init_train_state, make_drn_train_step, make_optimizer)

B, N, H, K_KNN = 8, 2048, 64, 16
KS = (3, 12)


def _fold(x, g):
    return x + 1e-12 * g


def _fwdbwd_body(fn, wrt="all"):
    """Chained fwd+bwd body for _slope_time: carry is the arg tuple; the
    gradient of sum(fn**2) w.r.t. each arg is folded back in."""

    def body(carry, _):
        args = carry if isinstance(carry, tuple) else (carry,)
        val, grads = jax.value_and_grad(
            lambda *a: jnp.sum(fn(*a) ** 2), argnums=tuple(range(len(args)))
        )(*args)
        new = tuple(jax.tree_util.tree_map(_fold, a, g)
                    for a, g in zip(args, grads))
        return (new if isinstance(carry, tuple) else new[0]), None

    return body


def _fwd_body(fn):
    def body(carry, _):
        args = carry if isinstance(carry, tuple) else (carry,)
        out = fn(*args)
        leaves = [jnp.sum(l.astype(jnp.float32))
                  for l in jax.tree_util.tree_leaves(out)]
        s = 1e-12 * sum(leaves)
        new = tuple(jax.tree_util.tree_map(lambda a: a + s.astype(a.dtype)
                                           if jnp.issubdtype(a.dtype, jnp.floating)
                                           else a, a_) for a_ in args)
        return (new if isinstance(carry, tuple) else new[0]), None

    return body


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stages", default=None,
                    help="comma list of stage names to run (default all); "
                         "names: input,graph,gather,conv_ng,conv_full,"
                         "match,pool,compact,head,opt,step")
    ap.add_argument("--rounds", default="r1,r2")
    ap.add_argument("--out", default=None,
                    help="append results as one JSON line to this file")
    args = ap.parse_args()
    only = set(args.stages.split(",")) if args.stages else None
    rounds = set(args.rounds.split(","))

    def want(name):
        return only is None or name in only

    from deepmetv2_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = Config(drn=DRNConfig(head="cartesian", output_scale=100.0))
    dc = cfg.drn
    K = dc.und_cap or 2 * dc.k          # 32: symmetrized degree cap
    N2 = _compact_size(N)               # 1536: round-2 compacted capacity
    rng = np.random.default_rng(0)

    params, bn = drn_init(jax.random.PRNGKey(0), dc)
    out = {}

    def record(name, ms):
        out[name] = round(ms, 4)
        print(f"{name}: {ms:.3f} ms", flush=True)

    def rand_h(n):
        h = jnp.asarray(rng.normal(size=(B, n, H)).astype(np.float32))
        nv = rng.integers(n - 128, n, size=B)
        m = jnp.asarray(np.arange(n)[None, :] < nv[:, None])
        return jnp.where(m[..., None], h, 0.0), m

    # ---- stage inputs at both rounds' shapes
    h1, m1 = rand_h(N)
    h2, m2 = rand_h(N2)

    # 0. input MLP (datanorm + inputnet) fwd+bwd
    x_in = jnp.asarray(rng.normal(size=(B, N, dc.input_dim)).astype(np.float32))

    def inputnet(x, p):
        return mlp_apply(p["inputnet"], p["datanorm"] * x, final_act=True)

    if want("input"):
        record("input_mlp_ms", _slope_time(
            _fwdbwd_body(lambda x: inputnet(x, params)), x_in,
            ks=KS, label="input_mlp") * 1e3)

    per_round = {}
    for tag, (h, m, n_cap) in (("r1", (h1, m1, N)), ("r2", (h2, m2, N2))):
        if tag not in rounds:
            continue
        r = {}
        # 1. fused graph build (discrete — fwd only in the step)
        g0 = jax.block_until_ready(build_dyn_graph(h, m, k=dc.k,
                                                   cap=dc.und_cap))

        def graph_body(carry, _):
            hh = carry
            g = build_dyn_graph(hh, m, k=dc.k, cap=dc.und_cap)
            return _fold(hh, jnp.mean(g.nbr.idx.astype(jnp.float32))), None

        if want("graph"):
            r["graph_ms"] = _slope_time(graph_body, h, ks=KS,
                                        label=f"graph_{tag}") * 1e3

        # 2. the XLA neighbor gather fwd + scatter-add adjoint
        if want("gather"):
            r["gather_ms"] = _slope_time(
                _fwdbwd_body(lambda v: jnp.where(
                    g0.nbr.mask[..., None], gather_neighbors(v, g0.nbr),
                    0.0)),
                h, ks=KS, label=f"gather_{tag}") * 1e3

        # 3. fused conv on a PRE-gathered xj (kernel cost excluding gather)
        xj0 = jax.block_until_ready(gather_neighbors(h, g0.nbr))
        bn_r = bn["convs"][0]
        cp = params["convs"][0]

        def conv_ng(x, xj, mlp_p):
            o, mean, var = edge_mlp_conv(
                x, xj, g0.nbr.mask, mlp_p, cp["bn"]["gamma"],
                cp["bn"]["beta"], bn_r.mean, bn_r.var, True, dc.aggr)
            return o + mean[None, None, :] + var[None, None, :]

        if want("conv_ng"):
            r["conv_nogather_ms"] = _slope_time(
                _fwdbwd_body(conv_ng), (h, xj0, cp["mlp"]),
                ks=KS, label=f"conv_ng_{tag}") * 1e3

        # 3b. conv INCLUDING the gather (what the step actually runs)
        def conv_full(x, mlp_p):
            xj = gather_neighbors(x, g0.nbr)
            o, mean, var = edge_mlp_conv(
                x, xj, g0.nbr.mask, mlp_p, cp["bn"]["gamma"],
                cp["bn"]["beta"], bn_r.mean, bn_r.var, True, dc.aggr)
            return o + mean[None, None, :] + var[None, None, :]

        if want("conv_full"):
            r["conv_with_gather_ms"] = _slope_time(
                _fwdbwd_body(conv_full), (h, cp["mlp"]),
                ks=KS, label=f"conv_full_{tag}") * 1e3

        # 4. dense cut matching (discrete — fwd only)
        def match_body(carry, _):
            hh = carry
            cl, pr = cut_matching(g0, hh, m)
            return _fold(hh, jnp.mean(cl.astype(jnp.float32))), None

        if want("match"):
            r["matching_ms"] = _slope_time(match_body, h, ks=KS,
                                           label=f"match_{tag}") * 1e3

        # 5. cluster-max pooling fwd+bwd (differentiated in the step)
        cl0, pr0 = jax.tree_util.tree_map(
            jax.block_until_ready, cut_matching(g0, h, m))

        def pool_fn(v):
            ph, _ = max_pool(v, cl0, pr0, m)
            return ph

        if want("pool"):
            r["pool_ms"] = _slope_time(_fwdbwd_body(pool_fn), h, ks=KS,
                                       label=f"pool_{tag}") * 1e3
        per_round[tag] = r

    # 6. inter-round compaction fwd+bwd (runs once, on round-1 output)
    if want("compact"):
        record("compact_ms", _slope_time(
            _fwdbwd_body(lambda v: _compact_nodes(v, m1)[0]), h1,
            ks=KS, label="compact") * 1e3)

    # 7. head: global max pool + output MLP + loss-ish reduction
    def head_fn(v):
        pooled = global_max_pool(v, m2)
        return mlp_apply(params["output"], pooled)

    if want("head"):
        record("head_ms", _slope_time(_fwdbwd_body(head_fn), h2,
                                      ks=KS, label="head") * 1e3)

    # 8. optimizer update (AdamW over the DRN params)
    opt = make_optimizer(cfg)
    opt_state0 = opt.init(params)
    grads0 = jax.tree_util.tree_map(lambda p: 0.01 * jnp.ones_like(p), params)

    def opt_body(carry, _):
        p, s = carry
        up, s2 = opt.update(grads0, s, p)
        import optax
        return (optax.apply_updates(p, up), s2), None

    if want("opt"):
        record("optimizer_ms", _slope_time(opt_body, (params, opt_state0),
                                           ks=KS, label="opt") * 1e3)

    for tag, r in per_round.items():
        for k, v in r.items():
            record(f"{tag}_{k}", v)

    # ---- the measured full step
    if want("step"):
        events = synthetic_events(B * 4, seed=1, n_min=N - 256, n_max=N - 1)
        batch = jax.device_put(collate(events[:B], buckets=(N,)))
        step = make_drn_train_step(cfg)
        state = init_train_state(params, bn, cfg)
        record("drn_train_step_ms", _slope_time(
            lambda s, _: (step(s, batch)[0], None), state, ks=KS,
            label="drn_step") * 1e3)

    try:
        stage_sum = (
            out["input_mlp_ms"] + out["compact_ms"] + out["head_ms"]
            + out["optimizer_ms"]
            + sum(out[f"{t}_{k}"] for t in ("r1", "r2")
                  for k in ("graph_ms", "conv_with_gather_ms",
                            "matching_ms", "pool_ms")))
        record("stage_sum_ms", stage_sum)
        out["unattributed_ms"] = round(
            out["drn_train_step_ms"] - stage_sum, 4)
    except KeyError:
        pass                       # partial run (--stages/--rounds subset)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
