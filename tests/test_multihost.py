"""Multi-process fake-cluster test (SURVEY.md §4: fake a pod slice with
multi-process CPU JAX + jax.distributed).

Spawns 2 worker processes, each with 2 virtual CPU devices and gloo
collectives, forming a global 4-device mesh across process boundaries;
runs two data-parallel train steps and checks every process computes the
identical loss — which also matches a single-process run on the same
global batch (replicated optimizer state stays consistent)."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_losses():
    """Reference: the same two steps on this process's own 4-device mesh."""
    from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
    from deepmetv2_tpu.data import collate, synthetic_events
    from deepmetv2_tpu.models import graph_met_init
    from deepmetv2_tpu.parallel.dp import make_dp_train_step
    from deepmetv2_tpu.parallel.mesh import make_mesh, shard_batch
    from deepmetv2_tpu.train.step import init_train_state

    events = synthetic_events(8, seed=7, n_min=32, n_max=127)
    batch = collate(events, buckets=(128,), pad_events_to=8)
    cfg = Config(graph=GraphConfig(max_neighbors=32),
                 data=DataConfig(batch_size=8, node_buckets=(128,)))
    mesh = make_mesh(n_data=4, n_node=1, devices=jax.devices()[:4])
    state = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
    with mesh:
        sb = shard_batch(batch, mesh)
        step = make_dp_train_step(cfg, mesh)
        state, l1 = step(state, sb)
        state, l2 = step(state, sb)
    return float(l1), float(l2)


def test_two_process_cluster_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(pid), "2", str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    losses = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MHLOSS")][0]
        _, pid, l1, l2, primary = line.split()
        losses[int(pid)] = (float(l1), float(l2))
        assert primary == (f"primary={pid == '0'}")

    assert losses[0] == losses[1], "processes disagree on the loss"

    ref1, ref2 = _single_process_losses()
    np.testing.assert_allclose(losses[0][0], ref1, rtol=1e-5)
    np.testing.assert_allclose(losses[0][1], ref2, rtol=1e-5)
