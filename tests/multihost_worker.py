"""Worker process for the multi-process fake-cluster test.

Launched by tests/test_multihost.py as
``python tests/multihost_worker.py <pid> <nprocs> <port>``.

Runs ONE data-parallel train step over a 2-process x 2-virtual-CPU-device
cluster (global mesh of 4) and prints the loss; the parent asserts both
processes print the identical loss, which also matches the single-process
value on the same global batch.
"""

import sys

from deepmetv2_tpu.parallel import multihost

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
multihost.initialize(coordinator=f"localhost:{port}", num_processes=nprocs,
                     process_id=pid, cpu_devices_per_process=2)

import jax  # noqa: E402

from deepmetv2_tpu.config import Config, DataConfig, GraphConfig  # noqa: E402
from deepmetv2_tpu.data import collate, synthetic_events  # noqa: E402
from deepmetv2_tpu.models import graph_met_init  # noqa: E402
from deepmetv2_tpu.parallel.dp import make_dp_train_step  # noqa: E402
from deepmetv2_tpu.parallel.mesh import make_mesh  # noqa: E402
from deepmetv2_tpu.train.step import init_train_state  # noqa: E402

N_GLOBAL, NMAX = 8, 128
assert jax.process_count() == nprocs
n_dev = len(jax.devices())

# Deterministic global dataset; every process slices out its own rows.
events = synthetic_events(N_GLOBAL, seed=7, n_min=32, n_max=NMAX - 1)
batch = collate(events, buckets=(NMAX,), pad_events_to=N_GLOBAL)
b_local = N_GLOBAL // nprocs
local = jax.tree_util.tree_map(
    lambda x: x[pid * b_local:(pid + 1) * b_local], batch)

cfg = Config(graph=GraphConfig(max_neighbors=32),
             data=DataConfig(batch_size=N_GLOBAL, node_buckets=(NMAX,)))
mesh = make_mesh(n_data=n_dev, n_node=1)
state = init_train_state(*graph_met_init(jax.random.PRNGKey(0)), cfg)
with mesh:
    gbatch = multihost.local_batch_to_global(local, mesh)
    step = make_dp_train_step(cfg, mesh)
    state, loss = step(state, gbatch)
    # a second step proves optimizer state stays replicated-consistent
    state, loss2 = step(state, gbatch)

print(f"MHLOSS {pid} {float(loss):.10f} {float(loss2):.10f} "
      f"primary={multihost.is_primary()}", flush=True)
