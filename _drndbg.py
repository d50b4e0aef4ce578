import tests.conftest
import jax, jax.numpy as jnp, numpy as np
from deepmetv2_tpu.config import Config, DataConfig, GraphConfig
from deepmetv2_tpu.data import fetch_dataloader, synthetic_events
from deepmetv2_tpu.models.drn import drn_init, drn_net_apply
from deepmetv2_tpu.train.loss import drn_loss_fn
from deepmetv2_tpu.train.step import init_train_state, make_drn_train_step

cfg = Config(data=DataConfig(batch_size=8, node_buckets=(128,)))
events = synthetic_events(8, seed=0, n_min=30, n_max=100)
loaders = fetch_dataloader(events=events, batch_size=8, validation_split=0.0, buckets=(128,))
batch = next(iter(loaders["train"]))
params, bn = drn_init(jax.random.PRNGKey(0), cfg.drn)

def obj(p):
    pred, _ = drn_net_apply(p, bn, batch, train=True, cfg=cfg.drn)
    return drn_loss_fn(pred, batch)
loss, grads = jax.value_and_grad(obj)(params)
print("loss0:", float(loss))
for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
    name = jax.tree_util.keystr(path)
    print(f"{name:55s} |g|max={float(jnp.abs(leaf).max()):.3e}")
state = init_train_state(params, bn, cfg)
step = make_drn_train_step(cfg)
for i in range(200):
    state, l = step(state, batch)
    if i % 40 == 0: print(i, float(l))
print("final", float(l))
pred, _ = drn_net_apply(state.params, state.bn_state, batch, train=False, cfg=cfg.drn)
print("pred sample:", np.asarray(pred)[:3])
print("target sample:", np.asarray(batch.y)[:3, :2])
