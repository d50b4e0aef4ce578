from deepmetv2_tpu.train.loss import loss_fn, u_perp_par_loss  # noqa: F401
from deepmetv2_tpu.train.metrics import resolution  # noqa: F401
