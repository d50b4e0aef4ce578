from deepmetv2_tpu.nn.core import (  # noqa: F401
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
