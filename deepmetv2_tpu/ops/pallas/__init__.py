from deepmetv2_tpu.ops.pallas.edgeconv_window import (  # noqa: F401
    window_edgeconv_linear_pallas,
    window_max,
)
