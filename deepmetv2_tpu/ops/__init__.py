from deepmetv2_tpu.ops.graph import (  # noqa: F401
    knn_graph,
    radius_graph,
    to_undirected,
)
from deepmetv2_tpu.ops.segment import (  # noqa: F401
    masked_max,
    masked_mean,
    masked_softmax,
    masked_sum,
    neighbor_reduce,
)
from deepmetv2_tpu.ops.edgeconv import edgeconv_linear, edgeconv_mlp  # noqa: F401
