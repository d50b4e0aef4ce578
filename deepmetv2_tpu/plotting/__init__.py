from deepmetv2_tpu.plotting.resolution import plot_resolutions  # noqa: F401
from deepmetv2_tpu.plotting.weights import compute_weight_summary, plot_weight_summary  # noqa: F401
