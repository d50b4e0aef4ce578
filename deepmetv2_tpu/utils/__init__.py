from deepmetv2_tpu.utils.logging import RunningAverage  # noqa: F401
from deepmetv2_tpu.utils.artifacts import load, save, save_dict_to_json  # noqa: F401
