from deepmetv2_tpu.etl.common import delta_phi, delta_r, pad_particle_list  # noqa: F401
from deepmetv2_tpu.etl.dytt import process_chunk_dytt  # noqa: F401
from deepmetv2_tpu.etl.znunu import process_chunk_znunu  # noqa: F401
