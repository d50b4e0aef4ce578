from deepmetv2_tpu.data.batching import (  # noqa: F401
    EventBatch,
    Neighborhood,
    bucket_for,
    collate,
)
from deepmetv2_tpu.data.ingest import event_from_raw, load_npz_events  # noqa: F401
from deepmetv2_tpu.data.synthetic import synthetic_events  # noqa: F401
from deepmetv2_tpu.data.loader import METDataset, fetch_dataloader  # noqa: F401
