"""Analysis artifact persistence — reference utils.py:32-57 contract.

``save``/``load`` round-trip arbitrary picklable objects through
lz4-frame + cloudpickle, byte-compatible with the reference's
``.resolutions`` files (written by evaluate.py:150-156, read by plt.py:17).
"""

from __future__ import annotations

import json
import pickle
from typing import Any, Dict

from deepmetv2_tpu.utils import lz4f

try:
    import cloudpickle as _pickler
except Exception:  # pragma: no cover
    _pickler = pickle


def load(filename: str) -> Any:
    """Load an lz4-frame cloudpickle artifact (reference utils.py:32-37)."""
    with open(filename, "rb") as fin:
        buf = fin.read()
    return pickle.loads(lz4f.decompress_frame(buf))


def save(obj: Any, filename: str) -> None:
    """Save any picklable object as lz4-frame cloudpickle
    (reference utils.py:40-46)."""
    payload = _pickler.dumps(obj)
    with open(filename, "wb") as fout:
        fout.write(lz4f.compress_frame(payload))


def save_dict_to_json(d: Dict[str, Any], json_path: str) -> None:
    """Save a dict of float-castable values (reference utils.py:48-57)."""
    with open(json_path, "w") as f:
        json.dump({k: float(v) for k, v in d.items()}, f, indent=4)
