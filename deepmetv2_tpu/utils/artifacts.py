"""Analysis artifact persistence — reference utils.py:32-57 contract.

``save``/``load`` round-trip arbitrary picklable objects through
lz4-frame + cloudpickle, byte-compatible with the reference's
``.resolutions`` files (written by evaluate.py:150-156, read by plt.py:17).
"""

from __future__ import annotations

import io
import json
import pickle
from typing import Any, Dict

from deepmetv2_tpu.utils import lz4f

try:
    import cloudpickle as _pickler
except Exception:  # pragma: no cover
    _pickler = pickle


class _NumpyCompatUnpickler(pickle.Unpickler):
    """Unpickler that remaps legacy numpy module paths.

    The reference's committed ``.resolutions`` artifacts are numpy-1.x
    pickles whose global references point at ``numpy.core.*``; numpy >= 2
    moved those modules to ``numpy._core.*`` and keeps ``numpy.core`` only
    as a DeprecationWarning-emitting alias slated for removal.  Resolving
    the new path directly keeps the parity artifacts loadable on any
    numpy (r4 advisor/judge housekeeping item)."""

    def find_class(self, module: str, name: str):
        if module == "numpy.core" or module.startswith("numpy.core."):
            try:
                new = "numpy._core" + module[len("numpy.core"):]
                __import__(new)
                module = new
            except ImportError:      # numpy 1.x: keep the original path
                pass
        return super().find_class(module, name)


def load(filename: str) -> Any:
    """Load an lz4-frame cloudpickle artifact (reference utils.py:32-37)."""
    with open(filename, "rb") as fin:
        buf = fin.read()
    return _NumpyCompatUnpickler(
        io.BytesIO(lz4f.decompress_frame(buf))).load()


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
