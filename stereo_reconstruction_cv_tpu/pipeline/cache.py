"""Per-stage artifact caching (checkpoint/resume, SURVEY §5).

The reference persists stage outputs ad hoc (rectified JPGs, corner
annotations, PLY) and "checkpoints" via in-memory cross-tab attributes
(gui.py:362-365). Here every stage can persist its arrays as one npz keyed
by stage name + input fingerprint, so any stage restarts from cache.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict

import numpy as np


class StageCache:
    def __init__(self, root: str = ".stereo_tpu_cache"):
        self.root = root

    def _path(self, stage: str, key: Dict[str, Any]) -> str:
        blob = json.dumps(key, sort_keys=True, default=str).encode()
        h = hashlib.sha1(blob).hexdigest()[:16]
        return os.path.join(self.root, f"{stage}-{h}.npz")

    def load(self, stage: str, key: Dict[str, Any]):
        p = self._path(stage, key)
        if not os.path.exists(p):
            return None
        with np.load(p, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    def save(self, stage: str, key: Dict[str, Any], arrays: Dict[str, np.ndarray]) -> str:
        os.makedirs(self.root, exist_ok=True)
        p = self._path(stage, key)
        np.savez_compressed(p, **{k: np.asarray(v) for k, v in arrays.items()})
        return p


def file_fingerprint(path: str) -> Dict[str, Any]:
    st = os.stat(path)
    return {"path": os.path.abspath(path), "size": st.st_size, "mtime": int(st.st_mtime)}
