"""Arbitrary-object <-> uint8-array transport.

(reference: pythia/utils/objects_to_byte_tensor.py:12-43 — pickled objects
ride inside fixed-size uint8 tensors so they survive tensor-only collate
and all_gather.)  Single-host pipelines in this framework keep strings on
the host side, so this is only used by multihost gathers
(parallel/collectives.gather_objects).
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np


def enc_obj2bytes(obj: Any, max_size: int = 4096) -> np.ndarray:
    """Object -> fixed-size uint8 array: [len_hi, len_lo-ish 4-byte header,
    payload, zero pad]."""
    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    n = len(payload)
    if n + 4 > max_size:
        raise ValueError(f"object needs {n + 4} bytes > max_size {max_size}")
    out = np.zeros(max_size, dtype=np.uint8)
    out[:4] = np.frombuffer(np.uint32(n).tobytes(), dtype=np.uint8)
    out[4 : 4 + n] = np.frombuffer(payload, dtype=np.uint8)
    return out


def dec_bytes2obj(arr) -> Any:
    arr = np.asarray(arr, dtype=np.uint8)
    n = int(np.frombuffer(arr[:4].tobytes(), dtype=np.uint32)[0])
    return pickle.loads(arr[4 : 4 + n].tobytes())
