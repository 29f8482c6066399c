"""Python face of the native threaded npy reader (_featio C++ extension).

Builds on demand (g++, CPython headers only) and returns numpy views over
the extension's zero-copy bytearray output.  Callers fall back to np.load
when the extension is unavailable or a file uses an unsupported layout
(object arrays, fortran order, non-float dtypes) — the extension marks
those with count -1.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

_MOD = None
_FAILED = False


def _ext():
    global _MOD, _FAILED
    if _MOD is None and not _FAILED:
        try:
            from vitxtgqa_tpu.native.build import build_featio

            build_featio()
            from vitxtgqa_tpu.native import _featio  # type: ignore

            _MOD = _featio
        except Exception:
            _FAILED = True
    return _MOD


def available() -> bool:
    return _ext() is not None


def read_padded_batch(
    paths: Sequence[str], max_rows: int, dim: int
) -> Optional[Tuple[np.ndarray, List[int]]]:
    """Parallel-read npy files into one [n, max_rows, dim] f32 block.

    Returns (block, counts) with counts[i] = rows copied (-1 on failure,
    rows zeroed) — or None when the native extension is unavailable.
    """
    ext = _ext()
    if ext is None:
        return None
    buf, counts = ext.read_padded_batch(list(paths), int(max_rows), int(dim))
    block = np.frombuffer(buf, np.float32).reshape(len(paths), max_rows, dim)
    return block, counts


def read_rows(paths: Sequence[str], dim: int
              ) -> Optional[Tuple[np.ndarray, List[int]]]:
    """First row of each npy -> [n, dim] f32 (per-frame ViT features)."""
    out = read_padded_batch(paths, 1, dim)
    if out is None:
        return None
    block, counts = out
    return block[:, 0, :], counts
