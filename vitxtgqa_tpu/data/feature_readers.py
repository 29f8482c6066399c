"""Feature stores: padded npy readers with caching.

(reference: pythia/datasets/features_dataset.py:12-125 and
feature_readers.py:8-165 — FeaturesDataset with threaded fast-read,
PaddedFasterRCNNFeatureReader.)  This framework's per-frame ViT features go
through VideoFeatureReader; PaddedFeatureReader covers the generic
FRCNN-style [N, D] -> fixed [max_loc, D] case.
"""

from __future__ import annotations

import glob
import os
from collections import OrderedDict
from typing import Any, Dict, Optional, Tuple

import numpy as np


class _LRU:
    def __init__(self, capacity: int):
        self.capacity = capacity
        self.store: "OrderedDict[str, Any]" = OrderedDict()

    def get(self, key):
        if key in self.store:
            self.store.move_to_end(key)
            return self.store[key]
        return None

    def put(self, key, value):
        if self.capacity <= 0:
            return
        self.store[key] = value
        self.store.move_to_end(key)
        while len(self.store) > self.capacity:
            self.store.popitem(last=False)


class PaddedFeatureReader:
    """<dir>/<id>.npy [N, D] -> (padded [max_loc, D], n_valid)
    (reference: feature_readers.py:103-142)."""

    def __init__(self, base_dir: str, max_loc: int = 100, cache_size: int = 256):
        self.base_dir = base_dir
        self.max_loc = max_loc
        self.cache = _LRU(cache_size)

    def read(self, item_id: str) -> Tuple[np.ndarray, int]:
        cached = self.cache.get(item_id)
        if cached is not None:
            return cached
        path = os.path.join(self.base_dir, f"{item_id}.npy")
        feat = np.load(path, allow_pickle=True)
        if feat.ndim == 1:
            feat = feat[None, :]
        n = min(len(feat), self.max_loc)
        out = np.zeros((self.max_loc, feat.shape[-1]), np.float32)
        out[:n] = feat[:n]
        result = (out, n)
        self.cache.put(item_id, result)
        return result

    def read_batch(self, item_ids, feat_dim: int):
        """Threaded batch read via the native _featio extension: one call
        for the whole batch -> ([n, max_loc, feat_dim] f32, counts).  Falls
        back to sequential `read` when the extension is unavailable."""
        from vitxtgqa_tpu.native import featio

        paths = [os.path.join(self.base_dir, f"{i}.npy") for i in item_ids]
        native = featio.read_padded_batch(paths, self.max_loc, feat_dim)
        if native is not None:
            block, counts = native
            if all(c >= 0 for c in counts):
                return block, list(counts)
        outs, counts = [], []
        for item_id in item_ids:
            feat, n = self.read(item_id)
            out = np.zeros((self.max_loc, feat_dim), np.float32)
            cols = min(feat.shape[-1], feat_dim)
            out[:, :cols] = feat[:, :cols]
            outs.append(out)
            counts.append(n)
        return np.stack(outs), counts


class VideoFeatureReader:
    """<dir>/<video>/<frame>.npy [1, D] per-frame features with an LRU of
    whole videos (replaces the per-frame np.load loop in the reference
    dataset, vtextgqa/dataset.py:268-282)."""

    def __init__(self, base_dir: str, feat_dim: int = 1024, cache_size: int = 64):
        self.base_dir = base_dir
        self.feat_dim = feat_dim
        self.cache = _LRU(cache_size)

    def frame_count(self, video_id: str) -> int:
        vdir = os.path.join(self.base_dir, video_id)
        return len(glob.glob(os.path.join(vdir, "*.npy")))

    def _load_video(self, video_id: str) -> Dict[int, np.ndarray]:
        cached = self.cache.get(video_id)
        if cached is not None:
            return cached
        vdir = os.path.join(self.base_dir, video_id)
        paths = glob.glob(os.path.join(vdir, "*.npy"))
        fids = [int(os.path.splitext(os.path.basename(p))[0]) for p in paths]
        feats: Dict[int, np.ndarray] = {}

        # native threaded reader (C++ _featio): one call for the whole video
        # instead of len(paths) sequential np.loads
        from vitxtgqa_tpu.native import featio

        native = featio.read_rows(paths, self.feat_dim) if paths else None
        if native is not None:
            block, counts = native
            for i, fid in enumerate(fids):
                if counts[i] >= 0:
                    feats[fid] = block[i].copy()
                else:  # unsupported layout: python fallback
                    feats[fid] = np.load(
                        paths[i], allow_pickle=True
                    ).astype(np.float32)
        else:
            for fid, path in zip(fids, paths):
                feats[fid] = np.load(path, allow_pickle=True).astype(np.float32)
        self.cache.put(video_id, feats)
        return feats

    def read_frames(self, video_id: str, frame_ids, pad_to: Optional[int] = None
                    ) -> np.ndarray:
        feats = self._load_video(video_id)
        rows = [
            feats.get(int(f), np.zeros((1, self.feat_dim), np.float32)).reshape(-1)[
                : self.feat_dim
            ]
            for f in frame_ids
        ]
        out = np.stack(rows) if rows else np.zeros((0, self.feat_dim), np.float32)
        if pad_to is not None and len(out) < pad_to:
            out = np.concatenate(
                [out, np.zeros((pad_to - len(out), self.feat_dim), np.float32)]
            )
        return out
