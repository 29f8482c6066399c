"""Run logging: timestamped file + stdout + JSONL scalar stream.

(reference: pythia/utils/logger.py:15-141.)  tensorboardX is replaced by a
plain JSONL scalar log (save_dir/scalars.jsonl) that any dashboard can
tail; TensorBoard is attached opportunistically if the package exists.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


class Logger:
    def __init__(self, save_dir: str = "./save", name: str = "vitxtgqa_tpu",
                 level: str = "info", should_log: bool = True):
        self.save_dir = save_dir
        self.should_log = should_log
        os.makedirs(save_dir, exist_ok=True)
        timestamp = time.strftime("%Y-%m-%dT%H:%M:%S")
        self.log_file = os.path.join(save_dir, f"{name}_{timestamp}.log")
        self.scalar_file = os.path.join(save_dir, "scalars.jsonl")

        self._logger = logging.getLogger(name)
        self._logger.setLevel(getattr(logging, level.upper(), logging.INFO))
        self._logger.handlers.clear()
        self._logger.propagate = False
        fmt = logging.Formatter("%(asctime)s %(levelname)s: %(message)s")
        if should_log:
            fh = logging.FileHandler(self.log_file)
            fh.setFormatter(fmt)
            self._logger.addHandler(fh)
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        self._logger.addHandler(sh)

        self._tb = None
        if should_log:
            try:  # optional tensorboard
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(save_dir, "tb"))
            except Exception:
                self._tb = None

    def write(self, message: Any, level: str = "info"):
        getattr(self._logger, level, self._logger.info)(str(message))

    def single_write(self, message: Any, level: str = "info"):
        self.write(message, level)

    def add_scalars(self, scalars: Dict[str, float], step: int):
        if not self.should_log:
            return
        record = {"step": int(step), **{k: float(v) for k, v in scalars.items()}}
        with open(self.scalar_file, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)

    def add_histograms_for_params(self, params: Any, step: int):
        """Per-parameter histograms (reference: logger.py:133-141
        add_histogram_for_model).  `params` is a flax param pytree; names
        are the /-joined tree paths.  TensorBoard gets real histograms when
        attached; the JSONL stream always records a compact 10-bin summary
        per parameter so the channel exists without tensorboard too."""
        if not self.should_log:
            return
        import numpy as np

        flat: Dict[str, Any] = {}

        def walk(node, prefix=""):
            if isinstance(node, dict) or hasattr(node, "items"):
                for k, v in node.items():
                    walk(v, f"{prefix}/{k}" if prefix else k)
            else:
                flat[prefix] = np.asarray(node)

        walk(params)
        hist_file = os.path.join(self.save_dir, "histograms.jsonl")
        with open(hist_file, "a") as f:
            for name, arr in flat.items():
                counts, edges = np.histogram(
                    arr.astype("float32").ravel(), bins=10
                )
                f.write(json.dumps({
                    "step": int(step), "param": name,
                    "mean": float(arr.mean()), "std": float(arr.std()),
                    "counts": counts.tolist(),
                    "edges": [float(e) for e in edges],
                }) + "\n")
        if self._tb is not None:
            for name, arr in flat.items():
                self._tb.add_histogram(name, arr, step)
