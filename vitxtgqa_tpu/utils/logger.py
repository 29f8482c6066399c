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
