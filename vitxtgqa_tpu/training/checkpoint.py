"""Checkpointing: params/opt_state/step with config + git provenance.

(reference: pythia/utils/checkpoint.py:15-251 — periodic model_<it>.ckpt,
metric-keyed best.ckpt, final model, git branch/commit/diff metadata for
reproduction, resume with optimizer state.)

Orbax handles the pytree serialisation; run metadata (frozen config, git
fields, best-metric bookkeeping) rides alongside as JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _git_metadata(repo_dir: Optional[str] = None) -> Dict[str, str]:
    """Best-effort VCS provenance (reference: checkpoint.py:184-204)."""
    def run(*args):
        try:
            return subprocess.run(
                ["git", *args], capture_output=True, text=True, cwd=repo_dir,
                timeout=10,
            ).stdout.strip()
        except Exception:
            return ""

    return {
        "git/branch": run("rev-parse", "--abbrev-ref", "HEAD"),
        "git/commit_hash": run("rev-parse", "HEAD"),
        "git/commit_author": run("log", "-1", "--format=%an"),
        "git/commit_message": run("log", "-1", "--format=%s"),
        "git/diff": run("diff", "--no-prefix"),
    }


class Checkpoint:
    """Save/restore training state under save_dir/ckpt/.

    Layout:
      ckpt/models/model_<it>/   periodic snapshots
      ckpt/best/                best monitored-metric snapshot
      ckpt/final/               end-of-training snapshot
      ckpt/*/meta.json          config + git + best-iteration metadata
    """

    def __init__(self, save_dir: str, config: Any = None,
                 repo_dir: Optional[str] = None, async_save: bool = True):
        """async_save: snapshots write in a background thread (orbax
        AsyncCheckpointer) so the train loop never blocks on serialisation;
        `wait()` fences (called automatically before reusing a path and at
        finalize).  Config: training_parameters.tpu.async_checkpoint."""
        self.root = os.path.join(save_dir, "ckpt")
        os.makedirs(os.path.join(self.root, "models"), exist_ok=True)
        self.config = config
        self.repo_dir = repo_dir
        self.async_save = async_save
        if async_save:
            self.ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self.ckptr = ocp.PyTreeCheckpointer()

    def wait(self):
        """Block until any in-flight async save has committed."""
        if self.async_save:
            self.ckptr.wait_until_finished()

    # -- paths -------------------------------------------------------------
    def _model_path(self, iteration: int) -> str:
        return os.path.join(self.root, "models", f"model_{iteration}")

    @property
    def best_path(self) -> str:
        return os.path.join(self.root, "best")

    @property
    def final_path(self) -> str:
        return os.path.join(self.root, "final")

    # -- save --------------------------------------------------------------
    def _write_meta(self, path: str, iteration: int, best_iteration: int,
                    best_metric_value: Optional[float], epoch: int = 0):
        meta = {
            "iteration": iteration,
            "epoch": epoch,
            "best_iteration": best_iteration,
            "best_metric_value": best_metric_value,
            **_git_metadata(self.repo_dir),
        }
        if self.config is not None:
            try:
                meta["config"] = self.config.to_dict()
            except Exception:
                pass
        # sibling file, not inside the snapshot dir: async orbax creates the
        # directory only when the background write commits
        with open(path.rstrip("/") + ".meta.json", "w") as f:
            json.dump(meta, f, indent=1, default=str)

    def _save_tree(self, path: str, state: Dict[str, Any]):
        path = os.path.abspath(path)
        self.wait()  # fence before mutating a path a previous save may hold
        if os.path.exists(path):
            shutil.rmtree(path)
        self.ckptr.save(path, state)

    def save(self, state: Dict[str, Any], iteration: int,
             update_best: bool = False, best_iteration: int = 0,
             best_metric_value: Optional[float] = None, epoch: int = 0):
        """state: {"params": ..., "opt_state": ...}; step metadata
        (iteration + epoch, reference checkpoint.py:131-136) goes to
        meta.json."""
        path = self._model_path(iteration)
        self._save_tree(path, state)
        self._write_meta(path, iteration, best_iteration, best_metric_value,
                         epoch)
        if update_best:
            self._save_tree(self.best_path, state)
            self._write_meta(self.best_path, iteration, best_iteration,
                             best_metric_value, epoch)

    def finalize(self, state: Dict[str, Any], iteration: int, epoch: int = 0):
        self._save_tree(self.final_path, state)
        self._write_meta(self.final_path, iteration, iteration, None, epoch)
        self.wait()

    # -- restore -----------------------------------------------------------
    def load(self, path: Optional[str] = None,
             template: Optional[Dict[str, Any]] = None,
             shardings: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Load a checkpoint dir (defaults to best/); `template` restores
        exact array dtypes/structs.

        `shardings` (a pytree of jax.sharding.Sharding matching `template`,
        e.g. from parallel.mesh.param_shardings) makes orbax place each
        array's shards directly on its mesh devices — every host reads only
        its own slice, the multi-host/multi-chip restore path."""
        path = os.path.abspath(path or self.best_path)
        self.wait()
        if template is not None:
            if shardings is not None:
                restore_args = jax.tree_util.tree_map(
                    lambda x, s: ocp.ArrayRestoreArgs(
                        dtype=getattr(x, "dtype", None), sharding=s,
                    ),
                    template, shardings,
                )
            else:
                restore_args = jax.tree_util.tree_map(
                    lambda x: ocp.ArrayRestoreArgs(
                        dtype=getattr(x, "dtype", None)
                    ),
                    template,
                )
            return self.ckptr.restore(path, item=template, restore_args=restore_args)
        return self.ckptr.restore(path)

    def load_meta(self, path: Optional[str] = None) -> Dict[str, Any]:
        path = (path or self.best_path).rstrip("/")
        sibling = path + ".meta.json"
        legacy = os.path.join(path, "meta.json")
        with open(sibling if os.path.exists(sibling) else legacy) as f:
            return json.load(f)

    def latest_iteration(self) -> Optional[int]:
        mdir = os.path.join(self.root, "models")
        its = [
            int(d.split("_")[1])
            for d in os.listdir(mdir)
            if d.startswith("model_") and not d.endswith(".meta.json")
        ]
        return max(its) if its else None
