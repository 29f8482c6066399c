"""Image feature encoders (reference: pythia/modules/encoders.py:12-60).

The reference `ImageEncoder` dispatches on a config type string:

* ``default`` — an Identity wrapper (encoders.py:16-19): features pass
  through untouched, ``out_dim == in_dim``.
* ``finetune_faster_rcnn_fpn_fc7`` — a Linear(+ReLU) layer whose weight
  and bias are *initialised* from pickled numpy arrays shipped with the
  detectron feature dumps (encoders.py:31-55) and finetuned from there.
  Nothing at runtime needs detectron itself — the pickles are plain
  ``np.ndarray``s — so the full branch is implemented here; only the
  offline detectron feature *extraction* scripts stay omitted
  (COVERAGE.md §2.8).

TPU-native shape: a plain factory returning a flax module + ``out_dim``
(the reference mutates ``self.out_dim`` on the wrapper; here the caller
threads it, keeping modules immutable/jit-friendly).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class IdentityEncoder(nn.Module):
    """`default` encoder (reference encoders.py:16-19)."""

    @nn.compact
    def __call__(self, x):
        return x


class FinetuneFasterRcnnFpnFc7(nn.Module):
    """fc7 finetune head: Linear initialised from pickled detectron
    weights, then ReLU (reference encoders.py:31-55).  The arrays are
    captured at construction; they seed trainable params (the reference
    copies them into an ``nn.Linear`` the optimizer then updates)."""

    w0: Any  # np.ndarray [out_dim, in_dim] (torch Linear layout)
    b0: Any  # np.ndarray [out_dim]

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", lambda _key: jnp.asarray(self.w0.T))
        b = self.param("bias", lambda _key: jnp.asarray(self.b0))
        return nn.relu(x @ w.astype(x.dtype) + b.astype(x.dtype))


def _resolve(path: str, model_data_dir: str) -> str:
    if not os.path.isabs(path) and model_data_dir:
        return os.path.join(model_data_dir, path)
    return path


def build_image_encoder(
    encoder_type: str,
    in_dim: int,
    *,
    weights_file: str = "",
    bias_file: str = "",
    model_data_dir: str = "",
    name: str | None = None,
    **_unused,
) -> Tuple[nn.Module, int]:
    """Factory matching the reference ``ImageEncoder.__init__`` dispatch
    (encoders.py:14-24).  Returns ``(module, out_dim)``."""
    if encoder_type == "default":
        return IdentityEncoder(name=name), int(in_dim)
    if encoder_type == "finetune_faster_rcnn_fpn_fc7":
        with open(_resolve(weights_file, model_data_dir), "rb") as f:
            w = np.asarray(pickle.load(f), dtype=np.float32)
        with open(_resolve(bias_file, model_data_dir), "rb") as f:
            b = np.asarray(pickle.load(f), dtype=np.float32)
        if w.shape[0] != b.shape[0] and w.shape[1] == b.shape[0]:
            # tolerate [in, out]-stored dumps; reference assumes [out, in]
            w = w.T
        assert w.shape == (b.shape[0], in_dim), (w.shape, b.shape, in_dim)
        return FinetuneFasterRcnnFpnFc7(w0=w, b0=b, name=name), int(b.shape[0])
    raise NotImplementedError(f"Unknown Image Encoder: {encoder_type}")
