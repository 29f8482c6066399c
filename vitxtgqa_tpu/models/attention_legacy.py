"""Legacy Pythia attention family (reference: pythia/modules/attention.py).

Faithful flax re-creation of the image-VQA attention stack the MMF fork
carries: ConcatenationAttention (:37), ProjectAttention (:58),
DoubleProjectAttention (:88), TopDownAttention with location masking (:110),
and the config-dispatch AttentionLayer (:8) built from ModalCombineLayer +
TransformLayer (layers.py:395-445).

Weight-norm note: the reference's LinearTransform wraps its Linear in
weight_norm(dim=None) (layers.py:416-418).  At inference the effective
weight is the materialised g·v/|v|; the converter collapses it, so the flax
module is a plain Dense (documented deviation — training re-parametrisation
only).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.models.layers import GatedTanh, ModalCombineLayer


class ConcatenationAttention(nn.Module):
    """concat(img, q) -> GatedTanh -> linear -> softmax over locations."""

    hidden_size: int

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic=True):
        b, num_loc, _ = image_feat.shape
        q = jnp.broadcast_to(
            question_embedding[:, None, :],
            (b, num_loc, question_embedding.shape[-1]),
        )
        joint = jnp.concatenate([image_feat, q], axis=2)
        raw = nn.Dense(1, name="lc")(GatedTanh(self.hidden_size, name="fa")(joint))
        attn = jax.nn.softmax(raw, axis=1)
        return jnp.broadcast_to(attn, image_feat.shape)


class ProjectAttention(nn.Module):
    """GatedTanh(img) * GatedTanh(q) -> dropout -> linear -> softmax."""

    hidden_size: int
    dropout: float = 0.2

    def raw_att(self, image_feat, question_embedding, deterministic=True):
        num_loc = image_feat.shape[1]
        image_fa = GatedTanh(self.hidden_size, name="fa_image")(image_feat)
        question_fa = GatedTanh(self.hidden_size, name="fa_txt")(
            question_embedding
        )
        joint = image_fa * jnp.broadcast_to(
            question_fa[:, None, :], (image_feat.shape[0], num_loc,
                                      self.hidden_size)
        )
        joint = nn.Dropout(self.dropout)(joint, deterministic=deterministic)
        return nn.Dense(1, name="lc")(joint)

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic=True):
        raw = self.raw_att(image_feat, question_embedding, deterministic)
        attn = jax.nn.softmax(raw, axis=1)
        return jnp.broadcast_to(attn, image_feat.shape)


class DoubleProjectAttention(nn.Module):
    """Sum of two ProjectAttention raw scores -> softmax."""

    hidden_size: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic=True):
        att1 = ProjectAttention(self.hidden_size, self.dropout, name="att1")
        att2 = ProjectAttention(self.hidden_size, self.dropout, name="att2")
        raw = att1.raw_att(image_feat, question_embedding, deterministic) + \
            att2.raw_att(image_feat, question_embedding, deterministic)
        attn = jax.nn.softmax(raw, axis=1)
        return jnp.broadcast_to(attn, image_feat.shape)


def mask_attentions(attention, image_locs):
    """Zero attention rows at locations >= the sample's location count
    (reference: attention.py:118-132)."""
    b, num_loc, n_att = attention.shape
    loc_idx = jnp.arange(num_loc, dtype=attention.dtype)[None, :]
    mask = loc_idx >= image_locs.astype(attention.dtype)[:, None]
    return jnp.where(mask[:, :, None], 0.0, attention)


class TopDownAttention(nn.Module):
    """Combine -> transform -> normalise (+ renormalised location masking)
    (reference: attention.py:110-158)."""

    combine_type: str
    combine_params: Any
    transform_out_dim: int
    normalization: str = "softmax"
    EPS: float = 1.0e-08

    @nn.compact
    def __call__(self, image_feat, question_embedding, image_locs=None,
                 deterministic=True):
        params = dict(self.combine_params)
        joint = ModalCombineLayer(
            self.combine_type, hidden_dim=int(params["hidden_dim"]),
            name="combine",
        )(image_feat, question_embedding, deterministic=deterministic)
        raw = nn.Dense(self.transform_out_dim, name="transform")(joint)

        if self.normalization.lower() == "softmax":
            attention = jax.nn.softmax(raw, axis=1)
            if image_locs is not None:
                masked = mask_attentions(attention, image_locs)
                s = jnp.sum(masked, axis=1, keepdims=True)
                s = s + (s == 0).astype(s.dtype) + self.EPS
                attention = masked / s
        elif self.normalization.lower() == "sigmoid":
            attention = jax.nn.sigmoid(raw)
            if image_locs is not None:
                attention = mask_attentions(attention, image_locs)
        else:
            raise NotImplementedError(self.normalization)
        return attention


class AttentionLayer(nn.Module):
    """Config-dispatch wrapper (reference: attention.py:8-35): currently the
    top_down path used by the legacy Pythia models."""

    image_dim: int
    question_dim: int
    modal_combine: Any
    transform: Any
    normalization: str = "softmax"

    @nn.compact
    def __call__(self, image_feat, question_embedding, image_locs=None,
                 deterministic=True):
        combine = dict(self.modal_combine)
        transform = dict(self.transform)
        return TopDownAttention(
            combine_type=combine["type"],
            combine_params=combine.get("params", {}),
            transform_out_dim=transform.get("params", {}).get("out_dim", 1),
            normalization=self.normalization,
            name="module",
        )(image_feat, question_embedding, image_locs, deterministic)
