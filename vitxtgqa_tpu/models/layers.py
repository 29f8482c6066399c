"""Legacy layer library (MMF heritage).

Compact flax re-implementations of the reference's shared layer zoo
(reference: pythia/modules/layers.py:9-593).  Only ClassifierLayer touches
the videoqa path (layers.py:91-109, consumed by every model's output head —
served here by FixedVocabClassifier in models/common.py); the rest back the
legacy image-VQA models in models/legacy_vqa.py.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GatedTanh(nn.Module):
    """y = tanh(Wx) * sigmoid(Gx) (reference: layers.py:51-75)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        y = jnp.tanh(nn.Dense(self.out_dim, name="fc")(x))
        g = jax.nn.sigmoid(nn.Dense(self.out_dim, name="gate_fc")(x))
        return y * g


class ReLUWithWeightNormFC(nn.Module):
    """Weight-normalised linear + ReLU (reference: layers.py:78-88).

    torch's weight_norm(dim=None): a single scalar g with the whole-matrix
    Frobenius norm, w = g * v / ||v||_F.
    """

    out_dim: int

    @nn.compact
    def __call__(self, x):
        v = self.param(
            "v", nn.initializers.lecun_normal(), (x.shape[-1], self.out_dim)
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.ones(shape),
            (),
        )
        b = self.param("b", nn.initializers.zeros, (self.out_dim,))
        w = v / jnp.maximum(jnp.linalg.norm(v), 1e-12) * g
        return nn.relu(x @ w + b)


class LogitClassifier(nn.Module):
    """Two-branch gated-tanh logit head (reference: layers.py:110-138)."""

    in_dim: int
    out_dim: int
    text_hidden: int
    img_hidden: int

    @nn.compact
    def __call__(self, joint_embedding):
        f_o_text = GatedTanh(self.text_hidden, name="f_o_text")(joint_embedding)
        f_o_image = GatedTanh(self.img_hidden, name="f_o_image")(joint_embedding)
        t = nn.Dense(self.out_dim, name="linear_text")(f_o_text)
        i = nn.Dense(self.out_dim, name="linear_image")(f_o_image)
        return t + i


class WeightNormClassifier(nn.Module):
    """wn-fc -> relu -> dropout -> wn-fc (reference: layers.py:141-155)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = ReLUWithWeightNormFC(self.hidden_dim, name="fc1")(x)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        v = self.param(
            "v", nn.initializers.lecun_normal(), (self.hidden_dim, self.out_dim)
        )
        g = self.param("g", nn.initializers.ones, (self.out_dim,))
        b = self.param("b", nn.initializers.zeros, (self.out_dim,))
        w = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12) * g
        return h @ w + b


class ClassifierLayer(nn.Module):
    """Type-dispatched classifier (reference: layers.py:91-109)."""

    classifier_type: str
    in_dim: int
    out_dim: int
    params: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(self.params or {})
        if self.classifier_type == "linear":
            return nn.Dense(self.out_dim, name="module")(x)
        if self.classifier_type == "logit":
            return LogitClassifier(
                self.in_dim, self.out_dim,
                int(p.get("text_hidden_dim", self.in_dim)),
                int(p.get("img_hidden_dim", self.in_dim)), name="module",
            )(x)
        if self.classifier_type == "weight_norm":
            return WeightNormClassifier(
                int(p.get("hidden_dim", self.in_dim)), self.out_dim, name="module",
            )(x, deterministic)
        raise ValueError(f"unknown classifier type {self.classifier_type!r}")


class NonLinearElementMultiply(nn.Module):
    """ReLU-weight-norm projections multiplied elementwise, with optional
    context stream concatenated on the location axis
    (reference: layers.py:288-320)."""

    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, image_feat, question_embedding, context_embedding=None,
                 deterministic: bool = True):
        i = ReLUWithWeightNormFC(self.hidden_dim, name="fa_image")(image_feat)
        q = ReLUWithWeightNormFC(self.hidden_dim, name="fa_txt")(
            question_embedding
        )
        if image_feat.ndim == 3 and question_embedding.ndim == 2:
            q = q[:, None, :]
        joint = i * q
        if context_embedding is not None:
            c = ReLUWithWeightNormFC(self.hidden_dim, name="fa_context")(
                context_embedding
            )
            joint = jnp.concatenate([joint, c * q], axis=1)
        return nn.Dropout(self.dropout)(joint, deterministic=deterministic)


class MFH(nn.Module):
    """Multi-modal factorised high-order pooling (reference: layers.py:205-285):
    two MFB blocks chained, outputs concatenated."""

    hidden_dim: int
    pool_size: int = 2
    order: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic: bool = True):
        outs = []
        exp_prev = None
        for o in range(self.order):
            i = nn.Dense(self.hidden_dim * self.pool_size, name=f"img_{o}")(image_feat)
            q = nn.Dense(self.hidden_dim * self.pool_size, name=f"q_{o}")(
                question_embedding
            )
            if image_feat.ndim == 3 and q.ndim == 2:
                q = q[:, None, :]
            z = i * q
            if exp_prev is not None:
                z = z * exp_prev
            exp_prev = z
            z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
            # sum-pool over the factor dim
            shape = z.shape[:-1] + (self.hidden_dim, self.pool_size)
            z = z.reshape(shape).sum(-1)
            # signed sqrt + l2 norm
            z = jnp.sign(z) * jnp.sqrt(jnp.abs(z) + 1e-12)
            z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
            outs.append(z)
        return jnp.concatenate(outs, axis=-1)


class ModalCombineLayer(nn.Module):
    """Type-dispatched fusion (reference: layers.py:165-184)."""

    combine_type: str
    hidden_dim: int

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic: bool = True):
        if self.combine_type == "non_linear_element_multiply":
            return NonLinearElementMultiply(self.hidden_dim, name="module")(
                image_feat, question_embedding, deterministic=deterministic
            )
        if self.combine_type == "MFH":
            return MFH(self.hidden_dim, name="module")(
                image_feat, question_embedding, deterministic
            )
        raise ValueError(f"unknown combine type {self.combine_type!r}")


class FCNet(nn.Module):
    """ReLU MLP stack (reference: layers.py:529-560)."""

    dims: tuple

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims[1:]):
            x = nn.relu(nn.Dense(d, name=f"fc_{i}")(x))
        return x


class BiAttention(nn.Module):
    """Bilinear co-attention map (reference: layers.py:564-593 over BCNet)."""

    hidden_dim: int
    glimpses: int = 2

    @nn.compact
    def __call__(self, v, q):
        """v [B, K, Dv], q [B, T, Dq] -> attention [B, glimpses, K, T]."""
        vp = FCNet((v.shape[-1], self.hidden_dim), name="v_net")(v)
        qp = FCNet((q.shape[-1], self.hidden_dim), name="q_net")(q)
        h = self.param(
            "h_mat", nn.initializers.normal(0.02),
            (self.glimpses, self.hidden_dim),
        )
        logits = jnp.einsum(
            "bkd,gd,btd->bgkt", vp, h, qp, preferred_element_type=jnp.float32
        )
        b, g, k, t = logits.shape
        return jax.nn.softmax(logits.reshape(b, g, -1), axis=-1).reshape(b, g, k, t)
