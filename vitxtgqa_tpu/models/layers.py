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


class WNDense(nn.Module):
    """Weight-normalised linear, torch weight_norm(nn.Linear, dim=None):
    a single scalar g with the whole-matrix Frobenius norm,
    w = g * v / ||v||_F."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        v = self.param(
            "v", nn.initializers.lecun_normal(), (x.shape[-1], self.out_dim)
        )
        g = self.param("g", lambda key, shape: jnp.ones(shape), ())
        b = self.param("b", nn.initializers.zeros, (self.out_dim,))
        w = v / jnp.maximum(jnp.linalg.norm(v), 1e-12) * g
        return x @ w + b


class LogitClassifier(nn.Module):
    """Two-branch logit head over ReLU-weight-norm projections
    (reference: layers.py:110-138: f_o_text/f_o_image are
    ReLUWithWeightNormFC, then plain linears summed)."""

    in_dim: int
    out_dim: int
    text_hidden: int
    img_hidden: int

    def setup(self):
        self.f_o_text = ReLUWithWeightNormFC(self.text_hidden)
        self.f_o_image = ReLUWithWeightNormFC(self.img_hidden)
        self.linear_text = nn.Dense(self.out_dim)
        self.linear_image = nn.Dense(self.out_dim)

    def __call__(self, joint_embedding):
        t = self.linear_text(self.f_o_text(joint_embedding))
        i = self.linear_image(self.f_o_image(joint_embedding))
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
        # final linear is weight_norm(dim=None) like fc1 (reference:
        # layers.py:141-155 — scalar g over the Frobenius norm)
        return WNDense(self.out_dim, name="fc2")(h)


class ClassifierLayer(nn.Module):
    """Type-dispatched classifier (reference: layers.py:91-109)."""

    classifier_type: str
    in_dim: int
    out_dim: int
    params: Any = None

    def setup(self):
        p = dict(self.params or {})
        if self.classifier_type == "linear":
            self.module = nn.Dense(self.out_dim)
        elif self.classifier_type == "logit":
            self.module = LogitClassifier(
                self.in_dim, self.out_dim,
                int(p.get("text_hidden_dim", self.in_dim)),
                int(p.get("img_hidden_dim", self.in_dim)),
            )
        elif self.classifier_type == "weight_norm":
            self.module = WeightNormClassifier(
                int(p.get("hidden_dim", self.in_dim)), self.out_dim,
                dropout=float(p.get("dropout", 0.5)),
            )
        else:
            raise ValueError(
                f"unknown classifier type {self.classifier_type!r}"
            )

    def __call__(self, x, deterministic: bool = True):
        if self.classifier_type == "weight_norm":
            return self.module(x, deterministic)
        return self.module(x)


class NonLinearElementMultiply(nn.Module):
    """ReLU-weight-norm projections multiplied elementwise, with optional
    context stream concatenated on the location axis
    (reference: layers.py:288-320).  setup-based so the Pythia
    question-only/image-only variants can reach fa_txt/fa_image directly
    (reference: pythia.py:311-316, 345-347)."""

    hidden_dim: int
    dropout: float = 0.0

    def setup(self):
        self.fa_image = ReLUWithWeightNormFC(self.hidden_dim)
        self.fa_txt = ReLUWithWeightNormFC(self.hidden_dim)
        self.fa_context = ReLUWithWeightNormFC(self.hidden_dim)
        self.dropout_layer = nn.Dropout(self.dropout)

    def __call__(self, image_feat, question_embedding, context_embedding=None,
                 deterministic: bool = True):
        i = self.fa_image(image_feat)
        q = self.fa_txt(question_embedding)
        if image_feat.ndim == 3 and question_embedding.ndim == 2:
            q = q[:, None, :]
        joint = i * q
        if context_embedding is not None:
            c = self.fa_context(context_embedding)
            joint = jnp.concatenate([joint, c * q], axis=1)
        return self.dropout_layer(joint, deterministic=deterministic)


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
    dropout: float = 0.0

    def setup(self):
        if self.combine_type == "non_linear_element_multiply":
            self.module = NonLinearElementMultiply(
                self.hidden_dim, dropout=self.dropout
            )
        elif self.combine_type == "MFH":
            self.module = MFH(self.hidden_dim)
        else:
            raise ValueError(f"unknown combine type {self.combine_type!r}")

    @property
    def out_dim(self):
        return self.hidden_dim * (2 if self.combine_type == "MFH" else 1)

    def __call__(self, image_feat, question_embedding, context_embedding=None,
                 deterministic: bool = True):
        if self.combine_type == "MFH":
            return self.module(image_feat, question_embedding, deterministic)
        return self.module(
            image_feat, question_embedding, context_embedding,
            deterministic=deterministic,
        )


class FCNet(nn.Module):
    """Weight-norm MLP, exact reference structure (layers.py:529-560):
    for each layer: [Dropout if dropout>0] -> weight_norm(Linear, dim=None)
    -> activation.  `dims` is the full [in, hidden..., out] list (the in
    dim is inferred by flax; kept for documentation parity)."""

    dims: tuple
    act: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        activation = getattr(nn, self.act.lower()) if self.act else None
        for i, d in enumerate(self.dims[1:]):
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = WNDense(d, name=f"fc{i}")(x)
            if activation is not None:
                x = activation(x)
        return x


class BCNet(nn.Module):
    """Bilinear connect network, exact reference semantics
    (layers.py:456-526): k-factor weight-norm projections of v and q, then
    either the broadcast-Hadamard glimpse logits (h_out <= c=32, the
    BiAttention path) or the weighted bilinear fusion
    (`forward_with_weights`, the BAN b_net path with AvgPool(k)*k folding).

    `hmat_weight_norm=True` reproduces BiAttention's
    weight_norm(BCNet, name='h_mat', dim=None) wrapper (layers.py:567-570):
    h_mat = g * v / ||v||_F with a learned scalar g."""

    h_dim: int
    h_out: Any = None
    k: int = 3
    act: str = "relu"
    dropout: tuple = (0.2, 0.5)
    hmat_weight_norm: bool = False

    def setup(self):
        hk = self.h_dim * self.k
        self.v_net = FCNet((0, hk), act=self.act, dropout=self.dropout[0])
        self.q_net = FCNet((0, hk), act=self.act, dropout=self.dropout[0])
        self.dropout_layer = nn.Dropout(self.dropout[1])
        if self.h_out is not None:
            assert self.h_out <= 32, "h_out > c uses h_net (not needed here)"
            if self.hmat_weight_norm:
                self.h_mat_v = self.param(
                    "h_mat_v", nn.initializers.normal(1.0),
                    (1, self.h_out, 1, hk),
                )
                self.h_mat_g = self.param(
                    "h_mat_g", lambda key, shape: jnp.ones(shape), ()
                )
            else:
                self.h_mat = self.param(
                    "h_mat", nn.initializers.normal(1.0),
                    (1, self.h_out, 1, hk),
                )
            self.h_bias = self.param(
                "h_bias", nn.initializers.normal(1.0), (1, self.h_out, 1, 1)
            )

    def _h_mat(self):
        if self.hmat_weight_norm:
            v = self.h_mat_v
            return v / jnp.maximum(jnp.linalg.norm(v), 1e-12) * self.h_mat_g
        return self.h_mat

    def __call__(self, v, q, deterministic: bool = True):
        """Glimpse logits [B, h_out, K, T] (reference forward, h_out<=c)."""
        v_ = self.dropout_layer(
            self.v_net(v, deterministic), deterministic=deterministic
        )  # [B, K, hk]
        q_ = self.q_net(q, deterministic)  # [B, T, hk]
        h_ = v_[:, None] * self._h_mat()  # [B, h_out, K, hk]
        logits = jnp.einsum(
            "bgkh,bth->bgkt", h_, q_, preferred_element_type=jnp.float32
        ).astype(v.dtype)
        return logits + self.h_bias

    def forward_with_weights(self, v, q, w, deterministic: bool = True):
        """[B, h_dim] fused features (reference forward_with_weights):
        logits = v_net(v)^T w q_net(q), then AvgPool1d(k)*k == sum over
        the k consecutive factors."""
        v_ = self.v_net(v, deterministic)  # [B, K, hk]
        q_ = self.q_net(q, deterministic)  # [B, T, hk]
        logits = jnp.einsum(
            "bkh,bkt,bth->bh", v_, w, q_, preferred_element_type=jnp.float32
        ).astype(v.dtype)
        if self.k > 1:
            logits = logits.reshape(
                logits.shape[0], self.h_dim, self.k
            ).sum(-1)
        return logits


class BiAttention(nn.Module):
    """Bilinear co-attention, exact reference semantics (layers.py:564-593):
    glimpse logits from a weight-normed BCNet, -inf fill where the visual
    row is all-zero, softmax over the flattened K*T grid.  Returns
    (p [B, glimpse, K, T], logits)."""

    hidden_dim: int
    glimpses: int = 2
    dropout: tuple = (0.2, 0.5)

    def setup(self):
        self.logits_net = BCNet(
            h_dim=self.hidden_dim, h_out=self.glimpses, k=3,
            dropout=self.dropout, hmat_weight_norm=True,
        )

    def __call__(self, v, q, v_mask: bool = True,
                 deterministic: bool = True):
        return self.forward_all(v, q, v_mask, deterministic)

    def forward_all(self, v, q, v_mask: bool = True,
                    deterministic: bool = True):
        b, v_num = v.shape[0], v.shape[1]
        q_num = q.shape[1]
        logits = self.logits_net(v, q, deterministic)  # [B, G, K, T]
        if v_mask:
            empty = (jnp.abs(v).sum(2) == 0)  # [B, K]
            logits = jnp.where(
                empty[:, None, :, None], -jnp.inf, logits
            )
        p = jax.nn.softmax(
            logits.reshape(b, self.glimpses, v_num * q_num), axis=2
        ).reshape(b, self.glimpses, v_num, q_num)
        return p, logits
