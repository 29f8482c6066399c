"""Legacy Pythia/MMF image-VQA models.

Compact flax re-implementations of the MMF-heritage models the reference
keeps registered but does not wire to any videoqa config (reference:
pythia/models/pythia.py:16-352, lorra.py:9-97, ban.py:12-97,
top_down_bottom_up.py:15-80; SURVEY.md §2.5 "legacy Pythia").  Same registry
keys; they consume generic VQA batches:

  text [B, T] int32, text_len [B], image_feature_0 [B, K, Dv],
  (lorra) context_feature_0 [B, N, Dc]

and emit {"scores": [B, num_final_outputs]}.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.core.registry import registry
from vitxtgqa_tpu.models.common import cfg_get
from vitxtgqa_tpu.models.layers import (
    BiAttention,
    ClassifierLayer,
    FCNet,
    ModalCombineLayer,
    NonLinearElementMultiply,
)
from vitxtgqa_tpu.ops.masks import length_mask


class QuestionEmbedding(nn.Module):
    """Embedding + GRU question encoder (compact stand-in for the reference
    TextEmbedding/BiLSTM family, pythia/modules/embeddings.py)."""

    vocab_size: int
    embed_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, tokens, lengths):
        x = nn.Embed(self.vocab_size, self.embed_dim, name="word_embed")(tokens)
        rnn = nn.RNN(nn.GRUCell(self.hidden_dim), name="gru")
        hs = rnn(x)  # [B, T, H]
        idx = jnp.maximum(lengths - 1, 0)
        final = jnp.take_along_axis(hs, idx[:, None, None], axis=1)[:, 0]
        return hs, final


class _ImageAttention(nn.Module):
    """Top-down attention over region features (pythia.py image attention)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, image_feat, question_vec):
        joint = NonLinearElementMultiply(self.hidden_dim, name="combine")(
            image_feat, question_vec
        )
        logits = nn.Dense(1, name="attn")(joint)[..., 0]
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bk,bkd->bd", attn, image_feat, preferred_element_type=jnp.float32
        ).astype(image_feat.dtype)


class _LegacyBase(nn.Module):
    config: Any
    num_final_outputs: int
    compute_dtype: Any = jnp.float32
    # kept for constructor parity with the videoqa zoo
    bos_idx: int = 2
    decode_recompute: bool = False

    def _dims(self):
        c = self.config
        return (
            int(cfg_get(c, "vocab_size", 30522)),
            int(cfg_get(c, "embed_dim", 300)),
            int(cfg_get(c, "hidden_dim", 1024)),
        )


@registry.register_model("pythia")
class Pythia(_LegacyBase):
    """Question GRU + top-down image attention + modal combine + classifier
    (reference: pythia.py:16-300)."""

    use_question: bool = True
    use_image: bool = True

    def setup(self):
        vocab, embed, hidden = self._dims()
        self.question_embedding = QuestionEmbedding(vocab, embed, hidden)
        self.image_attention = _ImageAttention(hidden)
        self.combine = ModalCombineLayer(
            str(cfg_get(self.config, "modal_combine", "non_linear_element_multiply")),
            hidden,
        )
        self.classifier = ClassifierLayer(
            str(cfg_get(self.config, "classifier_type", "logit")),
            hidden, self.num_final_outputs,
        )

    def __call__(self, batch: Dict[str, jax.Array], train: bool = False):
        lengths = batch["text_len"]
        _, q_vec = self.question_embedding(batch["text"], lengths)
        img = batch["image_feature_0"].astype(self.compute_dtype)
        pooled = self.image_attention(img, q_vec)
        if not self.use_question:
            q_vec = jnp.zeros_like(q_vec)
        if not self.use_image:
            pooled = jnp.zeros_like(pooled)
        joint = self.combine(pooled, q_vec, deterministic=not train)
        return {"scores": self.classifier(joint, deterministic=not train)}


@registry.register_model("pythia_question_only")
class PythiaQuestionOnly(Pythia):
    use_image: bool = False


@registry.register_model("pythia_image_only")
class PythiaImageOnly(Pythia):
    use_question: bool = False


@registry.register_model("lorra")
class LoRRA(Pythia):
    """Pythia + OCR context-attention branch for the copy answer space
    (reference: lorra.py:9-97)."""

    def setup(self):
        super().setup()
        _, _, hidden = self._dims()
        self.context_attention = _ImageAttention(hidden)
        self.context_combine = ModalCombineLayer(
            "non_linear_element_multiply", hidden
        )

    def __call__(self, batch, train: bool = False):
        lengths = batch["text_len"]
        _, q_vec = self.question_embedding(batch["text"], lengths)
        img = batch["image_feature_0"].astype(self.compute_dtype)
        ctx = batch["context_feature_0"].astype(self.compute_dtype)
        pooled_img = self.image_attention(img, q_vec)
        pooled_ctx = self.context_attention(ctx, q_vec)
        joint = self.combine(pooled_img, q_vec, deterministic=not train)
        joint_ctx = self.context_combine(pooled_ctx, q_vec, deterministic=not train)
        joint = jnp.concatenate([joint, joint_ctx], axis=-1)
        return {"scores": self.classifier(joint, deterministic=not train)}


@registry.register_model("ban")
class BAN(_LegacyBase):
    """Bilinear attention network: glimpsed co-attention with residual
    question refinement (reference: ban.py:12-97)."""

    def setup(self):
        vocab, embed, hidden = self._dims()
        self.glimpses = int(cfg_get(self.config, "glimpses", 2))
        self.question_embedding = QuestionEmbedding(vocab, embed, hidden)
        self.biattention = BiAttention(hidden, glimpses=self.glimpses)
        self.v_net = FCNet((0, hidden))
        self.q_update = FCNet((0, hidden))
        self.classifier = ClassifierLayer(
            "weight_norm", hidden, self.num_final_outputs,
        )

    def __call__(self, batch, train: bool = False):
        hs, _ = self.question_embedding(batch["text"], batch["text_len"])
        v = batch["image_feature_0"].astype(self.compute_dtype)
        att = self.biattention(v, hs)  # [B, G, K, T]
        q = hs
        for g in range(self.glimpses):
            fused = jnp.einsum(
                "bkt,bkd->btd", att[:, g], self.v_net(v),
                preferred_element_type=jnp.float32,
            ).astype(q.dtype)
            q = q + self.q_update(fused)
        pooled = q.sum(axis=1)
        return {"scores": self.classifier(pooled, deterministic=not train)}


@registry.register_model("top_down_bottom_up")
class TopDownBottomUp(_LegacyBase):
    """Classic TDBU VQA head (reference: top_down_bottom_up.py:15-80)."""

    def setup(self):
        vocab, embed, hidden = self._dims()
        self.question_embedding = QuestionEmbedding(vocab, embed, hidden)
        self.attention = _ImageAttention(hidden)
        self.combine = ModalCombineLayer("non_linear_element_multiply", hidden)
        self.classifier = ClassifierLayer(
            "weight_norm", hidden, self.num_final_outputs,
        )

    def __call__(self, batch, train: bool = False):
        _, q_vec = self.question_embedding(batch["text"], batch["text_len"])
        v = batch["image_feature_0"].astype(self.compute_dtype)
        pooled = self.attention(v, q_vec)
        joint = self.combine(pooled, q_vec, deterministic=not train)
        return {"scores": self.classifier(joint, deterministic=not train)}
