"""MIST auxiliary modules: DistilBERT-style fusion Transformer, embedding
helpers, EncoderVid, and the language-model wrappers.

TPU-native re-creation of the reference's mist_module support code
(reference: pythia/modules/mist_module/mist_module.py:13-388 — sinusoidal
embeddings :13, MultiHeadSelfAttention :27, FFN :107, TransformerBlock :127,
Transformer :184, Embeddings :269, PositionEmbeddings :314,
SegmentPosEmbeddings :343, TokenTypeEmbeddings :366;
mist_module/EncoderVid.py:18-67; mist_module/language_model.py:7-103).

These are instantiated-but-dormant in the reference's live forward; they are
re-created for full component parity and because the fusion transformer is a
useful standalone building block.  Post-LN blocks (DistilBERT layout: LN
after the residual add, eps 1e-12), key-validity mask as an additive -inf
bias, gelu/relu FFN.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitxtgqa_tpu.models.common import TextEncoder, TransformerConfig


def sinusoidal_embeddings(n_pos: int, dim: int) -> np.ndarray:
    """Interleaved sin/cos table (reference: mist_module.py:13-24)."""
    pos_enc = np.array(
        [
            [pos / np.power(10000, 2 * (j // 2) / dim) for j in range(dim)]
            for pos in range(n_pos)
        ]
    )
    out = np.zeros((n_pos, dim), np.float32)
    out[:, 0::2] = np.sin(pos_enc[:, 0::2])
    out[:, 1::2] = np.cos(pos_enc[:, 1::2])
    return out


@dataclasses.dataclass(frozen=True)
class DistilConfig:
    """Subset of DistilBertConfig the fusion transformer consumes."""

    dim: int = 768
    n_heads: int = 12
    n_layers: int = 2
    hidden_dim: int = 3072
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation: str = "gelu"
    dtype: Any = jnp.float32


class DistilSelfAttention(nn.Module):
    """Q/K/V separate projections; mask==0 keys get -inf scores
    (reference: mist_module.py:27-105)."""

    cfg: DistilConfig

    @nn.compact
    def __call__(self, query, key, value, mask, deterministic: bool = True):
        c = self.cfg
        hd = c.dim // c.n_heads

        def shape(x):
            b, l, _ = x.shape
            return x.reshape(b, l, c.n_heads, hd).transpose(0, 2, 1, 3)

        q = shape(nn.Dense(c.dim, dtype=c.dtype, name="q_lin")(query)) / (hd ** 0.5)
        k = shape(nn.Dense(c.dim, dtype=c.dtype, name="k_lin")(key))
        v = shape(nn.Dense(c.dim, dtype=c.dtype, name="v_lin")(value))
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        neg = jnp.where(mask[:, None, None, :] == 0, -jnp.inf, 0.0)
        weights = jax.nn.softmax(scores + neg, axis=-1).astype(v.dtype)
        weights = nn.Dropout(c.attention_dropout)(
            weights, deterministic=deterministic
        )
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
        ).astype(query.dtype)
        b, _, lq, _ = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, lq, c.dim)
        return nn.Dense(c.dim, dtype=c.dtype, name="out_lin")(ctx)


class DistilFFN(nn.Module):
    cfg: DistilConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        h = nn.Dense(c.hidden_dim, dtype=c.dtype, name="lin1")(x)
        h = nn.gelu(h, approximate=False) if c.activation == "gelu" else nn.relu(h)
        h = nn.Dense(c.dim, dtype=c.dtype, name="lin2")(h)
        return nn.Dropout(c.dropout)(h, deterministic=deterministic)


class DistilTransformerBlock(nn.Module):
    """Post-LN self-attention block (reference: mist_module.py:127-181)."""

    cfg: DistilConfig

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        c = self.cfg
        sa = DistilSelfAttention(c, name="attention")(
            x, x, x, attn_mask, deterministic
        )
        x = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="sa_layer_norm")(sa + x)
        ff = DistilFFN(c, name="ffn")(x, deterministic)
        return nn.LayerNorm(
            epsilon=1e-12, dtype=c.dtype, name="output_layer_norm"
        )(ff + x)


class DistilTransformer(nn.Module):
    """Stack of post-LN blocks (reference: mist_module.py:184-266)."""

    cfg: DistilConfig

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        if attn_mask is None:
            attn_mask = jnp.ones(x.shape[:2], jnp.float32)
        for i in range(self.cfg.n_layers):
            x = DistilTransformerBlock(self.cfg, name=f"layer_{i}")(
                x, attn_mask, deterministic
            )
        return x


class FusionEmbeddings(nn.Module):
    """Position + binary-modality embeddings over a [language|vision] joint
    sequence (reference: mist_module.py:269-311)."""

    d_model: int
    language_len: int
    vision_len: int
    dropout: float = 0.1
    sinusoidal_pos_embds: bool = False

    @nn.compact
    def __call__(self, embeddings, deterministic: bool = True):
        n_pos = self.language_len + self.vision_len
        init = (
            (lambda *_: jnp.asarray(sinusoidal_embeddings(n_pos, self.d_model)))
            if self.sinusoidal_pos_embds
            else nn.initializers.normal(0.02)
        )
        pos_table = self.param("position_embeddings", init, (n_pos, self.d_model))
        modality_table = self.param(
            "modality_embedding", nn.initializers.normal(0.02), (2, self.d_model)
        )
        seq = embeddings.shape[1]
        pos = pos_table[:seq]
        modality_ids = jnp.concatenate(
            [
                jnp.zeros(self.language_len, jnp.int32),
                jnp.ones(self.vision_len, jnp.int32),
            ]
        )[:seq]
        x = embeddings + pos.astype(embeddings.dtype) \
            + modality_table[modality_ids].astype(embeddings.dtype)
        x = nn.LayerNorm(epsilon=1e-12, name="LayerNorm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class PositionEmbeddings(nn.Module):
    """Lookup-by-position table; supports [B,F,D] and [B,F,R,D] layouts
    (reference: mist_module.py:314-340)."""

    d_model: int
    max_position_embeddings: int
    sinusoidal_pos_embds: bool = False

    @nn.compact
    def __call__(self, embeddings):
        init = (
            (lambda *_: jnp.asarray(
                sinusoidal_embeddings(self.max_position_embeddings, self.d_model)
            ))
            if self.sinusoidal_pos_embds
            else nn.initializers.normal(0.02)
        )
        table = self.param(
            "position_embeddings", init,
            (self.max_position_embeddings, self.d_model),
        )
        if embeddings.ndim == 4:
            b, numf, numr, _ = embeddings.shape
            pos = jnp.broadcast_to(
                table[:numf][None, :, None, :], (b, numf, numr, self.d_model)
            )
        else:
            b, numf, _ = embeddings.shape
            pos = jnp.broadcast_to(table[:numf][None], (b, numf, self.d_model))
        return pos.astype(embeddings.dtype)


class TokenTypeEmbeddings(nn.Module):
    """Named-modality type embedding (reference: mist_module.py:366-388)."""

    d_model: int
    token_type_num: int = 3

    TYPE2ID = {"object": 0, "segment": 1, "question": 2}

    @nn.compact
    def __call__(self, embeddings, token_type: str):
        table = self.param(
            "modality_embedding", nn.initializers.normal(0.02),
            (self.token_type_num, self.d_model),
        )
        type_id = self.TYPE2ID[token_type]
        seq = embeddings.shape[1]
        return jnp.broadcast_to(
            table[type_id][None, None, :], (embeddings.shape[0], seq, self.d_model)
        ).astype(embeddings.dtype)


class EncoderVid(nn.Module):
    """Per-region bbox-geometry encoder (reference: EncoderVid.py:18-67).

    The torch original applies 1x1 Conv2d + BatchNorm2d over a
    [B, bbox_dim, cf, region] layout; with channels-last semantics a 1x1
    conv over static spatial dims is exactly a Dense over the feature axis,
    with BatchNorm reducing over (batch, clip*frame, region).
    """

    feat_dim: int
    bbox_dim: int
    feat_hidden: int
    pos_hidden: int
    input_dropout_p: float = 0.3

    @nn.compact
    def __call__(self, video_o, use_running_average: bool = True):
        """video_o [B, numc, numf, numr, feat+bbox(+rest)] -> [B, numc*numf, numr, H]."""
        b, numc, numf, numr, _ = video_o.shape
        x = video_o.reshape(b, numc * numf, numr, -1)
        roi_feat = x[..., : self.feat_dim]
        roi_bbox = x[..., self.feat_dim : self.feat_dim + self.bbox_dim]

        bn = lambda name: nn.BatchNorm(
            use_running_average=use_running_average, epsilon=1e-5,
            momentum=0.9, axis=-1, name=name,
        )
        pos = nn.Dense(self.pos_hidden, name="bbox_conv1")(roi_bbox)
        pos = nn.relu(bn("bbox_bn1")(pos))
        pos = nn.Dense(self.pos_hidden, name="bbox_conv2")(pos)
        pos = nn.relu(bn("bbox_bn2")(pos))

        feat = jnp.concatenate([roi_feat, pos], axis=-1)
        return nn.elu(nn.Dense(self.feat_hidden, name="tohid")(feat))


class SentenceMaxpool(nn.Module):
    """Linear + max-over-tokens (+ReLU) (reference: language_model.py:42-56)."""

    output_dim: int
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.output_dim, name="fc")(x)
        x = jnp.max(x, axis=1)
        return nn.relu(x) if self.relu else x


class MistBert(nn.Module):
    """BERT wrapper: tokens>0 attention mask, per-token embeddings
    (reference: language_model.py:7-22 / DistilBert :24-39 — identical
    forward, different backbone geometry selected via ``cfg``)."""

    cfg: TransformerConfig

    def setup(self):
        self.bert = TextEncoder(self.cfg, name="bert")

    def __call__(self, tokens, deterministic: bool = True):
        mask = (tokens > 0).astype(jnp.float32)
        return self.bert(tokens, mask, deterministic)


# DistilBERT-base geometry for the DistilBert wrapper variant
DISTILBERT_BASE = TransformerConfig(num_hidden_layers=6, vocab_size=30522)


class AModel(nn.Module):
    """Answer embedder: BERT CLS -> linear (reference: language_model.py:59-80).

    Accepts [B, L] or [B, n_answers, L] token layouts like the original.
    """

    out_dim: int = 512
    bert_cfg: Optional[TransformerConfig] = None

    def setup(self):
        cfg = self.bert_cfg or TransformerConfig(num_hidden_layers=12)
        self.bert = MistBert(cfg, name="bert")
        self.linear_text = nn.Dense(self.out_dim)

    def __call__(self, answer, deterministic: bool = True):
        if answer.ndim == 3:
            bs, nans, lans = answer.shape
            flat = answer.reshape(bs * nans, lans)
            emb = self.bert(flat, deterministic)[:, 0, :]
            emb = emb.reshape(bs, nans, -1)
        else:
            emb = self.bert(answer, deterministic)[:, 0, :]
        return self.linear_text(emb)
