"""Legacy Pythia text/image embedding family
(reference: pythia/modules/embeddings.py:16-242).

Faithful flax re-creation: TextEmbedding dispatch (:16), VocabEmbedding
(:49), BiLSTMTextEmbedding (:58, LSTM/GRU over flax RNN cells),
PreExtractedEmbedding (:101, host-side npy cache), AttentionTextEmbedding
(:119, LSTM + two conv1d attention maps), ImageEmbedding (:181, top-down
attention pooling).

Reference quirk: BiLSTMTextEmbedding.forward's non-bidirectional branch
references an undefined ``self.num_hid`` and would raise — dead code in the
reference.  Here both branches return the last timestep output (the
bidirectional behaviour, which is the only one the reference can execute).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitxtgqa_tpu.models.attention_legacy import AttentionLayer


class VocabEmbedding(nn.Module):
    """Embedding table sized/preloaded from a Vocab (reference: :49-55)."""

    embedding_dim: int
    vocab_size: int
    pretrained: Optional[Any] = None  # [V, D] vectors to initialise from

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        init = (
            (lambda *_: jnp.asarray(self.pretrained, jnp.float32))
            if self.pretrained is not None
            else nn.initializers.normal(1.0)
        )
        table = self.param("embedding", init,
                           (self.vocab_size, self.embedding_dim))
        return jnp.take(table, x, axis=0)


class _StackedRNN(nn.Module):
    """num_layers of LSTM/GRU with optional bidirectionality; returns the
    full output sequence [B, T, H or 2H]."""

    hidden_dim: int
    num_layers: int = 1
    rnn_type: str = "GRU"
    bidirectional: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cell_cls = nn.OptimizedLSTMCell if self.rnn_type == "LSTM" else nn.GRUCell
        out = x
        for layer in range(self.num_layers):
            # nn.RNN is scope-transparent: naming the *cell* fixes the
            # parameter path (recurrent_encoder/<fwd_i>/...)
            fwd = nn.RNN(cell_cls(self.hidden_dim, name=f"fwd_{layer}"))
            if self.bidirectional:
                bwd = nn.RNN(
                    cell_cls(self.hidden_dim, name=f"bwd_{layer}"),
                    reverse=True, keep_order=True,
                )
                out_f = fwd(out)
                out_b = bwd(out)
                out = jnp.concatenate([out_f, out_b], axis=-1)
            else:
                out = fwd(out)
            if layer < self.num_layers - 1 and self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class BiLSTMTextEmbedding(nn.Module):
    """RNN over embedded tokens; returns the last timestep state
    (reference: :58-98; see module docstring for the dead-branch quirk)."""

    hidden_dim: int
    num_layers: int = 1
    dropout: float = 0.0
    bidirectional: bool = False
    rnn_type: str = "GRU"

    def setup(self):
        self.recurrent_encoder = _StackedRNN(
            hidden_dim=self.hidden_dim, num_layers=self.num_layers,
            rnn_type=self.rnn_type, bidirectional=self.bidirectional,
            dropout=self.dropout,
        )

    def __call__(self, x, deterministic: bool = True):
        out = self.recurrent_encoder(x, deterministic)
        return out[:, -1]

    def forward_all(self, x, deterministic: bool = True):
        return self.recurrent_encoder(x, deterministic)


class PreExtractedEmbedding:
    """Host-side per-question-id npy lookup with caching (reference:
    :101-116).  Not a flax module — it is pure data plumbing."""

    def __init__(self, out_dim: int, base_path: str):
        self.text_out_dim = out_dim
        self.base_path = base_path
        self._load = lru_cache(maxsize=5000)(self._load_uncached)

    def _load_uncached(self, qid: int) -> np.ndarray:
        return np.load(os.path.join(self.base_path, f"{qid}.npy"))

    def __call__(self, qids) -> np.ndarray:
        return np.stack([self._load(int(q)) for q in np.asarray(qids)], 0)


class AttentionTextEmbedding(nn.Module):
    """LSTM -> two 1D convs -> softmax over T -> weighted-sum glimpses
    (reference: :119-178).  Output [B, conv2_out * hidden_dim]."""

    hidden_dim: int
    num_layers: int = 1
    dropout: float = 0.0
    conv1_out: int = 512
    conv2_out: int = 2
    kernel_size: int = 1
    padding: int = 0
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        per_dir = self.hidden_dim // 2 if self.bidirectional else self.hidden_dim
        lstm_out = _StackedRNN(
            hidden_dim=per_dir, num_layers=self.num_layers, rnn_type="LSTM",
            bidirectional=self.bidirectional, name="recurrent_unit",
        )(x, deterministic)  # [B, T, hidden_dim]
        lstm_drop = nn.Dropout(self.dropout)(
            lstm_out, deterministic=deterministic
        )
        # torch convs run over channels=hidden on the T axis; flax Conv is
        # feature-last, so operate on [B, T, C] directly
        h = nn.Conv(
            self.conv1_out, (self.kernel_size,), padding=self.padding,
            name="conv1",
        )(lstm_drop)
        h = nn.relu(h)
        h = nn.Conv(
            self.conv2_out, (self.kernel_size,), padding=self.padding,
            name="conv2",
        )(h)  # [B, T, conv2_out]
        attn = jax.nn.softmax(h, axis=1)  # over T
        glimpses = jnp.einsum(
            "btg,bth->bgh", attn, lstm_drop,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return glimpses.reshape(b, -1)


class ImageEmbedding(nn.Module):
    """Attention-pooled image features (reference: :181-222)."""

    image_dim: int
    question_dim: int
    modal_combine: Any
    transform: Any
    normalization: str = "softmax"

    @nn.compact
    def __call__(self, image_feat, question_embedding, image_locs=None,
                 order_vectors=None, deterministic: bool = True):
        attention = AttentionLayer(
            image_dim=self.image_dim, question_dim=self.question_dim,
            modal_combine=self.modal_combine, transform=self.transform,
            normalization=self.normalization, name="image_attention_model",
        )(image_feat, question_embedding, image_locs, deterministic)
        if order_vectors is not None:
            image_feat = jnp.concatenate([image_feat, order_vectors], axis=-1)
        # [B, n_att, K] @ [B, K, D] -> flatten glimpses
        pooled = jnp.einsum(
            "bka,bkd->bad", attention, image_feat,
            preferred_element_type=jnp.float32,
        ).astype(image_feat.dtype)
        return pooled.reshape(pooled.shape[0], -1), attention


def text_embedding(emb_type: str, name: Optional[str] = None, **kwargs):
    """TextEmbedding dispatch (reference: :16-46)."""
    if emb_type == "identity":
        return lambda x, deterministic=True: x
    if emb_type == "vocab":
        return VocabEmbedding(
            embedding_dim=kwargs["embedding_dim"],
            vocab_size=kwargs["vocab_size"],
            pretrained=kwargs.get("pretrained"),
            name=name,
        )
    if emb_type == "preextracted":
        return PreExtractedEmbedding(kwargs["out_dim"], kwargs["base_path"])
    if emb_type == "bilstm":
        return BiLSTMTextEmbedding(
            hidden_dim=kwargs["hidden_dim"],
            num_layers=kwargs.get("num_layers", 1),
            dropout=kwargs.get("dropout", 0.0),
            bidirectional=kwargs.get("bidirectional", False),
            rnn_type=kwargs.get("rnn_type", "GRU"),
            name=name,
        )
    if emb_type == "attention":
        return AttentionTextEmbedding(
            hidden_dim=kwargs["hidden_dim"],
            num_layers=kwargs.get("num_layers", 1),
            dropout=kwargs.get("dropout", 0.0),
            conv1_out=kwargs["conv1_out"],
            conv2_out=kwargs["conv2_out"],
            kernel_size=kwargs["kernel_size"],
            padding=kwargs["padding"],
            bidirectional=kwargs.get("bidirectional", False),
            name=name,
        )
    if emb_type == "torch":
        return VocabEmbedding(
            embedding_dim=kwargs["embedding_dim"],
            vocab_size=kwargs["vocab_size"],
            name=name,
        )
    raise NotImplementedError(f"Unknown question embedding {emb_type!r}")
