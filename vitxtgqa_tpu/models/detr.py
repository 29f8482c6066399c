"""DETR-style transformer decoder stack used by TranSTR.

(reference: pythia/modules/transtr_module/multimodal_transformer.py and
attention.py — post-LN layers, relu FFN, cross-attention weights averaged
over heads returned for the top-k sorters.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.ops.attention import merge_heads, split_heads


class DetrAttention(nn.Module):
    """MHA that can return head-averaged attention weights; `key_mask` uses
    1=valid semantics (reference: attention.py:61-63 inverts before fill)."""

    dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, key, value, key_mask=None,
                 deterministic: bool = True, return_weights: bool = False):
        h = self.num_heads
        q = split_heads(nn.Dense(self.dim, name="q_lin")(query), h)
        k = split_heads(nn.Dense(self.dim, name="k_lin")(key), h)
        v = split_heads(nn.Dense(self.dim, name="v_lin")(value), h)
        dh = self.dim // h
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q / jnp.sqrt(jnp.asarray(dh, q.dtype)), k,
            preferred_element_type=jnp.float32,
        )
        if key_mask is not None:
            scores = jnp.where(
                key_mask[:, None, None, :] > 0, scores, -jnp.inf
            )
        weights = jax.nn.softmax(scores, axis=-1)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = nn.Dense(self.dim, name="out_lin")(merge_heads(ctx))
        if return_weights:
            return out, weights.mean(axis=1)
        return out


class DetrDecoderLayer(nn.Module):
    """Post-LN decoder layer: query self-attn, cross-attn (weights out), FFN
    (reference: multimodal_transformer.py:119-172)."""

    dim: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, memory_key_mask=None, query_pos=None,
                 deterministic: bool = True):
        qk = tgt if query_pos is None else tgt + query_pos
        sa = DetrAttention(self.dim, self.num_heads, self.dropout,
                           name="self_attn")(
            qk, qk, tgt, deterministic=deterministic
        )
        tgt = nn.LayerNorm(name="norm1")(
            tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        )
        q = tgt if query_pos is None else tgt + query_pos
        ca, weights = DetrAttention(self.dim, self.num_heads, self.dropout,
                                    name="cross_attn")(
            q, memory, memory, key_mask=memory_key_mask,
            deterministic=deterministic, return_weights=True,
        )
        tgt = nn.LayerNorm(name="norm2")(
            tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        )
        ffn = nn.Dense(self.ffn_dim, name="linear1")(tgt)
        ffn = nn.Dropout(self.dropout)(nn.relu(ffn), deterministic=deterministic)
        ffn = nn.Dense(self.dim, name="linear2")(ffn)
        tgt = nn.LayerNorm(name="norm3")(
            tgt + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        )
        return tgt, weights


class DetrDecoder(nn.Module):
    """Layer stack + final LN; returns (output, last cross-attn weights)."""

    dim: int
    num_heads: int
    num_layers: int
    ffn_dim: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, memory_key_mask=None, query_pos=None,
                 deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        weights = None
        for i in range(self.num_layers):
            tgt, weights = DetrDecoderLayer(
                self.dim, self.num_heads, self.ffn_dim, self.dropout,
                name=f"layer_{i}",
            )(tgt, memory, memory_key_mask, query_pos, deterministic)
        tgt = nn.LayerNorm(name="norm")(tgt)
        return tgt, weights


class FeatureResizer(nn.Module):
    """Linear + LN + dropout (reference: multimodal_transformer.py:180-199)."""

    out_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=1e-12)(nn.Dense(self.out_dim)(x))
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
