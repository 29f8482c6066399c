"""Attention-mask builders for the joint multimodal transformer.

The reference builds additive -10000 masks eagerly per forward
(reference: pythia/models/t2s.py:600-619 prefix-LM + causal decoder block,
t2s.py:726-742 helpers).  Here they are pure jnp functions with static
shapes, shared by every model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

NEG_INF = -10000.0  # BERT-style additive mask value (kept for parity)


@struct.dataclass
class MaskSpec:
    """Compact attention-mask description for the fused kernel path.

    key_mask: [B, L] — 1 where the key is a valid *encoder* token (decoder
        slots and padding are 0).
    dec_len: static length of the trailing causal decoder block (0 = plain
        key-validity masking).

    ``to_bias()`` materialises the same additive bias the eager builders
    produce, so the XLA path keeps bit-identical semantics while the Pallas
    path (ops/pallas_attention.flash_attention) consumes the spec directly
    and never builds an [L, L] tensor in HBM.
    """

    key_mask: jax.Array
    # static so it survives jit/remat pytree boundaries as a Python int
    dec_len: int = struct.field(pytree_node=False, default=0)

    def to_bias(self) -> jax.Array:
        if self.dec_len == 0:
            return self_attention_bias(self.key_mask)
        enc = self.key_mask[:, : self.key_mask.shape[1] - self.dec_len]
        return prefix_lm_bias(enc, self.dec_len)


def joint_mask_spec(enc_mask, dec_len: int) -> MaskSpec:
    """enc_mask [B, Lenc] -> MaskSpec over the joint [enc|dec] sequence."""
    b = enc_mask.shape[0]
    key_mask = jnp.concatenate(
        [enc_mask, jnp.zeros((b, dec_len), enc_mask.dtype)], axis=1
    )
    return MaskSpec(key_mask=key_mask, dec_len=dec_len)


def length_mask(lengths, max_len: int):
    """[B] lengths -> [B, max_len] float mask, 1 on valid positions
    (reference: t2s.py:726-732)."""
    ar = jnp.arange(max_len)[None, :]
    return (ar < lengths[:, None]).astype(jnp.float32)


def causal_mask(n: int):
    """[n, n] lower-triangular float mask (reference: t2s.py:735-742)."""
    return jnp.tril(jnp.ones((n, n), dtype=jnp.float32))


def self_attention_bias(key_mask):
    """[B, L] key mask -> [B, 1, 1, L] additive bias (broadcasts over heads
    and query positions).  Used by TextBert/QTV-style full self-attention."""
    return (1.0 - key_mask)[:, None, None, :] * NEG_INF


def prefix_lm_bias(enc_mask, dec_len: int):
    """Joint prefix-LM + causal-decoder additive bias.

    enc_mask: [B, Lenc] validity of encoder tokens (txt|obj|ocr concatenated).
    Returns [B, 1, Lenc+dec, Lenc+dec] bias where:
      - every row attends to valid encoder tokens,
      - no row attends to decoder tokens except decoder rows causally.
    (reference: t2s.py:600-619)
    """
    b, lenc = enc_mask.shape
    total = lenc + dec_len
    key_mask = jnp.concatenate(
        [enc_mask, jnp.zeros((b, dec_len), enc_mask.dtype)], axis=1
    )  # [B, total]
    full = jnp.broadcast_to(key_mask[:, None, :], (b, total, total))
    dec_block = causal_mask(dec_len)
    full = full.at[:, lenc:, lenc:].set(
        jnp.broadcast_to(dec_block[None], (b, dec_len, dec_len))
    )
    return ((1.0 - full) * NEG_INF)[:, None, :, :]


def decode_step_bias(enc_mask, step, dec_len: int):
    """Bias for one cached decode step: [B, 1, 1, Lenc+dec_len].

    The single query row (decoder position `step`) attends to valid encoder
    tokens and to decoder cache positions <= step.
    """
    b, lenc = enc_mask.shape
    dec_ok = (jnp.arange(dec_len)[None, :] <= step).astype(enc_mask.dtype)
    key_mask = jnp.concatenate(
        [enc_mask, jnp.broadcast_to(dec_ok, (b, dec_len))], axis=1
    )
    return (1.0 - key_mask)[:, None, None, :] * NEG_INF


@struct.dataclass
class DecodeStepSpec:
    """Compact mask description for one cached decode step.

    key_mask: [B, Lcache] — 1 where the cache slot holds a valid *encoder*
        key (decoder slots and padding are 0; same vector for every step).
    step: scalar int32 decoder position (traced inside the decode scan).
    write_offset: static index of decoder slot 0 inside the unified cache.

    The single query row attends to valid encoder keys and to decoder cache
    slots `write_offset .. write_offset+step`.  ``to_bias()`` materialises
    the additive bias (identical to ``decode_step_bias`` on the equivalent
    layout) for the XLA path; the Pallas decode kernel
    (ops/pallas_attention.decode_attention) consumes the spec directly, so
    no per-step [B, 1, 1, L] bias tensor is ever built in HBM.
    """

    key_mask: jax.Array
    step: jax.Array
    write_offset: int = struct.field(pytree_node=False, default=0)

    def to_bias(self) -> jax.Array:
        cols = jnp.arange(self.key_mask.shape[1])[None, :]
        dec_ok = jnp.logical_and(
            cols >= self.write_offset, cols <= self.write_offset + self.step
        )
        ok = jnp.logical_or(self.key_mask > 0, dec_ok)
        return (1.0 - ok.astype(jnp.float32))[:, None, None, :] * NEG_INF
