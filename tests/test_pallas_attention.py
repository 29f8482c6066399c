"""Pallas fused attention vs the einsum reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitxtgqa_tpu.ops.attention import mha_reference
from vitxtgqa_tpu.ops.masks import prefix_lm_bias, self_attention_bias
from vitxtgqa_tpu.ops.pallas_attention import fused_attention


def _qkv(b=2, h=3, l=70, d=24, seed=0):
    r = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(r[0], (b, h, l, d))
    k = jax.random.normal(r[1], (b, h, l, d))
    v = jax.random.normal(r[2], (b, h, l, d))
    return q, k, v


def test_no_bias_matches_reference():
    q, k, v = _qkv()
    got = fused_attention(q, k, v, interpret=True)
    want = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_key_mask_bias():
    q, k, v = _qkv(l=50)
    mask = (jnp.arange(50)[None, :] < jnp.asarray([[30], [45]])).astype(jnp.float32)
    bias = self_attention_bias(mask.reshape(2, 50))
    got = fused_attention(q, k, v, bias, interpret=True)
    want = mha_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_full_prefix_lm_bias():
    b, h, lenc, dec = 2, 2, 40, 6
    l = lenc + dec
    q, k, v = _qkv(b=b, h=h, l=l, d=16)
    enc_mask = (jnp.arange(lenc)[None, :] < jnp.asarray([[33], [40]])).astype(
        jnp.float32
    )
    bias = prefix_lm_bias(enc_mask, dec)
    got = fused_attention(q, k, v, bias, interpret=True)
    want = mha_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bf16_inputs():
    q, k, v = _qkv(l=64, d=32)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    got = fused_attention(q, k, v, interpret=True)
    want = mha_reference(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )
