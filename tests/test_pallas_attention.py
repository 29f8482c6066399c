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


# ---------------------------------------------------------------------------
# flash_attention: in-kernel mask construction
# ---------------------------------------------------------------------------

from vitxtgqa_tpu.ops.masks import MaskSpec, joint_mask_spec  # noqa: E402
from vitxtgqa_tpu.ops.pallas_attention import flash_attention  # noqa: E402


def test_flash_key_mask_only():
    q, k, v = _qkv(l=50)
    mask = (jnp.arange(50)[None, :] < jnp.asarray([[30], [45]])).astype(jnp.float32)
    got = flash_attention(q, k, v, mask, dec_len=0, interpret=True)
    want = mha_reference(q, k, v, self_attention_bias(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_prefix_lm():
    b, h, lenc, dec = 2, 2, 40, 6
    l = lenc + dec
    q, k, v = _qkv(b=b, h=h, l=l, d=16)
    enc_mask = (jnp.arange(lenc)[None, :] < jnp.asarray([[33], [40]])).astype(
        jnp.float32
    )
    spec = joint_mask_spec(enc_mask, dec)
    got = flash_attention(q, k, v, spec.key_mask, dec_len=dec, interpret=True)
    want = mha_reference(q, k, v, prefix_lm_bias(enc_mask, dec))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_multiple_q_blocks():
    # force >1 q-block so the causal row offset per grid step is exercised
    b, h, lenc, dec = 1, 2, 250, 6
    l = lenc + dec
    q, k, v = _qkv(b=b, h=h, l=l, d=16, seed=3)
    enc_mask = (jnp.arange(lenc)[None, :] < 200).astype(jnp.float32)
    spec = joint_mask_spec(enc_mask, dec)
    got = flash_attention(
        q, k, v, spec.key_mask, dec_len=dec, block_q=128, interpret=True
    )
    want = mha_reference(q, k, v, prefix_lm_bias(enc_mask, dec))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_mask_spec_to_bias_equivalence():
    enc_mask = (jnp.arange(40)[None, :] < jnp.asarray([[33], [40]])).astype(
        jnp.float32
    )
    spec = joint_mask_spec(enc_mask, 6)
    np.testing.assert_array_equal(
        np.asarray(spec.to_bias()), np.asarray(prefix_lm_bias(enc_mask, 6))
    )
    spec0 = MaskSpec(key_mask=enc_mask)
    np.testing.assert_array_equal(
        np.asarray(spec0.to_bias()), np.asarray(self_attention_bias(enc_mask))
    )


def test_mha_accepts_mask_spec():
    from vitxtgqa_tpu.ops.attention import mha

    b, h, lenc, dec = 2, 2, 30, 4
    l = lenc + dec
    q, k, v = _qkv(b=b, h=h, l=l, d=16, seed=5)
    enc_mask = (jnp.arange(lenc)[None, :] < 25).astype(jnp.float32)
    spec = joint_mask_spec(enc_mask, dec)
    got = mha(q, k, v, spec)  # XLA path (kv < pallas threshold)
    want = mha_reference(q, k, v, prefix_lm_bias(enc_mask, dec))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )
