"""Fused FFN kernel vs the unfused XLA expression (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vitxtgqa_tpu.ops.pallas_ffn import ffn_reference, fused_ffn


def _case(rows=70, d=128, m=256, seed=0, dtype=jnp.float32):
    r = jax.random.split(jax.random.key(seed), 5)
    x = jax.random.normal(r[0], (2, rows, d), dtype)
    w1 = jax.random.normal(r[1], (d, m), jnp.float32) * 0.05
    b1 = jax.random.normal(r[2], (m,), jnp.float32) * 0.05
    w2 = jax.random.normal(r[3], (m, d), jnp.float32) * 0.05
    b2 = jax.random.normal(r[4], (d,), jnp.float32) * 0.05
    return x, w1, b1, w2, b2


def test_fused_ffn_matches_reference():
    x, w1, b1, w2, b2 = _case()
    got = fused_ffn(x, w1, b1, w2, b2, interpret=True)
    want = ffn_reference(x, w1, b1, w2, b2)
    # erf approximation: max abs err 1.5e-7 on erf -> small output delta
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_fused_ffn_row_padding():
    # rows not a multiple of the block: exercises the pad/unpad path
    x, w1, b1, w2, b2 = _case(rows=37)
    got = fused_ffn(x, w1, b1, w2, b2, interpret=True)
    want = ffn_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_fused_ffn_bf16():
    x, w1, b1, w2, b2 = _case(dtype=jnp.bfloat16)
    got = fused_ffn(x, w1, b1, w2, b2, interpret=True)
    want = ffn_reference(x, w1, b1, w2, b2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


def test_fused_ffn_grads_match_reference():
    x, w1, b1, w2, b2 = _case()

    def loss_fused(*a):
        return jnp.sum(jnp.sin(fused_ffn(*a, interpret=True)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ffn_reference(*a)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )
