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


# ---------------------------------------------------------------------------
# fused post-attention block
# ---------------------------------------------------------------------------


def _block_case(rows=70, d=128, m=256, seed=1, dtype=jnp.float32):
    r = jax.random.split(jax.random.key(seed), 12)
    x_q = jax.random.normal(r[0], (2, rows, d), dtype)
    ctx = jax.random.normal(r[1], (2, rows, d), dtype)
    wo = jax.random.normal(r[2], (d, d), jnp.float32) * 0.05
    bo = jax.random.normal(r[3], (d,), jnp.float32) * 0.05
    s1 = 1.0 + jax.random.normal(r[4], (d,), jnp.float32) * 0.05
    g1 = jax.random.normal(r[5], (d,), jnp.float32) * 0.05
    w1 = jax.random.normal(r[6], (d, m), jnp.float32) * 0.05
    b1 = jax.random.normal(r[7], (m,), jnp.float32) * 0.05
    w2 = jax.random.normal(r[8], (m, d), jnp.float32) * 0.05
    b2 = jax.random.normal(r[9], (d,), jnp.float32) * 0.05
    s2 = 1.0 + jax.random.normal(r[10], (d,), jnp.float32) * 0.05
    g2 = jax.random.normal(r[11], (d,), jnp.float32) * 0.05
    return (x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2)


def test_fused_block_matches_reference():
    from vitxtgqa_tpu.ops.pallas_ffn import block_reference, fused_block

    args = _block_case()
    got = fused_block(*args, interpret=True)
    want = block_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_fused_block_grads_match_reference():
    from vitxtgqa_tpu.ops.pallas_ffn import block_reference, fused_block

    args = _block_case(rows=20, d=128, m=128)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(fused_block(*a, interpret=True)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(block_reference(*a)))

    g1 = jax.grad(loss_fused, argnums=tuple(range(12)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(12)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
        )


def test_block_reference_matches_flax_finish():
    """block_reference must reproduce TransformerLayer._finish's fallback
    (flax Dense + LayerNorm) so the kernel path equals the module path."""
    from vitxtgqa_tpu.models.common import TransformerConfig, TransformerLayer
    from vitxtgqa_tpu.ops.masks import MaskSpec
    from vitxtgqa_tpu.ops.pallas_ffn import block_reference

    cfg = TransformerConfig(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=128,
    )
    layer = TransformerLayer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 10, 64))
    spec = MaskSpec(key_mask=jnp.ones((2, 10), jnp.float32))
    params = layer.init(jax.random.key(1), x, spec)["params"]
    want = layer.apply({"params": params}, x, spec)

    # recompute through block_reference using the same params
    import flax.linen as fl_nn  # noqa: F401
    from vitxtgqa_tpu.ops.attention import mha_merged

    def manual(params, x):
        dt = x.dtype
        q = x @ params["query"]["kernel"] + params["query"]["bias"]
        k = x @ params["key"]["kernel"] + params["key"]["bias"]
        v = x @ params["value"]["kernel"] + params["value"]["bias"]
        ctx = mha_merged(q, k, v, spec, 4)
        return block_reference(
            x, ctx, params["attn_out"]["kernel"], params["attn_out"]["bias"],
            params["attn_ln"]["scale"], params["attn_ln"]["bias"],
            params["ffn_in"]["kernel"], params["ffn_in"]["bias"],
            params["ffn_out"]["kernel"], params["ffn_out"]["bias"],
            params["ffn_ln"]["scale"], params["ffn_ln"]["bias"],
            eps=cfg.layer_norm_eps,
        )

    got = manual(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_fused_block_tanh_matches_reference():
    from vitxtgqa_tpu.ops.pallas_ffn import (
        block_tanh_reference,
        fused_block_tanh,
    )

    args = _block_case()
    res = jax.random.normal(jax.random.key(7), args[0].shape, args[0].dtype)
    got = fused_block_tanh(res, *args, interpret=True)
    want = block_tanh_reference(res, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_encoder_tanh_residual_base_matches_manual():
    """enc(x, tanh_residual_base=x) == x + tanh(enc(x)) on every code path
    (plain, remat) — the T2S QTV joint-residual contract."""
    from vitxtgqa_tpu.models import common as C
    from vitxtgqa_tpu.ops.masks import MaskSpec

    cfg = C.TransformerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64,
    )
    enc = C.TransformerEncoder(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 12, 32))
    spec = MaskSpec(key_mask=jnp.ones((2, 12), jnp.float32))
    params = enc.init(jax.random.key(1), x, spec)["params"]
    want = x + jnp.tanh(enc.apply({"params": params}, x, spec))
    for mode in (False, "attn"):
        C.set_remat(mode)
        try:
            got = enc.apply(
                {"params": params}, x, spec, True, tanh_residual_base=x
            )
        finally:
            C.set_remat(False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6, err_msg=str(mode)
        )
