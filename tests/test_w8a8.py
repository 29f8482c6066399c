"""W8A8 int8 fused block: kernel vs its quantized-math oracle, and the
quantization error bound vs the bf16 block.

The serving mode is OPT-IN (ops.attention.set_w8a8); these tests pin the
kernel's numerics on CPU (interpret mode) so a hardware A/B only has to
measure speed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_pallas_ffn import _block_case
from vitxtgqa_tpu.ops.pallas_ffn import (
    block_reference,
    block_w8a8_reference,
    fused_block_w8a8,
    quantize_weight,
)


def test_w8a8_kernel_matches_quantized_oracle():
    args = _block_case()
    got = fused_block_w8a8(*args, interpret=True)
    want = block_w8a8_reference(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4
    )


def test_w8a8_kernel_row_padding():
    args = _block_case(rows=37)
    got = fused_block_w8a8(*args, interpret=True)
    want = block_w8a8_reference(*args)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4
    )


def test_w8a8_error_vs_bf16_block_bounded():
    """Per-layer quantization error stays small relative to the bf16 block
    output (the LN at the block end renormalises, so the bound is tight)."""
    args = _block_case(rows=128, d=128, m=256)
    q = np.asarray(block_w8a8_reference(*args), np.float32)
    f = np.asarray(block_reference(*args), np.float32)
    rel = np.linalg.norm(q - f) / np.linalg.norm(f)
    assert rel < 0.03, rel


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.key(0), (64, 96), jnp.float32)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    err = np.abs(back - np.asarray(w))
    # symmetric per-channel: error bounded by half a quantization step
    step = np.asarray(s)[None, :]
    assert (err <= 0.5 * step + 1e-6).all()


def test_w8a8_flag_gates_transformer_layer(monkeypatch):
    """With w8a8 forced on and the TPU/interpret gates satisfied, the layer
    must produce the W8A8 quantized output; with it off, the bf16 path."""
    from vitxtgqa_tpu.models import common as common_mod
    from vitxtgqa_tpu.models.common import TransformerConfig, TransformerLayer
    from vitxtgqa_tpu.ops import attention as attn_mod
    from vitxtgqa_tpu.ops import pallas_ffn as ffn_mod
    from vitxtgqa_tpu.ops.masks import MaskSpec

    cfg = TransformerConfig(
        hidden_size=128, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=256,
    )
    layer = TransformerLayer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 2048, 128))
    spec = MaskSpec(key_mask=jnp.ones((2, 2048), jnp.float32))
    params = layer.init(jax.random.key(1), x, spec)["params"]
    plain = layer.apply({"params": params}, x, spec)

    # force the fused-block gates open on CPU: pretend TPU, run interpret
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(attn_mod, "_GLOBAL_USE_PALLAS", True)
    import functools

    monkeypatch.setattr(
        ffn_mod, "fused_block",
        functools.partial(ffn_mod.fused_block, interpret=True),
    )
    monkeypatch.setattr(
        ffn_mod, "fused_block_w8a8",
        functools.partial(ffn_mod.fused_block_w8a8, interpret=True),
    )
    # attention itself would also route to pallas under these gates; keep
    # the einsum core by capping the kernel's min-kv gate out of reach
    monkeypatch.setattr(attn_mod, "_PALLAS_MIN_KV", 1 << 30)

    monkeypatch.setattr(attn_mod, "_GLOBAL_W8A8", False)
    bf16_out = layer.apply({"params": params}, x, spec)
    monkeypatch.setattr(attn_mod, "_GLOBAL_W8A8", True)
    w8a8_out = layer.apply({"params": params}, x, spec)

    plain, bf16_out, w8a8_out = (
        np.asarray(a, np.float32) for a in (plain, bf16_out, w8a8_out)
    )
    # fused bf16 block == plain module path (erf approx tolerance)
    np.testing.assert_allclose(bf16_out, plain, atol=5e-4, rtol=1e-3)
    # w8a8 differs from bf16 (it actually quantized) but stays close
    assert np.abs(w8a8_out - bf16_out).max() > 1e-6
    rel = np.linalg.norm(w8a8_out - bf16_out) / np.linalg.norm(bf16_out)
    assert rel < 0.03, rel
