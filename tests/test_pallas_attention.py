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


def test_flash_row_offset_query_shards():
    """Sequence-parallel composition: running each L/sp query shard with
    row_offset must reproduce the full-sequence result shard by shard
    (parallel/sequence_parallel.py routes SP shards through this path)."""
    b, h, lenc, dec = 1, 2, 122, 6
    l = lenc + dec  # 128 -> two shards of 64
    q, k, v = _qkv(b=b, h=h, l=l, d=16, seed=9)
    enc_mask = (jnp.arange(lenc)[None, :] < 100).astype(jnp.float32)
    spec = joint_mask_spec(enc_mask, dec)
    want = np.asarray(
        flash_attention(q, k, v, spec.key_mask, dec_len=dec, interpret=True)
    )
    n_shards = 2
    l_local = l // n_shards
    for s in range(n_shards):
        got = flash_attention(
            q[:, :, s * l_local : (s + 1) * l_local], k, v, spec.key_mask,
            dec_len=dec, interpret=True,
            row_offset=jnp.int32(s * l_local),
        )
        np.testing.assert_allclose(
            np.asarray(got), want[:, :, s * l_local : (s + 1) * l_local],
            atol=2e-5, err_msg=f"shard {s}",
        )


def test_flash_row_offset_grads_match_full():
    """dq of a row-offset shard == the corresponding rows of full dq; dk/dv
    shards sum to the full dk/dv (what shard_map's psum delivers)."""
    b, h, lenc, dec = 1, 1, 58, 6
    l = lenc + dec
    q, k, v = _qkv(b=b, h=h, l=l, d=8, seed=4)
    enc_mask = (jnp.arange(lenc)[None, :] < 50).astype(jnp.float32)
    spec = joint_mask_spec(enc_mask, dec)

    def full_loss(q, k, v):
        out = flash_attention(q, k, v, spec.key_mask, dec_len=dec,
                              interpret=True)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

    dq_full, dk_full, dv_full = jax.grad(full_loss, argnums=(0, 1, 2))(q, k, v)

    l_local = l // 2
    dk_sum = jnp.zeros_like(dk_full)
    dv_sum = jnp.zeros_like(dv_full)
    for s in range(2):
        q_s = q[:, :, s * l_local : (s + 1) * l_local]

        def shard_loss(q_s, k, v, s=s):
            out = flash_attention(
                q_s, k, v, spec.key_mask, dec_len=dec, interpret=True,
                row_offset=jnp.int32(s * l_local),
            )
            return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

        dq_s, dk_s, dv_s = jax.grad(shard_loss, argnums=(0, 1, 2))(q_s, k, v)
        np.testing.assert_allclose(
            np.asarray(dq_s),
            np.asarray(dq_full[:, :, s * l_local : (s + 1) * l_local]),
            atol=2e-5,
        )
        dk_sum = dk_sum + dk_s
        dv_sum = dv_sum + dv_s
    np.testing.assert_allclose(np.asarray(dk_sum), np.asarray(dk_full), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv_sum), np.asarray(dv_full), atol=2e-5)


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


def test_flash_backward_matches_reference_grads():
    b, h, lenc, dec = 2, 2, 40, 6
    l = lenc + dec
    q, k, v = _qkv(b=b, h=h, l=l, d=16, seed=7)
    enc_mask = (jnp.arange(lenc)[None, :] < jnp.asarray([[33], [40]])).astype(
        jnp.float32
    )
    spec = joint_mask_spec(enc_mask, dec)

    f = lambda q, k, v: flash_attention(
        q, k, v, spec.key_mask, dec_len=dec, interpret=True
    ).sum()
    ref = lambda q, k, v: mha_reference(
        q, k, v, prefix_lm_bias(enc_mask, dec)
    ).sum()
    g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


def test_flash_backward_multi_block_accumulation():
    """dk/dv accumulate across q-blocks in resident output blocks."""
    b, h, lenc, dec = 1, 2, 250, 6
    l = lenc + dec
    q, k, v = _qkv(b=b, h=h, l=l, d=16, seed=8)
    enc_mask = (jnp.arange(lenc)[None, :] < 200).astype(jnp.float32)
    spec = joint_mask_spec(enc_mask, dec)

    f = lambda q, k, v: (flash_attention(
        q, k, v, spec.key_mask, dec_len=dec, block_q=128, interpret=True
    ) * jnp.arange(l)[None, None, :, None]).sum()
    ref = lambda q, k, v: (mha_reference(
        q, k, v, prefix_lm_bias(enc_mask, dec)
    ) * jnp.arange(l)[None, None, :, None]).sum()
    g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-4, rtol=1e-4
        )


_ON_TPU = jax.default_backend() in ("tpu", "axon")
_TPU_ONLY = pytest.mark.skipif(
    not _ON_TPU,
    reason="in-kernel PRNG returns zeros in CPU interpret mode; validated "
    "on hardware by scripts/validate_dropout_kernel.py",
)


@_TPU_ONLY
def test_flash_dropout_semantics():
    q, k, v = _qkv(l=40, d=16, seed=9)
    mask = jnp.ones((2, 40), jnp.float32)
    seed = jnp.int32(42)

    kw = dict(dec_len=0)
    base = flash_attention(q, k, v, mask, **kw)
    # rate=0 ignores the seed entirely
    np.testing.assert_array_equal(
        np.asarray(flash_attention(q, k, v, mask, dropout_rate=0.0,
                                   dropout_seed=seed, **kw)),
        np.asarray(base),
    )
    # deterministic per seed, different across seeds, differs from no-drop
    d1 = flash_attention(q, k, v, mask, dropout_rate=0.3, dropout_seed=seed, **kw)
    d2 = flash_attention(q, k, v, mask, dropout_rate=0.3, dropout_seed=seed, **kw)
    d3 = flash_attention(q, k, v, mask, dropout_rate=0.3,
                         dropout_seed=jnp.int32(7), **kw)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert not np.allclose(np.asarray(d1), np.asarray(d3))
    assert not np.allclose(np.asarray(d1), np.asarray(base))
    # expectation preserved: mean over many seeds approaches the no-drop
    # output (keep-prob rescaling)
    acc = np.zeros_like(np.asarray(base))
    n = 24
    for s in range(n):
        acc += np.asarray(
            flash_attention(q, k, v, mask, dropout_rate=0.3,
                            dropout_seed=jnp.int32(s), **kw)
        )
    np.testing.assert_allclose(acc / n, np.asarray(base), atol=0.25)


@_TPU_ONLY
def test_flash_dropout_backward_consistent():
    """The backward kernel regenerates the same dropout pattern: grads match
    finite differences of the (deterministic, seeded) forward."""
    b, h, l, d = 1, 1, 16, 8
    q, k, v = _qkv(b=b, h=h, l=l, d=d, seed=10)
    mask = jnp.ones((b, l), jnp.float32)
    seed = jnp.int32(3)

    def f(q):
        return flash_attention(
            q, k, v, mask, dropout_rate=0.4, dropout_seed=seed,
        ).sum()

    g = jax.grad(f)(q)
    # directional finite difference
    rng = np.random.RandomState(0)
    direction = rng.randn(*q.shape).astype(np.float32)
    eps = 1e-3
    num = (f(q + eps * direction) - f(q - eps * direction)) / (2 * eps)
    ana = float(jnp.sum(g * direction))
    np.testing.assert_allclose(num, ana, rtol=2e-2)


def test_mha_routes_mask_spec_to_flash_kernel(monkeypatch):
    """Wiring: with pallas enabled on a TPU backend, a MaskSpec + dropout
    call reaches flash_attention with the in-kernel dropout args."""
    import vitxtgqa_tpu.ops.attention as attn_mod
    import vitxtgqa_tpu.ops.pallas_attention as pk

    calls = {}

    def fake_flash(q, k, v, key_mask, dec_len=0, block_q=0, interpret=False,
                   dropout_rate=0.0, dropout_seed=None):
        calls["args"] = dict(dec_len=dec_len, dropout_rate=dropout_rate,
                             has_seed=dropout_seed is not None)
        return q

    monkeypatch.setattr(pk, "flash_attention", fake_flash)
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(attn_mod, "_PALLAS_MIN_KV", 8)

    b, h, lenc, dec = 1, 2, 26, 6
    l = lenc + dec
    q, k, v = _qkv(b=b, h=h, l=l, d=16, seed=11)
    enc_mask = jnp.ones((b, lenc), jnp.float32)
    spec = joint_mask_spec(enc_mask, dec)

    attn_mod.mha(q, k, v, spec, use_pallas=True)
    assert calls["args"] == {"dec_len": dec, "dropout_rate": 0.0,
                             "has_seed": False}

    attn_mod.mha(q, k, v, spec, dropout_rate=0.1,
                 dropout_rng=jax.random.key(0), use_pallas=True)
    assert calls["args"]["dropout_rate"] == 0.1 and calls["args"]["has_seed"]


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


# ---------------------------------------------------------------------------
# decode-step kernel
# ---------------------------------------------------------------------------


def _decode_case(b=3, h=4, l_enc=96, dec_len=12, d=32, seed=3,
                 dtype=jnp.float32):
    """Unified-cache decode setup in merged-head layout: cache
    [B, Lenc+dec, H*D], encoder-valid key_mask, a random fill of the
    decoder slots already written."""
    from vitxtgqa_tpu.ops.masks import DecodeStepSpec

    l = l_enc + dec_len
    r = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(r[0], (b, 1, h * d), dtype)
    k = jax.random.normal(r[1], (b, l, h * d), dtype)
    v = jax.random.normal(r[2], (b, l, h * d), dtype)
    lengths = jnp.asarray([l_enc, l_enc - 17, l_enc - 40])[:, None]
    enc_mask = (jnp.arange(l_enc)[None, :] < lengths).astype(jnp.float32)
    key_mask = jnp.pad(enc_mask, ((0, 0), (0, dec_len)))
    spec = lambda t: DecodeStepSpec(
        key_mask=key_mask, step=jnp.int32(t), write_offset=l_enc
    )
    return q, k, v, key_mask, spec


def _decode_reference(q, k, v, num_heads, bias):
    from vitxtgqa_tpu.ops.attention import merge_heads, split_heads

    return merge_heads(
        mha_reference(
            split_heads(q, num_heads), split_heads(k, num_heads),
            split_heads(v, num_heads), bias,
        )
    )


def test_decode_spec_bias_matches_decode_step_bias():
    from vitxtgqa_tpu.ops.masks import decode_step_bias

    _, _, _, key_mask, spec = _decode_case()
    l_enc, dec_len = 96, 12
    enc_mask = key_mask[:, :l_enc]
    for t in (0, 5, 11):
        np.testing.assert_array_equal(
            np.asarray(spec(t).to_bias()),
            np.asarray(decode_step_bias(enc_mask, jnp.int32(t), dec_len)),
        )


@pytest.mark.parametrize("t", [0, 4, 11])
def test_decode_attention_matches_reference(t):
    from vitxtgqa_tpu.ops.pallas_attention import decode_attention

    q, k, v, key_mask, spec = _decode_case()
    got = decode_attention(
        q, k, v, key_mask, jnp.int32(t), write_offset=96, num_heads=4,
        interpret=True,
    )
    want = _decode_reference(q, k, v, 4, spec(t).to_bias())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5
    )


def test_decode_attention_bf16_lane_unaligned():
    # L = 108 forces in-call lane padding; bf16 exercises the serving dtype
    from vitxtgqa_tpu.ops.pallas_attention import decode_attention

    q, k, v, key_mask, spec = _decode_case(dtype=jnp.bfloat16)
    got = decode_attention(
        q, k, v, key_mask, jnp.int32(7), write_offset=96, num_heads=4,
        interpret=True,
    )
    want = _decode_reference(q, k, v, 4, spec(7).to_bias())
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


def test_decode_mha_falls_back_on_cpu():
    """On non-TPU backends decode_mha must route the DecodeStepSpec through
    the XLA path with identical semantics."""
    from vitxtgqa_tpu.ops.attention import decode_mha

    q, k, v, key_mask, spec = _decode_case()
    got = decode_mha(q, k, v, spec(6), num_heads=4)
    want = _decode_reference(q, k, v, 4, spec(6).to_bias())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


# ---------------------------------------------------------------------------
# merged-head full-sequence flash kernel
# ---------------------------------------------------------------------------


def _merged_case(b=2, h=4, l_enc=52, dec=12, d=16, seed=5, dtype=jnp.float32):
    from vitxtgqa_tpu.ops.masks import joint_mask_spec

    l = l_enc + dec
    r = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(r[0], (b, l, h * d), dtype)
    k = jax.random.normal(r[1], (b, l, h * d), dtype)
    v = jax.random.normal(r[2], (b, l, h * d), dtype)
    enc_mask = (jnp.arange(l_enc)[None, :] < jnp.asarray([[40], [52]])).astype(
        jnp.float32
    )
    spec = joint_mask_spec(enc_mask, dec)
    return q, k, v, spec


def test_flash_merged_matches_reference():
    from vitxtgqa_tpu.ops.pallas_attention import flash_attention_merged

    q, k, v, spec = _merged_case()
    got = flash_attention_merged(
        q, k, v, spec.key_mask, spec.dec_len, num_heads=4, interpret=True
    )
    want = _decode_reference(q, k, v, 4, spec.to_bias())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_merged_blocked_q():
    from vitxtgqa_tpu.ops.pallas_attention import flash_attention_merged

    q, k, v, spec = _merged_case(l_enc=244, dec=12)
    got = flash_attention_merged(
        q, k, v, spec.key_mask, spec.dec_len, num_heads=4, block_q=128,
        interpret=True,
    )
    want = _decode_reference(q, k, v, 4, spec.to_bias())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_merged_grads_match_reference():
    from vitxtgqa_tpu.ops.pallas_attention import flash_attention_merged

    q, k, v, spec = _merged_case()

    def loss_merged(q, k, v):
        out = flash_attention_merged(
            q, k, v, spec.key_mask, spec.dec_len, num_heads=4, interpret=True
        )
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = _decode_reference(q, k, v, 4, spec.to_bias())
        return jnp.sum(out * jnp.cos(out))

    g1 = jax.grad(loss_merged, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_mha_merged_fallback_matches_split_path():
    from vitxtgqa_tpu.ops.attention import mha_merged

    q, k, v, spec = _merged_case()
    got = mha_merged(q, k, v, spec, num_heads=4)
    want = _decode_reference(q, k, v, 4, spec.to_bias())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


# ---------------------------------------------------------------------------
# int8 decode cache
# ---------------------------------------------------------------------------


def test_quantize_kv_roundtrip_error_bound():
    from vitxtgqa_tpu.ops.attention import dequantize_kv, quantize_kv

    x = jax.random.normal(jax.random.key(0), (2, 50, 8 * 16))
    q8, s = quantize_kv(x)
    assert q8.dtype == jnp.int8 and s.shape == (2, 50)
    back = dequantize_kv(q8, s)
    # symmetric int8: error <= scale/2 = max|token row| / 254
    bound = (jnp.max(jnp.abs(x), axis=-1) / 253.9)[..., None]
    err = jnp.abs(back - x)
    assert float(jnp.max(err - bound)) <= 1e-6


def test_decode_attention_int8_close_to_fp():
    from vitxtgqa_tpu.ops.attention import quantize_kv
    from vitxtgqa_tpu.ops.pallas_attention import decode_attention_int8

    q, k, v, key_mask, spec = _decode_case()
    k8, ks = quantize_kv(k, 4)
    v8, vs = quantize_kv(v, 4)
    got = decode_attention_int8(
        q, k8, ks, v8, vs, key_mask, jnp.int32(5), write_offset=96,
        num_heads=4, interpret=True,
    )
    want = _decode_reference(q, k, v, 4, spec(5).to_bias())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_decode_mha_int8_fallback_matches_dequantized():
    from vitxtgqa_tpu.ops.attention import decode_mha, dequantize_kv, quantize_kv

    q, k, v, key_mask, spec = _decode_case()
    k_t, v_t = quantize_kv(k, 4), quantize_kv(v, 4)
    got = decode_mha(q, k_t, v_t, spec(3), num_heads=4)
    want = _decode_reference(
        q, dequantize_kv(*k_t, 4), dequantize_kv(*v_t, 4), 4,
        spec(3).to_bias(),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_merged_q8_matches_separate_quantize():
    """The fused int8-cache emission bit-matches quantize_kv on the same
    K/V, and the attention output matches the plain merged kernel."""
    from vitxtgqa_tpu.ops.attention import quantize_kv
    from vitxtgqa_tpu.ops.pallas_attention import (
        flash_attention_merged,
        flash_attention_merged_q8,
    )

    b, l, h, d = 2, 256, 4, 16
    r = jax.random.split(jax.random.key(11), 4)
    q = jax.random.normal(r[0], (b, l, h * d))
    k = jax.random.normal(r[1], (b, l, h * d))
    v = jax.random.normal(r[2], (b, l, h * d))
    mask = (jax.random.uniform(r[3], (b, l)) > 0.2).astype(jnp.float32)
    out, (k8, ks), (v8, vs) = flash_attention_merged_q8(
        q, k, v, mask, dec_len=8, num_heads=h, interpret=True
    )
    want = flash_attention_merged(q, k, v, mask, dec_len=8, num_heads=h,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)
    wk8, wks = quantize_kv(k)
    wv8, wvs = quantize_kv(v)
    np.testing.assert_array_equal(np.asarray(k8), np.asarray(wk8))
    np.testing.assert_array_equal(np.asarray(v8), np.asarray(wv8))
    np.testing.assert_allclose(np.asarray(ks), np.asarray(wks), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(wvs), rtol=1e-6)


def test_ptr_scores_int8_matches_dequantized():
    from vitxtgqa_tpu.ops.attention import dequantize_kv, quantize_kv
    from vitxtgqa_tpu.ops.pallas_attention import ptr_scores_int8

    r = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(r[0], (2, 1, 64))
    k = jax.random.normal(r[1], (2, 70, 64))
    mask = (jax.random.uniform(r[2], (2, 70)) > 0.3).astype(jnp.float32)
    k8, ks = quantize_kv(k)
    got = ptr_scores_int8(q, k8, ks, mask, interpret=True)
    want = jnp.einsum(
        "bsd,bnd->bsn", q, dequantize_kv(k8, ks),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(64.0) + mask[:, None, :]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_greedy_decode_int8_argmax_stability():
    """Model-level: int8 cache greedy decode picks the same tokens as the
    fp cache on a small trained-scale example (CPU fallback path)."""
    from vitxtgqa_tpu.models.common import set_kv_cache_int8
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch, tiny_model_config

    frames, opf = 8, 3
    cfg = tiny_model_config(hidden=64, frames=frames, ocr_per_frame=opf)
    num_final = 32 + frames * opf
    model = T2S(config=cfg, num_final_outputs=num_final, bos_idx=2,
                inference_only=True)
    batch = synthetic_batch(
        batch=3, frames=frames, ocr_per_frame=opf, dec_steps=4,
        text_len=10, video_feat_dim=32, fasttext_dim=16, phoc_dim=24,
        num_final_outputs=num_final, text_vocab=128,
    )
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    params = model.init(rngs, batch, train=True)["params"]

    def run():
        out = model.apply({"params": params}, batch, train=False,
                          rngs={"gumbel": jax.random.key(3)})
        return np.asarray(jnp.argmax(out["pos_scores"], axis=-1))

    base = run()
    set_kv_cache_int8(True)
    try:
        quant = run()
    finally:
        set_kv_cache_int8(False)
    assert (base == quant).mean() > 0.9, (base, quant)


def test_flash_merged_dropout_grads_interpret():
    """Merged bwd kernel (no dropout — CPU interpret PRNG returns zeros)
    must match reference grads; multi-block accumulation exercised."""
    from vitxtgqa_tpu.ops.pallas_attention import flash_attention_merged

    q, k, v, spec = _merged_case(l_enc=244, dec=12)

    def loss_merged(q, k, v):
        out = flash_attention_merged(
            q, k, v, spec.key_mask, spec.dec_len, num_heads=4, block_q=128,
            interpret=True,
        )
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = _decode_reference(q, k, v, 4, spec.to_bias())
        return jnp.sum(out * jnp.cos(out))

    g1 = jax.grad(loss_merged, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )


def test_ptr_scores_int8_batch_tiled_matches():
    """Batch-tiled grid (incl. non-divisible batch) must be bit-identical
    to the per-row form on the same inputs."""
    from vitxtgqa_tpu.ops.attention import dequantize_kv, quantize_kv
    from vitxtgqa_tpu.ops.pallas_attention import ptr_scores_int8

    r = jax.random.split(jax.random.key(11), 3)
    b = 5  # not a multiple of the tile: exercises the batch pad path
    q = jax.random.normal(r[0], (b, 1, 64))
    k = jax.random.normal(r[1], (b, 70, 64))
    mask = (jax.random.uniform(r[2], (b, 70)) > 0.3).astype(jnp.float32)
    k8, ks = quantize_kv(k)
    want = jnp.einsum(
        "bsd,bnd->bsn", q, dequantize_kv(k8, ks),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(64.0) + mask[:, None, :]
    for tile in (1, 2, 8):
        got = ptr_scores_int8(q, k8, ks, mask, interpret=True,
                              batch_tile=tile)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4,
            err_msg=f"batch_tile={tile}",
        )


def test_decode_attention_int8_compact_geometry():
    """The compact-serving cache length (384 = 372 enc + 12 dec at
    production dims) stays on the int8 kernel path — the round-2 gate fix
    (quantized caches always take the kernel regardless of
    _PALLAS_MIN_KV)."""
    from vitxtgqa_tpu.ops.attention import quantize_kv
    from vitxtgqa_tpu.ops.pallas_attention import decode_attention_int8

    q, k, v, key_mask, spec = _decode_case(
        b=3, h=12, l_enc=372, dec_len=12, d=64
    )
    k8, ks = quantize_kv(k, 12)
    v8, vs = quantize_kv(v, 12)
    got = decode_attention_int8(
        q, k8, ks, v8, vs, key_mask, jnp.int32(3), write_offset=372,
        num_heads=12, interpret=True,
    )
    want = _decode_reference(q, k, v, 12, spec(3).to_bias())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_decode_mha_quantized_bypasses_min_kv_gate():
    """decode_mha with a quantized cache must report the kernel path as
    eligible even below _PALLAS_MIN_KV (the XLA fallback dequantizes the
    whole cache per step); on CPU it still falls back, so assert the gate
    logic directly."""
    from vitxtgqa_tpu.ops import attention as A

    assert A._PALLAS_MIN_KV > 128  # the scenario exists
    # mirror the gate expression for a quantized cache below the floor
    quantized, cache_len = True, 128
    assert quantized or cache_len >= A._PALLAS_MIN_KV


def test_flash_merged_interpret_at_compact_rows():
    """flash_attention_merged at the compact row count (384)."""
    from vitxtgqa_tpu.ops.pallas_attention import flash_attention_merged

    b, h, l, d = 2, 12, 384, 64
    r = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(r[0], (b, l, h * d))
    k = jax.random.normal(r[1], (b, l, h * d))
    v = jax.random.normal(r[2], (b, l, h * d))
    lengths = jnp.asarray([372, 233])[:, None]
    key_mask = (jnp.arange(l)[None, :] < lengths).astype(jnp.float32)
    got = flash_attention_merged(
        q, k, v, key_mask, dec_len=12, num_heads=h, interpret=True
    )
    from vitxtgqa_tpu.ops.masks import MaskSpec, joint_mask_spec
    from vitxtgqa_tpu.ops.attention import mha, merge_heads, split_heads

    bias = joint_mask_spec(key_mask[:, :-12], 12).to_bias()
    want = merge_heads(
        mha(split_heads(q, h), split_heads(k, h), split_heads(v, h), bias)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )
