"""Single-kernel decode step (ops/pallas_decode_step) vs its pure-jnp
oracle and vs the production per-layer decode path (interpret mode, CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitxtgqa_tpu.models.common import TransformerConfig, TransformerEncoder
from vitxtgqa_tpu.ops.masks import DecodeStepSpec
from vitxtgqa_tpu.ops.pallas_decode_step import (
    fused_decode_step,
    fused_step_reference,
)

N_LAYERS, B, LP, H, HD, M = 2, 3, 256, 4, 16, 128
D = H * HD
WRITE_OFF = 192  # decoder slots live at [192, 192+dec)


def _rand_stacks(key, dtype):
    ks = jax.random.split(key, 18)
    mk = lambda i, shape, s=0.05: (
        jax.random.normal(ks[i], shape, jnp.float32) * s
    )
    st = {
        "wq": mk(0, (N_LAYERS, D, D)), "bq": mk(1, (N_LAYERS, 1, D)),
        "wk": mk(2, (N_LAYERS, D, D)), "bk": mk(3, (N_LAYERS, 1, D)),
        "wv": mk(4, (N_LAYERS, D, D)), "bv": mk(5, (N_LAYERS, 1, D)),
        "wo": mk(6, (N_LAYERS, D, D)), "bo": mk(7, (N_LAYERS, 1, D)),
        "s1": 1.0 + mk(8, (N_LAYERS, 1, D)), "g1": mk(9, (N_LAYERS, 1, D)),
        "w1": mk(10, (N_LAYERS, D, M)), "b1": mk(11, (N_LAYERS, 1, M)),
        "w2": mk(12, (N_LAYERS, M, D)), "b2": mk(13, (N_LAYERS, 1, D)),
        "s2": 1.0 + mk(14, (N_LAYERS, 1, D)), "g2": mk(15, (N_LAYERS, 1, D)),
    }
    return {
        k: (v.astype(dtype) if k[0] == "w" else v) for k, v in st.items()
    }


def _rand_cache(key, dtype, b=B):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    kv8 = jax.random.randint(
        k1, (N_LAYERS, b, LP, 2 * D), -127, 128, jnp.int32
    ).astype(jnp.int8)
    kvs = jax.random.uniform(
        k2, (N_LAYERS, b, 2, LP), jnp.float32, 0.001, 0.02
    )
    x_t = (jax.random.normal(k3, (b, 1, D), jnp.float32) * 0.3).astype(dtype)
    # encoder mask: first 160 rows live for each b, with some holes
    mask = (jax.random.uniform(k4, (b, LP)) > 0.2) & (
        jnp.arange(LP)[None, :] < 160
    )
    return kv8, kvs, x_t, mask.astype(jnp.float32)


@pytest.mark.parametrize("step", [0, 2])
def test_fused_step_kernel_matches_oracle(step):
    key = jax.random.key(7)
    stacks = _rand_stacks(key, jnp.float32)
    kv8, kvs, x_t, mask = _rand_cache(jax.random.key(8), jnp.float32)
    got = fused_decode_step(
        x_t, stacks, kv8, kvs, mask, jnp.int32(step), WRITE_OFF, H,
        interpret=True,
    )
    want = fused_step_reference(
        x_t, stacks, kv8, kvs, mask, step, WRITE_OFF, H
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    np.testing.assert_allclose(
        np.asarray(got[2]), np.asarray(want[2]), atol=1e-7
    )


def _encoder_and_cache(dtype):
    cfg = TransformerConfig(
        hidden_size=D, num_hidden_layers=N_LAYERS, num_attention_heads=H,
        intermediate_size=M, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, dtype=dtype, use_pallas=False,
    )
    enc = TransformerEncoder(cfg)
    x = (jax.random.normal(jax.random.key(1), (B, LP, D), jnp.float32)
         * 0.3).astype(dtype)
    mask = jnp.pad(
        jnp.ones((B, WRITE_OFF)), ((0, 0), (0, LP - WRITE_OFF))
    )
    from vitxtgqa_tpu.ops.masks import MaskSpec

    variables = enc.init(jax.random.key(0), x, MaskSpec(key_mask=mask))
    return enc, variables, x, mask


def test_fused_path_matches_per_layer_decode():
    """The packed fused-step semantics (oracle impl) must track the
    production per-layer decode_step over a multi-step rollout."""
    dec_len = 3
    enc, variables, x, mask = _encoder_and_cache(jnp.float32)

    def run_unfused(v):
        enc_h, kvs = enc.apply(
            v, x, __import__(
                "vitxtgqa_tpu.ops.masks", fromlist=["MaskSpec"]
            ).MaskSpec(key_mask=mask),
            deterministic=True, method=TransformerEncoder.encode_with_cache,
        )
        cache = enc.apply(v, kvs, method=TransformerEncoder.quantize_cache)
        ys = []
        x_t = x[:, :1] * 0.5
        for t in range(dec_len):
            bias_t = DecodeStepSpec(
                key_mask=mask, step=jnp.int32(t), write_offset=WRITE_OFF
            )
            y_t, cache = enc.apply(
                v, x_t, None, cache, jnp.int32(t), bias_t,
                method=TransformerEncoder.decode_step,
                write_offset=WRITE_OFF,
            )
            ys.append(y_t)
            x_t = y_t * 0.9  # arbitrary next-step input
        return ys

    def run_fused(v):
        from vitxtgqa_tpu.ops.masks import MaskSpec

        enc_h, kvs = enc.apply(
            v, x, MaskSpec(key_mask=mask), deterministic=True,
            method=TransformerEncoder.encode_with_cache,
        )
        cache = enc.apply(v, kvs, method=TransformerEncoder.quantize_cache)
        stacks, kv8, kvsc = enc.apply(
            v, cache, method=TransformerEncoder.fused_decode_prep
        )
        ys = []
        x_t = x[:, :1] * 0.5
        for t in range(dec_len):
            y_t, row8, rowsc = fused_step_reference(
                x_t, stacks, kv8, kvsc, mask, t, WRITE_OFF, H
            )
            pos = WRITE_OFF + t
            kv8 = jax.lax.dynamic_update_slice(kv8, row8, (0, 0, pos, 0))
            kvsc = jax.lax.dynamic_update_slice(kvsc, rowsc, (0, 0, 0, pos))
            ys.append(y_t)
            x_t = y_t * 0.9
        return ys

    ys_u = run_unfused(variables)
    ys_f = run_fused(variables)
    for t, (a, b_) in enumerate(zip(ys_u, ys_f)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-4,
            err_msg=f"step {t}",
        )


def test_fused_kernel_multi_step_rollout_interpret():
    """Full kernel (interpret) over a rollout with cache commits — checks
    the DUS write offsets line up with what the kernel reads back."""
    key = jax.random.key(17)
    stacks = _rand_stacks(key, jnp.float32)
    kv8, kvs, x_t, mask = _rand_cache(jax.random.key(18), jnp.float32)
    kv8_r, kvs_r, x_r = kv8, kvs, x_t
    for t in range(3):
        y, row8, rowsc = fused_decode_step(
            x_t, stacks, kv8, kvs, mask, jnp.int32(t), WRITE_OFF, H,
            interpret=True,
        )
        y_r, row8_r, rowsc_r = fused_step_reference(
            x_r, stacks, kv8_r, kvs_r, mask, t, WRITE_OFF, H
        )
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_r), atol=2e-5, rtol=1e-5,
            err_msg=f"step {t}",
        )
        pos = WRITE_OFF + t
        kv8 = jax.lax.dynamic_update_slice(kv8, row8, (0, 0, pos, 0))
        kvs = jax.lax.dynamic_update_slice(kvs, rowsc, (0, 0, 0, pos))
        kv8_r = jax.lax.dynamic_update_slice(kv8_r, row8_r, (0, 0, pos, 0))
        kvs_r = jax.lax.dynamic_update_slice(
            kvs_r, rowsc_r, (0, 0, 0, pos)
        )
        x_t = y * 0.9
        x_r = y_r * 0.9


def test_fused_decode_wired_into_model(monkeypatch):
    """T2S inference decode through the fused single-kernel path (interpret
    mode, fused_decode_ok patched on) must match the per-layer decode path
    bit-for-bit on the greedy trace and closely on scores."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_t2s_model import tiny_config, tiny_batch, NV, N

    from vitxtgqa_tpu.models import common as common_mod
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.ops import pallas_decode_step as pds

    batch = tiny_batch(0)
    model = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2,
                inference_only=True)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)

    def run(fused: bool):
        common_mod.set_kv_cache_int8(True)
        if fused:
            monkeypatch.setattr(
                TransformerEncoder, "fused_decode_ok", lambda self: True
            )
            monkeypatch.setattr(pds, "_FORCE_INTERPRET", True)
        try:
            return model.apply(
                variables, batch, train=False,
                rngs={"gumbel": jax.random.key(9)},
            )
        finally:
            common_mod.set_kv_cache_int8(False)
            if fused:
                monkeypatch.setattr(
                    TransformerEncoder, "fused_decode_ok",
                    TransformerEncoder.fused_decode_ok,
                )
                monkeypatch.setattr(pds, "_FORCE_INTERPRET", False)

    base = run(False)
    fused = run(True)
    ps_b = np.asarray(base["pos_scores"], np.float32)
    ps_f = np.asarray(fused["pos_scores"], np.float32)
    np.testing.assert_array_equal(ps_b.argmax(-1), ps_f.argmax(-1))
    # the fused epilogue re-orders bf16 rounding on the next-token
    # embedding, so downstream scores drift at bf16-ulp level (the greedy
    # trace above is the bit-exact contract, as for the other kernels)
    np.testing.assert_allclose(ps_f, ps_b, atol=5e-2, rtol=5e-2)


def test_fused_decode_full_eval_path(monkeypatch):
    """3-variant full-eval through the fused step (argmax crosses variant
    rows -> the epilogue kernel is gated off; the step kernel still runs)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_t2s_model import tiny_config, tiny_batch, NV, N

    from vitxtgqa_tpu.models import common as common_mod
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.ops import pallas_decode_step as pds

    batch = tiny_batch(0)
    model = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2,
                inference_only=False)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)

    def run(fused: bool):
        common_mod.set_kv_cache_int8(True)
        if fused:
            monkeypatch.setattr(
                TransformerEncoder, "fused_decode_ok", lambda self: True
            )
            monkeypatch.setattr(pds, "_FORCE_INTERPRET", True)
        try:
            return model.apply(
                variables, batch, train=False,
                rngs={"gumbel": jax.random.key(9)},
            )
        finally:
            common_mod.set_kv_cache_int8(False)
            if fused:
                monkeypatch.setattr(
                    TransformerEncoder, "fused_decode_ok",
                    TransformerEncoder.fused_decode_ok,
                )
                monkeypatch.setattr(pds, "_FORCE_INTERPRET", False)

    base = run(False)
    fused = run(True)
    for key in ("pos_scores", "ref_scores", "neg_scores"):
        a = np.asarray(base[key], np.float32)
        f = np.asarray(fused[key], np.float32)
        np.testing.assert_array_equal(
            a.argmax(-1), f.argmax(-1), err_msg=key
        )
        np.testing.assert_allclose(
            f, a, atol=5e-2, rtol=5e-2, err_msg=key
        )


def test_fused_step_kernel_batch_blocked():
    """B=8 engages the bb=8 row-blocked grid — must match the oracle."""
    stacks = _rand_stacks(jax.random.key(7), jnp.float32)
    kv8, kvs, x_t, mask = _rand_cache(jax.random.key(8), jnp.float32, b=8)
    got = fused_decode_step(
        x_t, stacks, kv8, kvs, mask, jnp.int32(1), WRITE_OFF, H,
        interpret=True,
    )
    want = fused_step_reference(
        x_t, stacks, kv8, kvs, mask, 1, WRITE_OFF, H
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    np.testing.assert_allclose(
        np.asarray(got[2]), np.asarray(want[2]), atol=1e-7
    )


def test_fused_epilogue_batch_block_consistent():
    """bb=4 row-blocked epilogue must equal the per-row (bb=1) form."""
    from vitxtgqa_tpu.ops.pallas_decode_step import fused_epilogue

    k = jax.random.split(jax.random.key(3), 10)
    bsz, d, v_fix, n, qk, s = 8, D, 70, 48, D, 4
    v_p = 128
    y = jax.random.normal(k[0], (bsz, 1, d), jnp.float32) * 0.3
    cls_w_t = jnp.zeros((d, v_p)).at[:, :v_fix].set(
        jax.random.normal(k[1], (d, v_fix)) * 0.05
    )
    cls_b = jnp.full((v_p,), -1e30).at[:v_fix].set(
        jax.random.normal(k[2], (v_fix,)) * 0.01
    )
    ptr_w = jax.random.normal(k[3], (d, qk)) * 0.05
    ptr_b = jax.random.normal(k[4], (qk,)) * 0.01
    keys = jax.random.normal(k[5], (bsz, n, qk)) * 0.2
    mask = (jax.random.uniform(k[6], (bsz, n)) > 0.4).astype(jnp.float32)
    ans = jnp.zeros((v_p, d)).at[:v_fix].set(
        jax.random.normal(k[7], (v_fix, d)) * 0.3
    )
    ocr = jax.random.normal(k[8], (bsz, n, d)) * 0.3
    emb = jax.random.normal(k[9], (2 * s, d)) * 0.1
    args = (cls_w_t, cls_b, ptr_w, ptr_b)
    full = fused_epilogue(y, *args, keys, mask, ans, ocr, emb,
                          jnp.int32(1), v_fix, 1.0 / qk ** 0.5, s,
                          interpret=True)
    for r in range(0, bsz, 3):
        one = fused_epilogue(
            y[r : r + 1], *args, keys[r : r + 1], mask[r : r + 1], ans,
            ocr[r : r + 1], emb, jnp.int32(1), v_fix, 1.0 / qk ** 0.5, s,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(full[0][r]), np.asarray(one[0][0]), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(full[1][r]), np.asarray(one[1][0])
        )
        np.testing.assert_allclose(
            np.asarray(full[2][r]), np.asarray(one[2][0]), atol=1e-5
        )
