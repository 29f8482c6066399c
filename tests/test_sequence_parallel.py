"""Sequence-parallel attention equals unsharded attention on a device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vitxtgqa_tpu.ops.attention import mha_reference
from vitxtgqa_tpu.ops.masks import self_attention_bias
from vitxtgqa_tpu.parallel.sequence_parallel import sp_attention


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sp_attention_matches_unsharded(n_shards):
    if jax.device_count() < n_shards:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))

    b, h, l, d = 2, 3, 64, 16
    r = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(r[0], (b, h, l, d))
    k = jax.random.normal(r[1], (b, h, l, d))
    v = jax.random.normal(r[2], (b, h, l, d))
    mask = (jnp.arange(l)[None, :] < 50).astype(jnp.float32).repeat(b, 0)
    bias = self_attention_bias(mask)

    want = np.asarray(mha_reference(q, k, v, bias))
    got = np.asarray(sp_attention(q, k, v, bias, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_attention_no_bias():
    if jax.device_count() < 4:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    b, h, l, d = 1, 2, 32, 8
    r = jax.random.split(jax.random.key(1), 3)
    q, k, v = (jax.random.normal(key, (b, h, l, d)) for key in r)
    want = np.asarray(mha_reference(q, k, v))
    got = np.asarray(sp_attention(q, k, v, None, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_attention_mask_spec_prefix_lm():
    """MaskSpec path: each shard rebuilds its own rows' prefix-LM bias."""
    from vitxtgqa_tpu.ops.masks import joint_mask_spec, prefix_lm_bias

    if jax.device_count() < 4:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    b, h, lenc, dec = 2, 2, 26, 6
    l = lenc + dec  # 32, divisible by 4
    r = jax.random.split(jax.random.key(2), 3)
    q, k, v = (jax.random.normal(key, (b, h, l, d)) for key, d in zip(r, [16] * 3))
    enc_mask = (jnp.arange(lenc)[None, :] < jnp.asarray([[20], [26]])).astype(
        jnp.float32
    )
    spec = joint_mask_spec(enc_mask, dec)
    want = np.asarray(mha_reference(q, k, v, prefix_lm_bias(enc_mask, dec)))
    got = np.asarray(sp_attention(q, k, v, spec, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_attention_per_row_bias():
    from vitxtgqa_tpu.ops.masks import prefix_lm_bias

    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    b, h, lenc, dec = 1, 2, 26, 6
    l = lenc + dec
    r = jax.random.split(jax.random.key(3), 3)
    q, k, v = (jax.random.normal(key, (b, h, l, 8)) for key in r)
    enc_mask = (jnp.arange(lenc)[None, :] < 22).astype(jnp.float32)
    bias = prefix_lm_bias(enc_mask, dec)
    want = np.asarray(mha_reference(q, k, v, bias))
    got = np.asarray(sp_attention(q, k, v, bias, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encoder_sequence_parallel_global_switch():
    """set_sequence_parallel makes a whole TransformerEncoder forward
    sequence-parallel with identical outputs."""
    from vitxtgqa_tpu.models.common import TransformerConfig, TransformerEncoder
    from vitxtgqa_tpu.ops.attention import set_sequence_parallel
    from vitxtgqa_tpu.ops.masks import joint_mask_spec

    if jax.device_count() < 8:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))

    cfg = TransformerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64,
    )
    enc = TransformerEncoder(cfg)
    b, lenc, dec = 2, 58, 6
    l = lenc + dec  # 64 = 8 x 8
    x = jax.random.normal(jax.random.key(4), (b, l, 32))
    enc_mask = (jnp.arange(lenc)[None, :] < 50).astype(jnp.float32).repeat(b, 0)
    spec = joint_mask_spec(enc_mask, dec)
    params = enc.init(jax.random.key(5), x, spec)

    want = np.asarray(enc.apply(params, x, spec))
    set_sequence_parallel(mesh)
    try:
        got = np.asarray(enc.apply(params, x, spec))
    finally:
        set_sequence_parallel(None)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sp_attention_flash_kernel_integration(monkeypatch):
    """The TPU fast path end to end on CPU: force the flash branch (gates
    patched, kernel in interpret mode) under the real shard_map — all-
    gathered K/V + dynamic row_offset must reproduce unsharded attention."""
    import functools

    from vitxtgqa_tpu.ops import pallas_attention as PA
    from vitxtgqa_tpu.ops.masks import joint_mask_spec, prefix_lm_bias
    import vitxtgqa_tpu.parallel.sequence_parallel as SP
    import vitxtgqa_tpu.ops.attention as A

    if jax.device_count() < 4:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))

    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    monkeypatch.setattr(A, "pallas_enabled", lambda use_pallas=False: True)
    monkeypatch.setattr(A, "_PALLAS_MIN_KV", 0)
    monkeypatch.setattr(
        PA, "flash_attention",
        functools.partial(PA.flash_attention, interpret=True),
    )

    b, h, lenc, dec = 2, 2, 122, 6
    l = lenc + dec  # 128, divisible by 4
    r = jax.random.split(jax.random.key(5), 3)
    q, k, v = (jax.random.normal(key, (b, h, l, 16)) for key in r)
    enc_mask = (jnp.arange(lenc)[None, :] < jnp.asarray([[90], [122]])).astype(
        jnp.float32
    )
    spec = joint_mask_spec(enc_mask, dec)
    want = np.asarray(mha_reference(q, k, v, prefix_lm_bias(enc_mask, dec)))
    got = np.asarray(sp_attention(q, k, v, spec, mesh))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sp_inside_pp_composes():
    """SP routed through set_sequence_parallel composes with the GPipe
    pipeline's shard_map on one ("pp", "sp") mesh: the inner sp shard_map
    picks up the CONTEXT abstract mesh (pp already Manual) instead of the
    concrete mesh — round-4 verdict stretch item; equivalence vs the plain
    sequential stack."""
    from vitxtgqa_tpu.models.common import TransformerConfig, TransformerEncoder
    from vitxtgqa_tpu.ops.attention import set_sequence_parallel
    from vitxtgqa_tpu.ops.masks import joint_mask_spec
    from vitxtgqa_tpu.parallel.pipeline import pipeline_encoder_apply

    if jax.device_count() < 4:
        pytest.skip("not enough devices")
    hidden = 64
    tcfg = TransformerConfig(hidden_size=hidden, num_hidden_layers=4,
                             num_attention_heads=4,
                             intermediate_size=2 * hidden)
    enc = TransformerEncoder(tcfg)
    x = jax.random.normal(jax.random.key(6), (4, 32, hidden))
    spec = joint_mask_spec(jnp.ones((4, 24), jnp.float32), 8)
    enc_params = enc.init(jax.random.key(7), x, spec)["params"]
    want = np.asarray(enc.apply({"params": enc_params}, x, spec))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("pp", "sp"))
    set_sequence_parallel(mesh, "sp")
    try:
        got = np.asarray(pipeline_encoder_apply(
            tcfg, [enc_params[f"layer_{i}"] for i in range(4)], x,
            spec.to_bias(), mesh, num_microbatches=2,
        ))
    finally:
        set_sequence_parallel(None)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dp_sp_pp_composes():
    """All three non-tp axes on one ("data", "pp", "sp") mesh: the stack
    runs under jit with the batch sharded over data, layers pipelined over
    pp, attention sequence-parallel over sp."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vitxtgqa_tpu.models.common import TransformerConfig, TransformerEncoder
    from vitxtgqa_tpu.ops.attention import set_sequence_parallel
    from vitxtgqa_tpu.ops.masks import joint_mask_spec
    from vitxtgqa_tpu.parallel.pipeline import pipeline_encoder_apply

    if jax.device_count() < 8:
        pytest.skip("not enough devices")
    hidden = 64
    tcfg = TransformerConfig(hidden_size=hidden, num_hidden_layers=2,
                             num_attention_heads=4,
                             intermediate_size=2 * hidden)
    enc = TransformerEncoder(tcfg)
    x = jax.random.normal(jax.random.key(8), (4, 32, hidden))
    spec = joint_mask_spec(jnp.ones((4, 24), jnp.float32), 8)
    enc_params = enc.init(jax.random.key(9), x, spec)["params"]
    want = np.asarray(enc.apply({"params": enc_params}, x, spec))

    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 2, 2), ("data", "pp", "sp")
    )
    layers = [enc_params[f"layer_{i}"] for i in range(2)]
    bias = spec.to_bias()
    set_sequence_parallel(mesh, "sp")
    try:
        fn = jax.jit(lambda xs: pipeline_encoder_apply(
            tcfg, layers, xs, bias, mesh, num_microbatches=2,
        ))
        got = np.asarray(
            fn(jax.device_put(x, NamedSharding(mesh, P("data"))))
        )
    finally:
        set_sequence_parallel(None)
    np.testing.assert_allclose(got, want, atol=1e-4)
