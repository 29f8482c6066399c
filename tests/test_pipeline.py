"""GPipe pipeline over transformer layers equals the sequential stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vitxtgqa_tpu.models.common import TransformerConfig, TransformerEncoder
from vitxtgqa_tpu.ops.masks import joint_mask_spec
from vitxtgqa_tpu.parallel.pipeline import gpipe, pipeline_encoder_apply


def _mesh(n, axis="pp"):
    if jax.device_count() < n:
        pytest.skip("not enough devices")
    return Mesh(np.array(jax.devices()[:n]), (axis,))


def test_gpipe_identity_stages():
    """Stages that add their stage-constant: output = x + sum(constants)."""
    mesh = _mesh(4)
    consts = jnp.asarray([1.0, 2.0, 3.0, 4.0])

    def stage_fn(c, payload):
        return {"h": payload["h"] + c}

    x = jnp.arange(8 * 6, dtype=jnp.float32).reshape(8, 6)
    out = gpipe(stage_fn, consts, {"h": x}, mesh, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(out["h"]), np.asarray(x) + 10.0)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (2, 4), (4, 4)])
def test_pipeline_encoder_matches_sequential(n_stages, n_micro):
    mesh = _mesh(n_stages)
    cfg = TransformerConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64,
    )
    enc = TransformerEncoder(cfg)
    b, lenc, dec = 8, 26, 6
    l = lenc + dec
    x = jax.random.normal(jax.random.key(0), (b, l, 32))
    enc_mask = (
        jnp.arange(lenc)[None, :]
        < jax.random.randint(jax.random.key(1), (b, 1), 10, lenc + 1)
    ).astype(jnp.float32)
    spec = joint_mask_spec(enc_mask, dec)
    params = enc.init(jax.random.key(2), x, spec)["params"]

    want = np.asarray(enc.apply({"params": params}, x, spec))
    layer_params = [
        params[f"layer_{i}"] for i in range(cfg.num_hidden_layers)
    ]
    got = np.asarray(
        pipeline_encoder_apply(
            cfg, layer_params, x, spec.to_bias(), mesh,
            num_microbatches=n_micro,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_set_pipeline_encoder_hook_matches_sequential():
    """The trainer-facing global switch: with set_pipeline active on a
    dp x pp mesh, TransformerEncoder.__call__ itself routes through the
    GPipe schedule and reproduces the sequential stack."""
    from vitxtgqa_tpu.models.common import set_pipeline

    if jax.device_count() < 4:
        pytest.skip("needs 4 devices (2 data x 2 pp)")
    mesh = Mesh(
        np.array(jax.devices()[:4]).reshape(2, 2), ("data", "pp")
    )
    cfg = TransformerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    enc = TransformerEncoder(cfg)
    b, lenc, dec = 4, 26, 6
    x = jax.random.normal(jax.random.key(0), (b, lenc + dec, 32))
    enc_mask = jnp.ones((b, lenc), jnp.float32)
    spec = joint_mask_spec(enc_mask, dec)
    params = enc.init(jax.random.key(2), x, spec)["params"]
    want = np.asarray(enc.apply({"params": params}, x, spec))
    set_pipeline(mesh, "pp")
    try:
        got = np.asarray(jax.jit(
            lambda p, x: enc.apply({"params": p}, x, spec)
        )(params, x))
    finally:
        set_pipeline(None)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_set_pipeline_skips_indivisible_stacks():
    """A 3-layer stack on 2 stages silently keeps the sequential path."""
    from vitxtgqa_tpu.models.common import set_pipeline

    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    mesh = _mesh(2)
    cfg = TransformerConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    enc = TransformerEncoder(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 16, 32))
    spec = joint_mask_spec(jnp.ones((2, 16), jnp.float32), 0)
    params = enc.init(jax.random.key(2), x, spec)["params"]
    want = np.asarray(enc.apply({"params": params}, x, spec))
    set_pipeline(mesh, "pp")
    try:
        got = np.asarray(enc.apply({"params": params}, x, spec))
    finally:
        set_pipeline(None)
    np.testing.assert_allclose(got, want, atol=1e-6)
