"""dense_mm custom-VJP (bias grad as an MXU dot, models/common.py)
vs flax autodiff: identical forward, matching gradients."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vitxtgqa_tpu.models.common import (
    TransformerConfig,
    TransformerEncoder,
    set_fused_grads,
)
from vitxtgqa_tpu.ops.masks import MaskSpec

B, L, D, H, M = 2, 64, 32, 4, 64


def _setup():
    cfg = TransformerConfig(
        hidden_size=D, num_hidden_layers=2, num_attention_heads=H,
        intermediate_size=M, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, dtype=jnp.float32,
        use_pallas=False,
    )
    enc = TransformerEncoder(cfg)
    x = jax.random.normal(jax.random.key(1), (B, L, D), jnp.float32) * 0.3
    mask = jnp.ones((B, L))
    variables = enc.init(jax.random.key(0), x, MaskSpec(key_mask=mask))
    return enc, variables, x, mask


def _loss_and_grads(enc, variables, x, mask, fused: bool):
    set_fused_grads(fused)
    try:
        def loss_fn(params):
            y = enc.apply(
                {"params": params}, x, MaskSpec(key_mask=mask),
                deterministic=True,
            )
            return jnp.sum(y * y)

        return jax.value_and_grad(loss_fn)(variables["params"])
    finally:
        set_fused_grads(False)


def test_dense_mm_grads_match_autodiff():
    enc, variables, x, mask = _setup()
    l_ref, g_ref = _loss_and_grads(enc, variables, x, mask, fused=False)
    l_fus, g_fus = _loss_and_grads(enc, variables, x, mask, fused=True)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fus = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_fus)
    )
    for k, v_ref in flat_ref:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_fus[key]), np.asarray(v_ref),
            atol=1e-5, rtol=1e-5, err_msg=key,
        )


def test_dense_mm_forward_identical():
    enc, variables, x, mask = _setup()
    y_ref = enc.apply(
        {"params": variables["params"]}, x, MaskSpec(key_mask=mask),
        deterministic=True,
    )
    set_fused_grads(True)
    try:
        y_fus = enc.apply(
            {"params": variables["params"]}, x, MaskSpec(key_mask=mask),
            deterministic=True,
        )
    finally:
        set_fused_grads(False)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_fus))
