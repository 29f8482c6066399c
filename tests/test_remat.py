"""Remat produces identical grads to the non-remat path."""

import jax
import jax.numpy as jnp
import numpy as np

from vitxtgqa_tpu.models import common as C


def _grads(remat: bool):
    C.set_remat(remat)
    try:
        cfg = C.TransformerConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64,
        )
        enc = C.TransformerEncoder(cfg)
        x = jax.random.normal(jax.random.key(0), (2, 10, 32))
        bias = jnp.zeros((2, 1, 1, 10))
        params = enc.init(jax.random.key(1), x, bias)["params"]

        def loss(p):
            return enc.apply({"params": p}, x, bias).sum()

        return params, jax.grad(loss)(params)
    finally:
        C.set_remat(False)


def test_remat_grads_match():
    p1, g1 = _grads(False)
    p2, g2 = _grads(True)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_encode_with_cache_path():
    """Eval's cached-decode methods must work while remat is enabled
    (regression: flax remat rejects the bool return_kv kwarg)."""
    C.set_remat(True)
    try:
        cfg = C.TransformerConfig(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
            intermediate_size=64,
        )
        enc = C.TransformerEncoder(cfg)
        x = jax.random.normal(jax.random.key(0), (2, 8, 32))
        bias = jnp.zeros((2, 1, 1, 8))
        params = enc.init(jax.random.key(1), x, bias)["params"]
        h, kvs = enc.apply(
            {"params": params}, x, bias, method="encode_with_cache"
        )
        assert h.shape == (2, 8, 32) and len(kvs) == 1
    finally:
        C.set_remat(False)


def test_remat_dots_policy_grads_match():
    p1, g1 = _grads(False)
    p2, g2 = _grads("dots")
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _grads_train_mode(remat):
    """Training-path grads (deterministic=False, zero dropout rates): the
    selective policies key on checkpoint_name markers that only exist on
    the non-deterministic path."""
    C.set_remat(remat)
    try:
        cfg = C.TransformerConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        enc = C.TransformerEncoder(cfg)
        x = jax.random.normal(jax.random.key(0), (2, 10, 32))
        bias = jnp.zeros((2, 1, 1, 10))
        params = enc.init(jax.random.key(1), x, bias)["params"]

        def loss(p):
            return enc.apply(
                {"params": p}, x, bias, False,
                rngs={"dropout": jax.random.key(2)},
            ).sum()

        return jax.grad(loss)(params)
    finally:
        C.set_remat(False)


def test_remat_selective_policies_grads_match():
    g0 = _grads_train_mode(False)
    for mode in ("attn", "attn_qkv"):
        g = _grads_train_mode(mode)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )
