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
