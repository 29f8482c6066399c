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
