"""Async checkpointing + sharded restore (orbax AsyncCheckpointer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vitxtgqa_tpu.training.checkpoint import Checkpoint


def _state(seed=0):
    r = jax.random.split(jax.random.key(seed), 3)
    return {
        "params": {
            "dense": {"kernel": jax.random.normal(r[0], (16, 32)),
                      "bias": jnp.zeros((32,))},
            "embed": jax.random.normal(r[1], (64, 16)),
        },
        "opt_state": {"mu": jax.random.normal(r[2], (16, 32))},
    }


def test_async_save_restore_roundtrip(tmp_path):
    ckpt = Checkpoint(str(tmp_path), async_save=True)
    state = _state()
    ckpt.save(state, iteration=100, update_best=True, best_iteration=100,
              best_metric_value=0.5)
    ckpt.wait()
    got = ckpt.load(template=jax.tree.map(np.asarray, state))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        got, state,
    )
    meta = ckpt.load_meta()
    assert meta["iteration"] == 100 and meta["best_metric_value"] == 0.5


def test_async_overwrite_fences(tmp_path):
    """Re-saving best/ immediately after an async save must not corrupt."""
    ckpt = Checkpoint(str(tmp_path), async_save=True)
    for it in (10, 20, 30):
        state = _state(seed=it)
        ckpt.save(state, iteration=it, update_best=True, best_iteration=it)
    ckpt.wait()
    got = ckpt.load(template=jax.tree.map(np.asarray, _state(30)))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        got, _state(30),
    )
    assert ckpt.latest_iteration() == 30


def test_sharded_restore(tmp_path):
    """Restore places arrays directly onto mesh shards."""
    if jax.device_count() < 8:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    ckpt = Checkpoint(str(tmp_path), async_save=False)
    state = _state(seed=7)
    ckpt.save(state, iteration=1)

    shardings = {
        "params": {
            "dense": {
                "kernel": NamedSharding(mesh, P(None, "model")),
                "bias": NamedSharding(mesh, P()),
            },
            "embed": NamedSharding(mesh, P("model", None)),
        },
        "opt_state": {"mu": NamedSharding(mesh, P(None, "model"))},
    }
    got = ckpt.load(
        path=ckpt._model_path(1),
        template=jax.tree.map(np.asarray, state),
        shardings=shardings,
    )
    # values identical, placement sharded
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        got, state,
    )
    kern = got["params"]["dense"]["kernel"]
    assert len(kern.sharding.device_set) == 8
    assert kern.sharding.spec == P(None, "model")