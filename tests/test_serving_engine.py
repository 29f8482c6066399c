"""Dynamic-batching serving engine (vitxtgqa_tpu/serving/engine.py)."""

import os
import sys
import threading

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_t2s_model import tiny_config, tiny_batch, NV, N


@pytest.fixture(scope="module")
def served_model():
    from vitxtgqa_tpu.models.t2s import T2S

    model = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2,
                inference_only=True)
    batch = tiny_batch(0)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    params = model.init(rngs, batch, train=True)["params"]
    return model, params, batch


def _rows(batch, n):
    return [{k: np.asarray(v)[i] for k, v in batch.items()} for i in range(n)]


def test_engine_matches_direct_batched_apply(served_model):
    """A full-bucket group must reproduce a direct apply on the same batch
    with the engine's group-0 gumbel key (co-batched requests share the
    draw like rows of one eval batch)."""
    from vitxtgqa_tpu.serving.engine import ServingEngine

    model, params, batch = served_model
    b = np.asarray(batch["text"]).shape[0]
    with ServingEngine(model, params, buckets=(b,), max_wait_ms=2000,
                       rng_seed=11) as eng:
        futs = [eng.submit(s) for s in _rows(batch, b)]
        outs = [f.result(timeout=120) for f in futs]

    direct = model.apply(
        {"params": params}, batch, train=False,
        rngs={"gumbel": jax.random.fold_in(jax.random.key(11), 0)},
    )
    for i, out in enumerate(outs):
        np.testing.assert_allclose(
            out["pos_scores"], np.asarray(direct["pos_scores"])[i], atol=1e-5
        )
        np.testing.assert_array_equal(
            out["ground_frame"], np.asarray(direct["ground_frame"])[i]
        )


def test_engine_pads_partial_groups_and_recovers(served_model):
    """A lone request rides a padded bucket; padding rows never leak into
    results, and the engine keeps serving across groups."""
    from vitxtgqa_tpu.serving.engine import ServingEngine

    model, params, batch = served_model
    sample = _rows(batch, 1)[0]
    with ServingEngine(model, params, buckets=(2, 4), max_wait_ms=1,
                       rng_seed=3) as eng:
        out1 = eng.submit(sample).result(timeout=120)
        assert out1["pos_scores"].shape == (batch["train_prev_inds"].shape[1],
                                            NV + N)
        # second group compiles nothing new (same bucket) and still works
        futs = [eng.submit(s) for s in _rows(batch, 2)]
        outs = [f.result(timeout=120) for f in futs]
    assert len(outs) == 2
    assert not np.allclose(outs[0]["pos_scores"], outs[1]["pos_scores"])


def test_engine_surfaces_errors(served_model):
    from vitxtgqa_tpu.serving.engine import ServingEngine

    model, params, batch = served_model
    bad = {"text": np.zeros((3,), np.int32)}  # wrong fields
    with ServingEngine(model, params, buckets=(2,), max_wait_ms=1) as eng:
        fut = eng.submit(bad)
        with pytest.raises(Exception):
            fut.result(timeout=120)
        # engine survives the poisoned group
        ok = eng.submit(_rows(batch, 1)[0]).result(timeout=120)
        assert "pos_scores" in ok


def test_engine_concurrent_submitters(served_model):
    """Requests from many threads all resolve (grouping is thread-safe)."""
    from vitxtgqa_tpu.serving.engine import ServingEngine

    model, params, batch = served_model
    rows = _rows(batch, 2)
    results = [None] * 8
    with ServingEngine(model, params, buckets=(2, 4), max_wait_ms=20) as eng:
        def worker(i):
            results[i] = eng.submit(rows[i % 2]).result(timeout=120)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    assert all(r is not None and "pos_scores" in r for r in results)
