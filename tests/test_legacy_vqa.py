"""Legacy image-VQA model smoke tests (pythia/lorra/ban/tdbu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitxtgqa_tpu.core.config import ConfigNode

B, T, K, DV, NOUT = 2, 8, 6, 32, 11


def _batch():
    r = np.random.default_rng(0)
    return {
        "text": r.integers(1, 90, (B, T)).astype(np.int32),
        "text_len": np.array([T, T - 3]),
        "image_feature_0": r.standard_normal((B, K, DV)).astype(np.float32),
        "context_feature_0": r.standard_normal((B, 4, DV)).astype(np.float32),
    }


def _cfg():
    return ConfigNode({"vocab_size": 100, "embed_dim": 16, "hidden_dim": 24})


@pytest.mark.parametrize(
    "key", ["pythia", "pythia_question_only", "pythia_image_only", "lorra",
            "ban", "top_down_bottom_up"],
)
def test_legacy_model_forward(key):
    import vitxtgqa_tpu.models.legacy_vqa  # noqa: F401
    from vitxtgqa_tpu.core.registry import registry

    cls = registry.get_model_class(key)
    model = cls(config=_cfg(), num_final_outputs=NOUT)
    batch = _batch()
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False,
    )
    out = model.apply(variables, batch, train=False)
    assert out["scores"].shape == (B, NOUT)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_question_only_ignores_image():
    import vitxtgqa_tpu.models.legacy_vqa as lv

    model = lv.PythiaQuestionOnly(config=_cfg(), num_final_outputs=NOUT)
    batch = _batch()
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False,
    )
    out1 = model.apply(variables, batch, train=False)
    batch2 = dict(batch)
    batch2["image_feature_0"] = batch["image_feature_0"] * 0 + 7.0
    out2 = model.apply(variables, batch2, train=False)
    # image contributions still flow through attention pooling, but the
    # question-only head zeroes the pooled image vector -> scores shift only
    # via the combine's image branch being zero
    np.testing.assert_allclose(
        np.asarray(out1["scores"]), np.asarray(out2["scores"]), atol=1e-5
    )
