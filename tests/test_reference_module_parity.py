"""More head-to-head parity with standalone-importable reference modules:
text utilities, the grounding AttentionScore, hard top-k indicators, and the
Sinkhorn transport plan.  Skipped when the reference tree isn't mounted.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"


def _load(relpath, name):
    path = os.path.join(REF_ROOT, relpath)
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_ground():
    return _load("pythia/modules/spatio_temporal_grounding.py", "ref_ground")


@pytest.fixture(scope="module")
def ref_topk():
    return _load("pythia/modules/transtr_module/topk.py", "ref_topk")


def test_text_utils_parity():
    if not os.path.exists(os.path.join(REF_ROOT, "pythia/utils/text_utils.py")):
        pytest.skip("reference tree not mounted")
    # text_utils imports pythia.utils.general; make the package importable
    sys.path.insert(0, REF_ROOT)
    try:
        from pythia.utils import text_utils as ref_text
    except Exception as e:
        pytest.skip(f"reference text_utils not importable here: {e}")
    finally:
        sys.path.remove(REF_ROOT)

    from vitxtgqa_tpu.data.text import tokenize, word_tokenize

    cases = [
        "What's the sign?", "Hello, world", "7-eleven & co.",
        "it's John's", "a  b   c", "STOP!",
    ]
    for s in cases:
        assert tokenize(s) == ref_text.tokenize(s), s
        assert word_tokenize(s) == ref_text.word_tokenize(s), s


def test_attention_score_parity(ref_ground):
    """The reference AttentionScore ignores its linear layers — raw q.v^T,
    softmax, mask-renormalise, -10000 fill (spatio_temporal_grounding.py:15-23)."""
    import torch
    import jax.numpy as jnp

    from vitxtgqa_tpu.models.grounding import attention_score

    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 1, 16)).astype(np.float32)
    v = rng.standard_normal((2, 7, 16)).astype(np.float32)
    mask = (rng.random((2, 7)) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0

    ref_mod = ref_ground.AttentionScore(hidden_size=16)
    with torch.no_grad():
        want = ref_mod(
            torch.from_numpy(q), torch.from_numpy(v), torch.from_numpy(mask)
        ).numpy()
    got = np.asarray(attention_score(jnp.asarray(q), jnp.asarray(v), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hard_topk_parity(ref_topk):
    import torch
    import jax.numpy as jnp

    from vitxtgqa_tpu.ops.diff_topk import hard_topk_indicator

    rng = np.random.default_rng(1)
    # distinct values so top-k sets are unambiguous
    x = rng.permutation(40).reshape(2, 20).astype(np.float32)
    want = ref_topk.HardtopK(torch.from_numpy(x), 4).numpy()
    got = np.asarray(hard_topk_indicator(jnp.asarray(x), 4))
    # column order may differ (torch sorted=False); compare selected sets
    np.testing.assert_allclose(got.sum(-1), want.sum(-1))
    np.testing.assert_allclose(got.sum(1), want.sum(1))
    assert (got.max(-1) == want.max(-1)).all()


def test_sinkhorn_plan_parity(ref_topk):
    """The Sinkhorn iteration itself (deterministic) must match the
    reference's sinkhorn_forward (topk.py:16-33)."""
    import torch
    import jax.numpy as jnp

    from vitxtgqa_tpu.ops.diff_topk import _sinkhorn_iterations

    rng = np.random.default_rng(2)
    bs, n, k_ = 2, 6, 2
    C = rng.random((bs, n, k_)).astype(np.float32)
    mu = np.full((1, n, 1), 1.0 / n, np.float32)
    nu = np.array([[[0.7, 0.3]]], np.float32)
    want = ref_topk.sinkhorn_forward(
        torch.from_numpy(C), torch.from_numpy(mu), torch.from_numpy(nu),
        epsilon=0.1, max_iter=100,
    ).numpy()
    got = np.asarray(
        _sinkhorn_iterations(
            jnp.asarray(C), jnp.asarray(mu), jnp.asarray(nu), 0.1, 100
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
