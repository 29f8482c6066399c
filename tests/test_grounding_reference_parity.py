"""Grounding-indicator parity vs the reference torch modules under identical
injected gumbel noise.

Both sides' gumbel-softmax draws are replaced with the same fixed noise
tensor, making the hard pos/neg splits deterministic — the temporal and
spatial indicators must then produce identical masks, grounded frame ids and
grounded boxes (reference: pythia/modules/spatio_temporal_grounding.py).
Skipped when the reference tree isn't mounted.
"""

import importlib.util
import os
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF_PATH = "/root/reference/pythia/modules/spatio_temporal_grounding.py"


@pytest.fixture()
def ref(monkeypatch):
    if not os.path.exists(REF_PATH):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_stg", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fixed_gumbel(shape, seed=0):
    return np.random.default_rng(seed).gumbel(size=shape).astype(np.float32)


def _patch_noise(monkeypatch, ref_mod, noise_by_shape):
    """Both frameworks draw the same gumbel noise keyed by logits shape."""
    import torch
    import torch.nn.functional as TF

    def torch_gumbel_softmax(logits, tau=1.0, hard=False, dim=-1):
        g = torch.from_numpy(noise_by_shape[tuple(logits.shape)])
        y = torch.softmax((logits + g) / tau, dim=dim)
        if hard:
            idx = y.argmax(dim=dim, keepdim=True)
            y_hard = torch.zeros_like(y).scatter_(dim, idx, 1.0)
            y = y_hard + y - y.detach()
        return y

    monkeypatch.setattr(ref_mod.F, "gumbel_softmax", torch_gumbel_softmax)

    import vitxtgqa_tpu.models.grounding as G

    def jax_gumbel_softmax(rng, logits, tau=1.0, axis=-1, hard=True):
        import jax

        g = jnp.asarray(noise_by_shape[tuple(logits.shape)])
        y = jax.nn.softmax((logits + g) / tau, axis=axis)
        if hard:
            idx = jnp.argmax(y, axis=axis, keepdims=True)
            y_hard = jnp.zeros_like(y)
            y_hard = jnp.put_along_axis(y_hard, idx, 1.0, axis=axis, inplace=False)
            y = y_hard
        return y

    monkeypatch.setattr(G, "gumbel_softmax", jax_gumbel_softmax)


def test_temporal_indicator_parity(ref, monkeypatch):
    import torch
    import jax

    from vitxtgqa_tpu.models.grounding import temporal_grounding

    b, F, D, topk = 2, 8, 16, 3
    rng = np.random.default_rng(5)
    q = rng.standard_normal((b, 1, D)).astype(np.float32)
    feats = rng.standard_normal((b, F, D)).astype(np.float32)
    mask = np.ones((b, F), np.float32)
    mask[1, 6:] = 0.0
    frame_id = np.tile(np.arange(1, F + 1), (b, 1))
    frame_id[1, 6:] = 0

    noise = {(b, 2, F): _fixed_gumbel((b, 2, F))}
    _patch_noise(monkeypatch, ref, noise)

    tmod = ref.Temporal_Grounding_Indicator(hidden_size=D)
    sample_list = types.SimpleNamespace(frame_id=torch.from_numpy(frame_id))
    with torch.no_grad():
        r_frame, r_pos, r_neg = tmod(
            torch.from_numpy(q), torch.from_numpy(feats),
            torch.from_numpy(mask), sample_list, topk,
        )

    g_frame, g_pos, g_neg, _, _ = temporal_grounding(
        jax.random.key(0), jnp.asarray(q), jnp.asarray(feats),
        jnp.asarray(mask), jnp.asarray(frame_id), topk,
    )
    np.testing.assert_array_equal(np.asarray(g_pos), r_pos.numpy())
    np.testing.assert_array_equal(np.asarray(g_frame), r_frame.numpy())
    # the reference's bottom-k "negative frames" selects among -10000-tied
    # masked entries (every non-negative position scores -10000, below any
    # real negative score), and torch's tie order is arbitrary while jax
    # breaks ties by index — compare the selected masked-score multiset per
    # row, the only well-defined property (spatio_temporal_grounding.py:57-63)
    import jax as _jax

    from vitxtgqa_tpu.models.grounding import _gumbel_pos_neg, attention_score

    score_j = np.asarray(
        attention_score(jnp.asarray(q), jnp.asarray(feats), jnp.asarray(mask))
    )
    _, neg_gumbel = _gumbel_pos_neg(
        _jax.random.key(0), jnp.asarray(score_j), jnp.asarray(mask)
    )
    masked = np.where(
        np.asarray(neg_gumbel) == 0, -10000.0, score_j * np.asarray(neg_gumbel)
    )
    for row in range(b):
        ours_sel = np.sort(masked[row][np.asarray(g_neg)[row] > 0])
        ref_sel = np.sort(masked[row][r_neg.numpy()[row] > 0])
        np.testing.assert_allclose(ours_sel, ref_sel, atol=1e-6)


def test_spatial_indicator_parity(ref, monkeypatch):
    import torch
    import jax

    from vitxtgqa_tpu.models.grounding import spatial_grounding

    b, F, K, D, o_topk = 2, 4, 3, 16, 2
    n = F * K
    rng = np.random.default_rng(7)
    q = rng.standard_normal((b, 1, D)).astype(np.float32)
    feats = rng.standard_normal((b, n, D)).astype(np.float32)
    boxes = rng.random((b, n, 4)).astype(np.float32)
    new_mask = np.ones((b, n), np.float32)
    new_mask[0, :K] = 0.0  # first frame not grounded for row 0

    noise = {(b, 2, n): _fixed_gumbel((b, 2, n), seed=9)}
    _patch_noise(monkeypatch, ref, noise)

    smod = ref.Spatial_Grounding_Indicator(hidden_size=D)
    with torch.no_grad():
        r_box, r_pos, r_neg = smod(
            torch.from_numpy(q), torch.from_numpy(feats),
            torch.from_numpy(boxes), torch.ones(b, n),
            torch.from_numpy(new_mask), 2, o_topk, F, K,
        )

    g_box, g_pos, g_neg, _, _ = spatial_grounding(
        jax.random.key(0), jnp.asarray(q), jnp.asarray(feats),
        jnp.asarray(boxes), jnp.asarray(new_mask), F, K, o_topk,
    )
    np.testing.assert_array_equal(np.asarray(g_pos), r_pos.numpy())
    np.testing.assert_array_equal(np.asarray(g_neg), r_neg.numpy())
    np.testing.assert_allclose(np.asarray(g_box), r_box.numpy(), atol=1e-6)
