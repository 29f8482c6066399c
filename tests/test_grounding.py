"""Grounding-function semantics against hand-computed expectations."""

import jax
import jax.numpy as jnp
import numpy as np

from vitxtgqa_tpu.models.grounding import (
    attention_score,
    frames_to_ocr_mask,
    spatial_grounding,
    temporal_grounding,
)
from vitxtgqa_tpu.ops.gumbel import gumbel_softmax, topk_indices_sorted, topk_mask


def test_attention_score_masking_and_renorm():
    q = jnp.ones((1, 1, 4))
    feats = jnp.asarray([[[1, 0, 0, 0], [2, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32)
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    s = np.asarray(attention_score(q, feats, mask))
    # masked slot -> -10000; valid slots renormalised to sum 1
    assert s[0, 2] == -10000.0
    np.testing.assert_allclose(s[0, 0] + s[0, 1], 1.0, atol=1e-6)
    assert s[0, 1] > s[0, 0]  # higher dot product wins


def test_topk_mask_and_sorted_indices():
    scores = jnp.asarray([[0.5, 0.9, 0.1, 0.7]])
    m = np.asarray(topk_mask(scores, 2))
    np.testing.assert_array_equal(m, [[0, 1, 0, 1]])
    m_small = np.asarray(topk_mask(scores, 2, largest=False))
    np.testing.assert_array_equal(m_small, [[1, 0, 1, 0]])
    idx = np.asarray(topk_indices_sorted(scores, 2))
    np.testing.assert_array_equal(idx, [[1, 3]])  # ascending index order


def test_gumbel_softmax_straight_through():
    logits = jnp.asarray([[2.0, -2.0]])
    hard = gumbel_softmax(jax.random.key(0), logits, hard=True)
    v = np.asarray(hard)
    assert set(np.unique(v)) <= {0.0, 1.0} and v.sum() == 1.0
    # gradient flows via the soft relaxation
    g = jax.grad(lambda l: gumbel_softmax(jax.random.key(0), l, hard=True)[0, 0])(
        logits
    )
    assert np.abs(np.asarray(g)).sum() > 0


def test_frames_to_ocr_mask():
    # 2 frames x 3 slots; temporal ids frame1=1, frame2=2
    temporal = jnp.asarray([[1, 1, 1, 2, 2, 2]])
    ground = jnp.asarray([[2, 0]])  # frame 2 grounded; padding 0 -> frame 1
    m = np.asarray(frames_to_ocr_mask(ground, temporal))
    np.testing.assert_array_equal(m, [[1, 1, 1, 1, 1, 1]])
    ground2 = jnp.asarray([[2, 2]])
    m2 = np.asarray(frames_to_ocr_mask(ground2, temporal))
    np.testing.assert_array_equal(m2, [[0, 0, 0, 1, 1, 1]])


def test_temporal_grounding_partitions_and_ids():
    b, F = 1, 6
    q = jnp.ones((b, 1, 8))
    feats = jax.random.normal(jax.random.key(1), (b, F, 8))
    frame_mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.float32)
    frame_id = jnp.asarray([[1, 2, 3, 4, 0, 0]])
    gf, pos, neg, gf_idx, gf_neg_idx = temporal_grounding(
        jax.random.key(2), q, feats, frame_mask, frame_id, topk=2
    )
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == 2 and neg.sum() == 2
    # grounded ids are taken from frame_id at the pos-topk positions
    assert set(np.asarray(gf)[0]) <= {0, 1, 2, 3, 4}


def test_spatial_grounding_shapes_and_box_order():
    b, F, K = 1, 2, 3
    n = F * K
    q = jnp.ones((b, 1, 8))
    feats = jax.random.normal(jax.random.key(3), (b, n, 8))
    boxes = jnp.arange(n * 4, dtype=jnp.float32).reshape(1, n, 4) / 100.0
    new_mask = jnp.ones((b, n), jnp.float32)
    gb, pos, neg, gb_idx, gb_neg_idx = spatial_grounding(
        jax.random.key(4), q, feats, boxes, new_mask, F, K, ocr_topk=2
    )
    assert gb.shape == (b, F * 2, 4)
    pos = np.asarray(pos).reshape(F, K)
    assert (pos.sum(-1) == 2).all()  # exactly topk per frame
    # box rows come in ascending slot order within each frame:
    gb = np.asarray(gb).reshape(F, 2, 4)
    for f in range(F):
        assert gb[f, 0, 0] <= gb[f, 1, 0]
