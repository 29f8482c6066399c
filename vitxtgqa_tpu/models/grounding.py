"""Temporal + spatial grounding indicators (T2S-QA's core mechanism).

Static-shape JAX re-design of the reference grounding stack
(reference: pythia/modules/spatio_temporal_grounding.py:26-142 and
pythia/models/t2s.py:434-518):

  * the reference's AttentionScore declares linear_q/linear_k but never
    applies them (spatio_temporal_grounding.py:12-17) — the score is a raw
    q.v^T; reproduced here as a parameter-free function;
  * gumbel hard pos/neg splits use jax.random with straight-through
    gradients;
  * the scatter/nonzero index plumbing (dynamic shapes in torch) becomes
    top_k + one-hot + equality matrices, all static;
  * NOTE on the negative stream: the reference takes bottom-k over scores
    filled with -10000 outside the gumbel-negative set, so the selection is
    dominated by -10000 ties (often positions outside the negative set
    entirely) and torch's tie order is arbitrary
    (spatio_temporal_grounding.py:57-63).  jax breaks those ties by index —
    the selected masked-score multiset matches the reference exactly (tested
    under shared noise) but the specific tied indices may differ.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.ops.gumbel import gumbel_softmax, topk_mask, topk_indices_sorted


def attention_score(q_global, feats, mask):
    """Masked, renormalised attention of the pooled question over features.

    q_global [B, 1, D], feats [B, L, D], mask [B, L] -> [B, L] scores with
    -10000 on masked slots (reference: spatio_temporal_grounding.py:15-23).
    """
    attn = jnp.einsum(
        "bqd,bld->bl", q_global, feats, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(attn, axis=-1)
    attn = attn * mask
    attn = attn / (attn.sum(-1, keepdims=True) + 1e-12)
    return jnp.where(mask == 0, -10000.0, attn)


def _gumbel_pos_neg(rng, score, mask, tau: float = 1.0):
    """Stack (pos, neg) score heads and hard-split with gumbel-softmax.

    The two heads share the identical parameter-free score (see module
    docstring), so the split is noise-driven — faithful to the reference.
    Returns (pos_mask, neg_mask) in {0,1}, both zeroed on invalid slots.
    """
    stacked = jnp.stack([score, score], axis=1)  # [B, 2, L]
    hard = gumbel_softmax(rng, stacked, tau=tau, axis=1, hard=True)
    return hard[:, 0, :] * mask, hard[:, 1, :] * mask


def temporal_grounding(
    rng, q_global, frame_feat, frame_mask, frame_id, topk: int, tau: float = 1.0
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k grounded frames (reference: spatio_temporal_grounding.py:26-68).

    Returns (ground_frame [B, topk] frame ids ascending-index order,
    pos_topk_mask [B, F], neg_topk_mask [B, F], pos_idx [B, topk] the
    frame positions the pos mask selects — the static-count gather list
    the compact-serving path rides on).
    """
    score = attention_score(q_global, frame_feat, frame_mask)
    pos_mask, neg_mask = _gumbel_pos_neg(rng, score, frame_mask, tau)

    pos_score = jnp.where(pos_mask == 0, -10000.0, score * pos_mask)
    neg_score = jnp.where(neg_mask == 0, -10000.0, score * neg_mask)

    pos_topk = topk_mask(pos_score, topk, largest=True)
    neg_topk = topk_mask(neg_score, topk, largest=False)

    idx = topk_indices_sorted(pos_score, topk, largest=True)  # ascending
    # bottom-k positions of the neg mask — static count, the compact
    # full-eval neg pass gathers these (masked frames ride along as zeros
    # in the gathered mask)
    neg_idx = topk_indices_sorted(neg_score, topk, largest=False)
    ground_frame = jnp.take_along_axis(frame_id, idx, axis=1)
    return ground_frame, pos_topk, neg_topk, idx, neg_idx


def frames_to_ocr_mask(ground_frame, temporal_id):
    """Expand grounded frame ids to an OCR-slot mask via temporal-id equality
    (reference: t2s.py:486-494).  Frame id 0 (padding) maps to frame 1."""
    t1 = jnp.where(ground_frame == 0, 1, ground_frame)  # [B, topk]
    eq = temporal_id[:, None, :] == t1[:, :, None]  # [B, topk, N]
    return jnp.any(eq, axis=1).astype(jnp.float32)


def spatial_grounding(
    rng,
    q_global,
    ocr_feat,
    ocr_box,
    new_ocr_mask,
    frame_num: int,
    ocr_frame_num: int,
    ocr_topk: int,
    tau: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k OCR per frame (reference: spatio_temporal_grounding.py:71-142).

    Returns (ground_ocr_box [B, F*ocr_topk, 4] in ascending-index order per
    frame, pos_topk_mask [B, N], neg_topk_mask [B, N], pos_idx
    [B, F*ocr_topk] the flat OCR slots the pos mask selects — exactly
    ocr_topk per frame, the static-count gather list the compact-serving
    path rides on).  Faithful quirks:
    pos mask is NOT re-multiplied by the validity mask (reference line 137 is
    commented out), neg mask is; top-k is taken in every frame, grounded or
    not.
    """
    b, n, _ = ocr_feat.shape
    score = attention_score(q_global, ocr_feat, new_ocr_mask)
    pos_mask, neg_mask = _gumbel_pos_neg(rng, score, new_ocr_mask, tau)

    pos_score = jnp.where(pos_mask == 0, -10000.0, score * pos_mask)
    neg_score = jnp.where(neg_mask == 0, -10000.0, score * neg_mask)

    pos_grid = pos_score.reshape(b, frame_num, ocr_frame_num)
    neg_grid = neg_score.reshape(b, frame_num, ocr_frame_num)

    pos_topk = topk_mask(pos_grid, ocr_topk, largest=True).reshape(b, n)
    neg_topk = topk_mask(neg_grid, ocr_topk, largest=False).reshape(b, n)
    neg_topk = neg_topk * new_ocr_mask

    # boxes of the per-frame top-k, ascending slot order within each frame
    # (masked_select enumerates ascending, reference line 139)
    idx = topk_indices_sorted(pos_grid, ocr_topk, largest=True)  # [B, F, k]
    flat = (
        jnp.arange(frame_num)[None, :, None] * ocr_frame_num + idx
    ).reshape(b, -1)
    # per-frame bottom-k positions — the compact full-eval neg gather list
    idx_n = topk_indices_sorted(neg_grid, ocr_topk, largest=False)
    flat_n = (
        jnp.arange(frame_num)[None, :, None] * ocr_frame_num + idx_n
    ).reshape(b, -1)
    ground_box = jnp.take_along_axis(ocr_box, flat[..., None], axis=1)
    return ground_box, pos_topk, neg_topk, flat, flat_n


class GroundingModule(nn.Module):
    """Question pooling + temporal then spatial grounding
    (reference: t2s.py:434-518; the BertEncoder declared there is never
    called and is omitted, as is the unused frame_attn linear)."""

    hidden_size: int
    frame_topk: int
    ocr_topk: int
    frame_num: int
    ocr_frame_num: int
    tau: float = 1.0

    def setup(self):
        self.q_linear = nn.Dense(self.hidden_size, name="q_linear")
        self.self_attn = nn.Dense(1, name="self_attn")

    def pool_question(self, q_feat, q_mask):
        """Self-attention pooling (reference: t2s.py:453-459)."""
        q_proj = self.q_linear(q_feat)
        attn = jax.nn.softmax(self.self_attn(q_proj)[..., 0], axis=-1)
        attn = attn * q_mask
        attn = attn / (attn.sum(-1, keepdims=True) + 1e-12)
        return jnp.einsum(
            "bl,bld->bd", attn, q_proj, preferred_element_type=jnp.float32
        )[:, None, :]

    def __call__(self, q_feat, q_mask, frame_feat, frame_mask, frame_id,
                 ocr_feat, ocr_mask, ocr_box, temporal_id):
        q_global = self.pool_question(q_feat, q_mask)

        rng_t = self.make_rng("gumbel")
        ground_frame, pos_f, neg_f, pos_f_idx, neg_f_idx = temporal_grounding(
            rng_t, q_global, frame_feat, frame_mask, frame_id,
            self.frame_topk, self.tau,
        )
        pos_frame_mask = pos_f * frame_mask
        neg_frame_mask = neg_f * frame_mask

        new_ocr_mask = frames_to_ocr_mask(ground_frame, temporal_id)

        rng_s = self.make_rng("gumbel")
        ground_box, pos_o, neg_o, pos_o_idx, neg_o_idx = spatial_grounding(
            rng_s, q_global, ocr_feat, ocr_box, new_ocr_mask,
            self.frame_num, self.ocr_frame_num, self.ocr_topk, self.tau,
        )

        return {
            "ground_frame": ground_frame,
            "ground_bbox": ground_box,
            "pos_obj_mask": pos_frame_mask,
            "neg_obj_mask": neg_frame_mask,
            "pos_ocr_mask": pos_o,
            "neg_ocr_mask": neg_o,
            # static-count positions of the pos masks' ones (obj: exactly
            # frame_topk rows; ocr: exactly ocr_topk per frame) — the
            # compact-serving gather lists (see T2S._compact_decode)
            "pos_obj_idx": pos_f_idx,
            "pos_ocr_idx": pos_o_idx,
            # neg-mask positions (bottom-k; same static counts) — compact
            # full-eval's teacher-forced neg pass (T2S.__call__)
            "neg_obj_idx": neg_f_idx,
            "neg_ocr_idx": neg_o_idx,
        }
