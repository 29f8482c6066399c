"""T2S ablation variants: without temporal grounding / without spatial
grounding (reference: pythia/models/t2s_wo_tg.py, t2s_wo_sg.py).

Both reuse the T2S body and swap only the grounding module:

  t2s_wo_tg — no temporal indicator: the candidate set covers every real
    frame's OCR slots; the spatial indicator runs with
    o_topk = frame_topk * ocr_topk, which (being > ocr_frame_num) selects
    every slot per frame exactly as the reference's over-long top-k slice
    does (t2s_wo_tg.py:504).  The "grounded frames" become the first
    frame_topk frame *indices* containing any grounded OCR, padded with -1
    which the reference's scatter resolves to the last frame slot — both
    quirks reproduced.

  t2s_wo_sg — no spatial indicator: keeps every OCR slot of the grounded
    frames (ground mask = the frame-expansion mask), negatives are the
    complement (t2s_wo_sg.py:495-506).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vitxtgqa_tpu.core.registry import registry
from vitxtgqa_tpu.models.grounding import (
    GroundingModule,
    frames_to_ocr_mask,
    spatial_grounding,
    temporal_grounding,
)
from vitxtgqa_tpu.models.t2s import T2S


def _first_k_true_indices(mask: jax.Array, k: int) -> jax.Array:
    """Indices of the first k true entries per row, -1 padded (static).

    Equivalent of the reference's torch.where + pad-with--1 loop
    (t2s_wo_tg.py:508-515)."""
    b, n = mask.shape
    # sort key: true entries first, by ascending index
    key = jnp.where(mask, jnp.arange(n)[None, :], n + jnp.arange(n)[None, :])
    order = jnp.argsort(key, axis=-1)[:, :k]
    counts = mask.sum(-1, keepdims=True)
    return jnp.where(jnp.arange(k)[None, :] < counts, order, -1)


class GroundingWithoutTemporal(GroundingModule):
    """Spatial-only grounding (reference: t2s_wo_tg.py:461-540)."""

    def __call__(self, q_feat, q_mask, frame_feat, frame_mask, frame_id,
                 ocr_feat, ocr_mask, ocr_box, temporal_id):
        q_global = self.pool_question(q_feat, q_mask)
        b = ocr_feat.shape[0]
        F = self.frame_num

        # candidate set = every real frame's OCR slots
        t1 = jnp.where(frame_id == 0, 1, frame_id)
        new_ocr_mask = frames_to_ocr_mask(t1, temporal_id)

        rng_s = self.make_rng("gumbel")
        # o_topk > ocr_frame_num selects every slot per frame (reference's
        # [:o_topk] slice saturates); keep the same effective k
        eff_topk = min(self.frame_topk * self.ocr_topk, self.ocr_frame_num)
        ground_box, pos_o, neg_o, _, _ = spatial_grounding(
            rng_s, q_global, ocr_feat, ocr_box, new_ocr_mask,
            F, self.ocr_frame_num, eff_topk, self.tau,
        )
        ground_ocr_mask = pos_o * ocr_mask
        neg_ocr_mask = neg_o * ocr_mask

        # frames containing any grounded OCR -> first frame_topk indices,
        # -1 padding wraps to the last frame (reference scatter quirk)
        pos_any = (
            ground_ocr_mask.reshape(b, F, self.ocr_frame_num).any(-1)
        )
        ground_frame_idx = _first_k_true_indices(pos_any, self.frame_topk)
        pos_frame_mask = jnp.zeros((b, F), jnp.float32)
        pos_frame_mask = pos_frame_mask.at[
            jnp.arange(b)[:, None], ground_frame_idx
        ].set(1.0)

        neg_any = (
            neg_ocr_mask.reshape(b, F, self.ocr_frame_num).any(-1)
        )
        neg_frame_idx = _first_k_true_indices(neg_any, self.frame_topk)
        neg_frame_mask = jnp.zeros((b, F), jnp.float32)
        neg_frame_mask = neg_frame_mask.at[
            jnp.arange(b)[:, None], neg_frame_idx
        ].set(1.0)

        return {
            # NOTE: like the reference, these are frame grid *indices*, not
            # frame ids (t2s_wo_tg.py:516)
            "ground_frame": ground_frame_idx,
            "ground_bbox": ground_box,
            "pos_obj_mask": pos_frame_mask,
            "neg_obj_mask": neg_frame_mask,
            "pos_ocr_mask": ground_ocr_mask,
            "neg_ocr_mask": neg_ocr_mask,
        }


class GroundingWithoutSpatial(GroundingModule):
    """Temporal-only grounding (reference: t2s_wo_sg.py:461-520)."""

    def __call__(self, q_feat, q_mask, frame_feat, frame_mask, frame_id,
                 ocr_feat, ocr_mask, ocr_box, temporal_id):
        q_global = self.pool_question(q_feat, q_mask)
        b = ocr_feat.shape[0]

        rng_t = self.make_rng("gumbel")
        ground_frame, pos_f, neg_f, pos_f_idx, _ = temporal_grounding(
            rng_t, q_global, frame_feat, frame_mask, frame_id,
            self.frame_topk, self.tau,
        )
        pos_frame_mask = pos_f * frame_mask
        neg_frame_mask = neg_f * frame_mask

        new_ocr_mask = frames_to_ocr_mask(ground_frame, temporal_id)
        ground_ocr_mask = new_ocr_mask
        neg_ocr_mask = 1.0 - new_ocr_mask

        # boxes of every slot of the grounded frames in ascending slot order
        # (masked_select semantics, t2s_wo_sg.py:505-506)
        K = self.ocr_frame_num
        n_sel = self.frame_topk * K
        slots = _first_k_true_indices(new_ocr_mask > 0, n_sel)
        ground_box = jnp.take_along_axis(
            ocr_box, jnp.maximum(slots, 0)[..., None], axis=1
        ) * (slots >= 0)[..., None]

        return {
            "ground_frame": ground_frame,
            "ground_bbox": ground_box,
            "pos_obj_mask": pos_frame_mask,
            "neg_obj_mask": neg_frame_mask,
            "pos_ocr_mask": ground_ocr_mask,
            "neg_ocr_mask": neg_ocr_mask,
            # compact-serving gather lists (T2S._compact_decode): the pos
            # masks keep a statically-bounded row set.  pos_f_idx are the
            # frame_topk grid positions the temporal top-k selects (selected
            # padding frames gather mask 0); `slots` are the first
            # frame_topk*ocr_frame_num true OCR slots of the frame-expansion
            # mask, -1-padded when ground ids collapse (padding-frame id
            # 0->1 maps onto real frame 1, frames_to_ocr_mask quirk) —
            # completeness holds because dataset temporal ids are unique per
            # grid frame (data/dataset.py sample_frames), so each ground id
            # matches at most ocr_frame_num slots.
            "pos_obj_idx": pos_f_idx,
            "pos_ocr_idx": slots,
        }


@registry.register_model("t2s_wo_tg")
class T2SWithoutTemporalGrounding(T2S):
    GROUNDING_CLS = GroundingWithoutTemporal


@registry.register_model("t2s_wo_sg")
class T2SWithoutSpatialGrounding(T2S):
    GROUNDING_CLS = GroundingWithoutSpatial
    # pos_ocr_idx may be -1-padded (ground-id collapse, see
    # GroundingWithoutSpatial.__call__) -> trash-slot scatter in decode
    COMPACT_IDX_MAY_PAD = True
