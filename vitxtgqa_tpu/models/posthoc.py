"""Post-hoc middle-frame attention (the M4C/T5-ViteVQA grounding baseline).

Static-shape re-design of the reference PostHoc_Attention
(reference: pythia/models/m4c.py:334-422): the "grounded" frame is fixed to
the dataset-provided middle frame (which the reference's sequential
overwrites resolve to the last sampled frame, vtextgqa/dataset.py:174-182);
OCR grounding is a deterministic question-attention top-k within that frame.
No gumbel — this path is noise-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.models.grounding import attention_score
from vitxtgqa_tpu.ops.gumbel import topk_indices_sorted, topk_mask


class PostHocAttention(nn.Module):
    hidden_size: int
    frame_topk: int
    ocr_topk: int
    frame_num: int
    ocr_frame_num: int

    def setup(self):
        self.q_linear = nn.Dense(self.hidden_size, name="q_linear")
        self.self_attn = nn.Dense(1, name="self_attn")

    def pool_question(self, q_feat, q_mask):
        q_proj = self.q_linear(q_feat)
        attn = jax.nn.softmax(self.self_attn(q_proj)[..., 0], axis=-1)
        attn = attn * q_mask
        attn = attn / (attn.sum(-1, keepdims=True) + 1e-12)
        return jnp.einsum(
            "bl,bld->bd", attn, q_proj, preferred_element_type=jnp.float32
        )[:, None, :]

    def __call__(self, q_feat, q_mask, ocr_feat, ocr_mask, ocr_box,
                 temporal_id, middel_frame_id, middel_frame_idx):
        b, n, _ = ocr_feat.shape
        K = self.ocr_frame_num

        # OCR slots belonging to the middle frame (reference: m4c.py:366-381)
        new_ocr_mask = (
            temporal_id[:, None, :] == middel_frame_id[:, :, None]
        ).any(axis=1).astype(jnp.float32)  # [B, N]
        middle_ocr_mask = new_ocr_mask * ocr_mask

        # question-attention over all OCR, top-k per frame, intersect with
        # the middle frame (reference: m4c.py:384-400)
        q_global = self.pool_question(q_feat, q_mask)
        score = attention_score(q_global, ocr_feat, ocr_mask)
        grid = score.reshape(b, self.frame_num, K)
        tmask = topk_mask(grid, self.ocr_topk, largest=True).reshape(b, n)
        ground_topk_mask = tmask * new_ocr_mask

        # boxes of the middle frame's top-k, ascending slot order
        # (masked_select semantics, reference: m4c.py:402-405)
        mf = (middel_frame_idx[:, 0] - 1).astype(jnp.int32)  # [B] grid position
        idx_grid = topk_indices_sorted(grid, self.ocr_topk, largest=True)  # [B,F,k]
        mid_idx = jnp.take_along_axis(
            idx_grid, mf[:, None, None], axis=1
        )[:, 0, :]  # [B, k] in-frame slots
        flat = mf[:, None] * K + mid_idx  # [B, k] global slots
        ground_box = jnp.take_along_axis(ocr_box, flat[..., None], axis=1)
        ground_ocr_mask = jnp.take_along_axis(ocr_mask, flat, axis=1)
        ground_box = ground_box * ground_ocr_mask[..., None]

        return {
            "ground_frame": middel_frame_id,
            "ground_bbox": ground_box,
            "obj_mask": jnp.ones((b, 1), jnp.float32),
            "ocr_mask": middle_ocr_mask,
        }
