"""T5-ViteVQA baseline: full-video encoding + global post-hoc OCR attention.

(reference: pythia/models/t5vitevqa.py.)  T2S-style modality encodings (full
64-frame stream with frame-id embeddings, OCR stream with temporal/track
ids) but grounding is a deterministic global top-(frame_topk*ocr_topk)
question-attention over all 960 OCR slots (t5vitevqa.py:394-405); the
decoder sees the unrestricted masks; ground_frame is the whole sampled
frame-id list (t5vitevqa.py:410).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.core.registry import registry
from vitxtgqa_tpu.models.base import JointQAModel, project_features
from vitxtgqa_tpu.models.common import (
    FixedVocabClassifier,
    OcrPtrNet,
    PrevPredEmbeddings,
    TextEncoder,
    TransformerConfig,
    TransformerEncoder,
    cfg_get,
)
from vitxtgqa_tpu.models.grounding import attention_score
from vitxtgqa_tpu.ops.gumbel import topk_indices_sorted
from vitxtgqa_tpu.ops.masks import length_mask


class GlobalPostHoc(nn.Module):
    """Global question-attention top-k over all OCR slots
    (reference: t5vitevqa.py:346-422)."""

    hidden_size: int
    frame_topk: int
    ocr_topk: int

    def setup(self):
        self.q_linear = nn.Dense(self.hidden_size, name="q_linear")
        self.self_attn = nn.Dense(1, name="self_attn")

    def __call__(self, q_feat, q_mask, ocr_feat, ocr_mask, ocr_box):
        q_proj = self.q_linear(q_feat)
        attn = jax.nn.softmax(self.self_attn(q_proj)[..., 0], axis=-1)
        attn = attn * q_mask
        attn = attn / (attn.sum(-1, keepdims=True) + 1e-12)
        q_global = jnp.einsum(
            "bl,bld->bd", attn, q_proj, preferred_element_type=jnp.float32
        )[:, None, :]

        score = attention_score(q_global, ocr_feat, ocr_mask)
        k = self.frame_topk * self.ocr_topk
        idx = topk_indices_sorted(score, k, largest=True)  # ascending order
        ground_box = jnp.take_along_axis(ocr_box, idx[..., None], axis=1)
        ground_ocr_mask = jnp.take_along_axis(ocr_mask, idx, axis=1)
        ground_box = ground_box * ground_ocr_mask[..., None]
        return ground_box


@registry.register_model("t5vitevqa")
class T5ViteVQA(JointQAModel):
    config: Any
    num_final_outputs: int
    bos_idx: int = 2
    compute_dtype: Any = jnp.float32
    decode_recompute: bool = False

    def setup(self):
        c = self.config
        dt = self.compute_dtype
        self.mmt_cfg = TransformerConfig.from_config(cfg_get(c, "mmt"), dtype=dt)
        text_cfg = TransformerConfig.from_config(cfg_get(c, "text_bert"), dtype=dt)
        hidden = self.mmt_cfg.hidden_size

        self.text_bert = TextEncoder(text_cfg, name="text_bert")

        self.frame_embeddings = nn.Embed(4000, 50, dtype=dt)
        self.linear_obj_feat_to_mmt_in = nn.Dense(hidden, dtype=dt)
        self.obj_feat_layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=dt)
        self.obj_drop = nn.Dropout(float(cfg_get(cfg_get(c, "obj"), "dropout_prob")))

        self.temporal_position_embeddings = nn.Embed(4000, 50, dtype=dt)
        self.track_position_embeddings = nn.Embed(4000, 50, dtype=dt)
        self.linear_ocr_feat_to_mmt_in = nn.Dense(hidden, dtype=dt)
        self.linear_ocr_bbox_to_mmt_in = nn.Dense(hidden, dtype=dt)
        self.ocr_feat_layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=dt)
        self.ocr_bbox_layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=dt)
        self.ocr_drop = nn.Dropout(float(cfg_get(cfg_get(c, "ocr"), "dropout_prob")))

        g = cfg_get(c, "grounding")
        self.frame_topk = int(cfg_get(g, "frame_topk"))
        self.ocr_topk = int(cfg_get(g, "ocr_topk"))
        self.posthoc = GlobalPostHoc(
            hidden_size=int(cfg_get(g, "hidden_size")),
            frame_topk=self.frame_topk,
            ocr_topk=self.ocr_topk,
            name="posthoc",
        )

        self.prev_pred_embeddings = PrevPredEmbeddings(self.mmt_cfg)
        self.mmt = TransformerEncoder(self.mmt_cfg, name="mmt")

        num_choices = self.num_final_outputs - int(
            cfg_get(cfg_get(c, "classifier"), "ocr_max_num")
        )
        self.classifier = FixedVocabClassifier(num_choices, hidden)
        ptr = cfg_get(cfg_get(c, "classifier"), "ocr_ptr_net")
        self.ocr_ptr_net = OcrPtrNet(
            hidden_size=int(cfg_get(ptr, "hidden_size")),
            query_key_size=int(cfg_get(ptr, "query_key_size")),
        )

    def _encode_modalities(self, batch, deterministic: bool):
        dt = self.compute_dtype
        txt_mask = length_mask(batch["text_len"], batch["text"].shape[1])
        txt_emb = self.text_bert(batch["text"], txt_mask, deterministic)

        obj_lin = project_features(
            self.linear_obj_feat_to_mmt_in,
            [batch["video_feat"].astype(dt),
             self.frame_embeddings(batch["frame_id"])],
            [True, False], dt, self.is_initializing(),
        )
        obj_in = self.obj_feat_layer_norm(obj_lin)
        obj_in = self.obj_drop(obj_in, deterministic=deterministic)
        obj_mask = batch["frame_mask"].astype(jnp.float32)

        ocr_lin = project_features(
            self.linear_ocr_feat_to_mmt_in,
            [batch["context_feature_0"].astype(dt),
             batch["context_feature_1"].astype(dt),
             self.temporal_position_embeddings(batch["temporal_id"]),
             self.track_position_embeddings(batch["track_id"])],
            [True, True, False, False], dt, self.is_initializing(),
        )
        bbox = batch["ocr_bbox_coordinates"].astype(dt)
        ocr_in = self.ocr_feat_layer_norm(ocr_lin) + self.ocr_bbox_layer_norm(
            self.linear_ocr_bbox_to_mmt_in(bbox)
        )
        ocr_in = self.ocr_drop(ocr_in, deterministic=deterministic)
        ocr_mask = batch["ocr_mask"].astype(jnp.float32)

        return txt_emb, txt_mask, obj_in, obj_mask, ocr_in, ocr_mask

    def __call__(self, batch: Dict[str, jax.Array], train: bool = False):
        deterministic = not train
        txt_emb, txt_mask, obj_in, obj_mask, ocr_in, ocr_mask = (
            self._encode_modalities(batch, deterministic)
        )

        ground_box = self.posthoc(
            txt_emb, txt_mask, ocr_in, ocr_mask,
            batch["ocr_bbox_coordinates"].astype(self.compute_dtype),
        )

        enc_mask = jnp.concatenate([txt_mask, obj_mask, ocr_mask], axis=1)
        if train:
            scores = self._mmt_full(
                txt_emb, obj_in, ocr_in, enc_mask, ocr_mask,
                batch["train_prev_inds"], deterministic,
            )
        else:
            dec_len = batch["train_prev_inds"].shape[1]
            decode = (
                self._recompute_decode if self.decode_recompute
                else self._greedy_decode
            )
            scores = decode(
                txt_emb, obj_in, ocr_in, enc_mask, ocr_mask, dec_len
            )

        return {
            "pos_scores": scores,
            # the whole sampled frame-id list (reference: t5vitevqa.py:410)
            "ground_frame": batch["frame_id"],
            "ground_box": ground_box,
            "frame_topk": jnp.asarray(self.frame_topk),
            "ocr_topk": jnp.asarray(self.ocr_topk),
        }
