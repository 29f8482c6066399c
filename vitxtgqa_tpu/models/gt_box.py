"""GT-box oracle: answers with ground-truth grounding injected.

(reference: pythia/models/gt_box.py + datasets/videoqa/gt_box_clipocr/.)
T2S-style encodings (full frame stream; OCR stream built from the GT
annotation grid: context features over annotated OCR tokens, GT temporal/
track ids, GT boxes) with no QTV (commented out in the reference,
gt_box.py:298-299) and no predicted grounding: the grounding "module" passes
the GT frame list/boxes straight to the outputs and the decoder masks
(gt_box.py:475-487).  Single (pos) variant.
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
from vitxtgqa_tpu.ops.masks import length_mask


@registry.register_model("gt_box")
@registry.register_model("T2S_human")  # the reference's gt_box_clipocr.yml
# keys its model block "T2S_human" while the class registers as "gt_box"
# (reference: configs/gt_box_clipocr.yml:62 vs gt_box.py:23) — alias both
class GTBox(JointQAModel):
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

        # OCR stream over the GT annotation grid (reference: gt_box.py:255-292)
        ocr_lin = project_features(
            self.linear_ocr_feat_to_mmt_in,
            [batch["context_feature_0"].astype(dt),
             batch["context_feature_1"].astype(dt),
             self.temporal_position_embeddings(batch["ocr_temporal_id"]),
             self.track_position_embeddings(batch["ocr_track_id"])],
            [True, True, False, False], dt, self.is_initializing(),
        )
        bbox = batch["ocr_bbox_list"].astype(dt)
        ocr_in = self.ocr_feat_layer_norm(ocr_lin) + self.ocr_bbox_layer_norm(
            self.linear_ocr_bbox_to_mmt_in(bbox)
        )
        ocr_in = self.ocr_drop(ocr_in, deterministic=deterministic)

        return txt_emb, txt_mask, obj_in, ocr_in

    def __call__(self, batch: Dict[str, jax.Array], train: bool = False):
        deterministic = not train
        txt_emb, txt_mask, obj_in, ocr_in = self._encode_modalities(
            batch, deterministic
        )

        # GT injection (reference: gt_box.py:475-487)
        obj_mask = batch["frame_mask_embedding"].astype(jnp.float32)
        ocr_mask = batch["ocr_mask_embedding"].astype(jnp.float32)

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
            "ground_frame": batch["frame_list"],
            # eval-aligned GT boxes (see gt_box_dataset.py: fixes the
            # reference's frame-list/box-grid pairing misalignment)
            "ground_box": batch.get("eval_box_list", batch["ocr_bbox_list"]),
            "frame_topk": jnp.asarray(64),
            "ocr_topk": jnp.asarray(15),
        }
