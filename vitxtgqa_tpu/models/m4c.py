"""M4C baseline: multimodal transformer + pointer decoder, post-hoc grounding.

(reference: pythia/models/m4c.py:29-310.)  Differences from T2S: the object
stream is a single middle-frame ViT feature (m4c.py:185-210), the OCR stream
concatenates only FastText+PHOC (m4c.py:222-247), there is no QTV and no
contrastive variants — one MMT pass, pos_scores only.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.core.registry import registry
from vitxtgqa_tpu.models.base import (
    JointQAModel,
    l2_normalize,
    project_features,
)
from vitxtgqa_tpu.models.common import (
    FixedVocabClassifier,
    OcrPtrNet,
    PrevPredEmbeddings,
    TextEncoder,
    TransformerConfig,
    TransformerEncoder,
    cfg_get,
)
from vitxtgqa_tpu.models.posthoc import PostHocAttention
from vitxtgqa_tpu.ops.masks import length_mask


@registry.register_model("m4c")
class M4C(JointQAModel):
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

        self.linear_obj_feat_to_mmt_in = nn.Dense(hidden, dtype=dt)
        self.obj_feat_layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=dt)
        self.obj_drop = nn.Dropout(float(cfg_get(cfg_get(c, "obj"), "dropout_prob")))

        self.linear_ocr_feat_to_mmt_in = nn.Dense(hidden, dtype=dt)
        self.linear_ocr_bbox_to_mmt_in = nn.Dense(hidden, dtype=dt)
        self.ocr_feat_layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=dt)
        self.ocr_bbox_layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=dt)
        self.ocr_drop = nn.Dropout(float(cfg_get(cfg_get(c, "ocr"), "dropout_prob")))

        g = cfg_get(c, "grounding")
        self.posthoc = PostHocAttention(
            hidden_size=int(cfg_get(g, "hidden_size")),
            frame_topk=int(cfg_get(g, "frame_topk")),
            ocr_topk=int(cfg_get(g, "ocr_topk")),
            frame_num=int(cfg_get(g, "frame_num")),
            ocr_frame_num=int(cfg_get(g, "ocr_frame_num")),
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

        # single middle-frame feature (reference: m4c.py:185-210)
        mid = l2_normalize(batch["mid_img_feat"].astype(dt))  # [B, 1, D]
        obj_in = self.obj_feat_layer_norm(self.linear_obj_feat_to_mmt_in(mid))
        obj_in = self.obj_drop(obj_in, deterministic=deterministic)

        ocr_lin = project_features(
            self.linear_ocr_feat_to_mmt_in,
            [batch["context_feature_0"].astype(dt),
             batch["context_feature_1"].astype(dt)],
            [True, True], dt, self.is_initializing(),
        )
        bbox = batch["ocr_bbox_coordinates"].astype(dt)
        ocr_in = self.ocr_feat_layer_norm(ocr_lin) + self.ocr_bbox_layer_norm(
            self.linear_ocr_bbox_to_mmt_in(bbox)
        )
        ocr_in = self.ocr_drop(ocr_in, deterministic=deterministic)
        ocr_mask = batch["ocr_mask"].astype(jnp.float32)

        return txt_emb, txt_mask, obj_in, ocr_in, ocr_mask

    def __call__(self, batch: Dict[str, jax.Array], train: bool = False):
        deterministic = not train
        txt_emb, txt_mask, obj_in, ocr_in, ocr_mask = self._encode_modalities(
            batch, deterministic
        )

        ph = self.posthoc(
            txt_emb, txt_mask, ocr_in, ocr_mask,
            batch["ocr_bbox_coordinates"].astype(self.compute_dtype),
            batch["temporal_id"], batch["middel_frame_id"],
            batch["middel_frame_idx"],
        )

        enc_mask = jnp.concatenate(
            [txt_mask, ph["obj_mask"], ph["ocr_mask"]], axis=1
        )
        if train:
            scores = self._mmt_full(
                txt_emb, obj_in, ocr_in, enc_mask, ph["ocr_mask"],
                batch["train_prev_inds"], deterministic,
            )
        else:
            dec_len = batch["train_prev_inds"].shape[1]
            decode = (
                self._recompute_decode if self.decode_recompute
                else self._greedy_decode
            )
            scores = decode(
                txt_emb, obj_in, ocr_in, enc_mask, ph["ocr_mask"], dec_len
            )

        return {
            "pos_scores": scores,
            "ground_frame": ph["ground_frame"],
            "ground_box": ph["ground_bbox"],
            "frame_topk": jnp.asarray(self.posthoc.frame_topk),
            "ocr_topk": jnp.asarray(self.posthoc.ocr_topk),
        }
