"""MIST baseline: iterative segment-then-region gumbel selection (ISTA).

(reference: pythia/models/mist.py + modules/mist_module/mist_module.py.)
Live path in the reference fork: question pooling -> two stacked ISTA
blocks, each running a gumbel-categorical segment Selector over frames then
a region Selector over the selected frames' OCR; the accumulated selection
masks drive the shared MMT decode (single pos variant) over the RAW
text_bert embedding (the reference's _forward_mmt re-runs text_bert and
overwrites the ISTA question projection before the MMT reads it,
mist.py:273-279 vs :625 — so the projection is dead weight).

Dead weight in the reference that is intentionally NOT re-created: the
bundled CLIP ViT-B/32 tower, EncoderVid, the DistilBERT Transformer and the
in-ISTA fusion transformer plus the ISTA question/segment/patch embedding
projections (computed then discarded, mist_module.py:587-604) are all
instantiated but never affect this fork's outputs (mist.py:452-456,
commented blocks mist_module.py:592-602); on-device ViT feature extraction
lives in vitxtgqa_tpu/models/vit.py instead.

Faithful quirks kept: Selector draws gumbel over *softmaxed* scores with
replacement (duplicate picks allowed, masks can accumulate >1,
mist_module.py:440-460); ground_frame holds 0-based selection indices, not
frame ids (mist.py:612); the OCR mask is randomly padded to exactly 25 ones
(mist_module.py:570-585).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

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
from vitxtgqa_tpu.ops.gumbel import gumbel_softmax, topk_mask
from vitxtgqa_tpu.ops.masks import length_mask

MIST_OCR_MASK_ONES = 25  # hard-coded pad target (reference: mist_module.py:575)


def _pad_noise(rng, shape):
    """Tie-break noise for the random OCR-mask padding
    (reference: mist_module.py:570-585 pads with torch.randperm slots).
    Module-level seam so parity tests can pin the padding order on both
    frameworks."""
    return jax.random.uniform(rng, shape)


class Selector(nn.Module):
    """Gumbel-categorical top-k selection (reference: mist_module.py:389-467)."""

    topk: int
    dim: int = 768

    def setup(self):
        self.linear_Q = nn.Dense(self.dim)
        self.norm_Q = nn.LayerNorm(epsilon=1e-12)
        self.linear_K = nn.Dense(self.dim)
        self.norm_K = nn.LayerNorm(epsilon=1e-12)

    def __call__(self, q, keys, values) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """q [B, 1, D]; keys [B, L, D]; values [B, L, ...].

        Returns (selected values [B, topk, ...], indices [B, topk],
        accumulated mask [B, L] — may exceed 1 on duplicate picks).
        """
        b, l, _ = keys.shape
        qp = self.norm_Q(self.linear_Q(q[:, 0, :]))
        kp = self.norm_K(self.linear_K(keys))
        logits = jnp.einsum(
            "bld,bd->bl", kp, qp, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits, axis=-1)

        flat_v = values.reshape(b, l, -1)
        picks, idxs = [], []
        acc = jnp.zeros((b, l), jnp.float32)
        for _ in range(self.topk):
            # reference quirk: gumbel over softmax probabilities
            onehot = gumbel_softmax(self.make_rng("gumbel"), probs, tau=1.0,
                                    axis=-1, hard=True)
            idxs.append(jnp.argmax(onehot, axis=-1))
            picks.append(
                jnp.einsum(
                    "bl,blf->bf", onehot, flat_v,
                    preferred_element_type=jnp.float32,
                ).astype(values.dtype)
            )
            acc = acc + onehot
        selected = jnp.stack(picks, axis=1).reshape(
            (b, self.topk) + values.shape[2:]
        )
        return selected, jnp.stack(idxs, axis=1), acc


class ISTA(nn.Module):
    """One segment->region selection round (reference: mist_module.py:470-604)."""

    frame_topk: int
    ocr_topk: int
    frame_num: int
    ocr_frame_num: int
    d_model: int = 768

    def setup(self):
        self.seg_selector = Selector(topk=self.frame_topk, dim=self.d_model)
        self.reg_selector = Selector(topk=self.ocr_topk, dim=self.d_model)

    def __call__(self, q_global, seg_feat, video_o):
        b = q_global.shape[0]
        K = self.ocr_frame_num

        sel_frames, ground_frame_idx, ground_frame_mask = self.seg_selector(
            q_global, seg_feat, video_o
        )  # [B, topk, K, D]

        q_rep = jnp.repeat(q_global, self.frame_topk, axis=0)
        flat = sel_frames.reshape(b * self.frame_topk, K, -1)
        _, ground_ocr_idx, _ = self.reg_selector(q_rep, flat, flat)
        ground_ocr_idx = ground_ocr_idx.reshape(b, self.frame_topk, -1)

        global_idx = (
            ground_ocr_idx + ground_frame_idx[:, :, None] * K
        ).reshape(b, -1)
        mask = jnp.zeros((b, self.frame_num * K), jnp.float32)
        mask = mask.at[jnp.arange(b)[:, None], global_idx].set(1.0)

        # random pad to exactly MIST_OCR_MASK_ONES ones (clamped for grids
        # smaller than the reference's 960)
        n_ones = min(MIST_OCR_MASK_ONES, mask.shape[1])
        noise = _pad_noise(self.make_rng("gumbel"), mask.shape)
        mask = topk_mask(mask * 1e6 + noise, n_ones)

        return ground_frame_idx, ground_frame_mask, mask


@registry.register_model("mist")
class MIST(JointQAModel):
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
        frame_num = int(cfg_get(g, "frame_num"))
        ocr_frame_num = int(cfg_get(g, "ocr_frame_num"))
        self.q_self_attn = nn.Dense(1)
        self.istas = [
            ISTA(
                frame_topk=self.frame_topk, ocr_topk=self.ocr_topk,
                frame_num=frame_num, ocr_frame_num=ocr_frame_num,
                d_model=hidden, name=f"ista_{i}",
            )
            for i in range(2)
        ]

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

        return txt_emb, txt_mask, obj_in, ocr_in, ocr_mask

    def __call__(self, batch: Dict[str, jax.Array], train: bool = False):
        deterministic = not train
        txt_emb, txt_mask, obj_in, ocr_in, ocr_mask = self._encode_modalities(
            batch, deterministic
        )
        b, F, D = obj_in.shape
        K = ocr_in.shape[1] // F

        # pooled question (reference: mist.py:502-509)
        attn = jax.nn.softmax(self.q_self_attn(txt_emb)[..., 0], axis=-1)
        attn = attn * txt_mask
        attn = attn / (attn.sum(-1, keepdims=True) + 1e-12)
        q_global = jnp.einsum(
            "bl,bld->bd", attn, txt_emb, preferred_element_type=jnp.float32
        ).astype(txt_emb.dtype)[:, None, :]

        seg_feat = obj_in / jnp.maximum(
            jnp.linalg.norm(obj_in, axis=-1, keepdims=True), 1e-12
        )
        video_o = ocr_in.reshape(b, F, K, D)

        # stacked ISTA rounds; only the last round's outputs feed the decoder
        # (the reference loop overwrites, mist.py:595-597)
        for ista in self.istas:
            ground_frame_idx, ground_frame_mask, ground_ocr_mask = (
                ista(q_global, seg_feat, video_o)
            )

        # grounded boxes: the 25 masked slots in ascending order
        slots_key = jnp.where(
            ground_ocr_mask > 0,
            jnp.arange(F * K)[None, :],
            F * K + jnp.arange(F * K)[None, :],
        )
        slots = jnp.argsort(slots_key, axis=-1)[:, : min(MIST_OCR_MASK_ONES, F * K)]
        ocr_box = batch["ocr_bbox_coordinates"].astype(self.compute_dtype)
        ground_box = jnp.take_along_axis(ocr_box, slots[..., None], axis=1)
        box_valid = jnp.take_along_axis(ocr_mask, slots, axis=1)
        ground_box = ground_box * box_valid[..., None]

        # the answering MMT consumes the RAW text_bert embedding: the
        # reference's _forward_mmt re-runs text_bert and overwrites the
        # ISTA question projection before the MMT reads it (mist.py:273-279
        # clobbers the txt_emb set at mist.py:625), so question_proj and its
        # projection params are dead weight — not re-created here (verified
        # by tests/test_mist_full_model_parity.py)
        enc_mask = jnp.concatenate(
            [txt_mask, ground_frame_mask, ground_ocr_mask], axis=1
        )
        if train:
            scores = self._mmt_full(
                txt_emb, obj_in, ocr_in, enc_mask, ground_ocr_mask,
                batch["train_prev_inds"], deterministic,
            )
        else:
            dec_len = batch["train_prev_inds"].shape[1]
            decode = (
                self._recompute_decode if self.decode_recompute
                else self._greedy_decode
            )
            scores = decode(
                txt_emb, obj_in, ocr_in, enc_mask, ground_ocr_mask,
                dec_len,
            )

        return {
            "pos_scores": scores,
            # 0-based selection indices, as in the reference (mist.py:612)
            "ground_frame": ground_frame_idx,
            "ground_box": ground_box,
            "frame_topk": jnp.asarray(self.frame_topk),
            "ocr_topk": jnp.asarray(self.ocr_topk),
        }
