"""Legacy Pythia/MMF image-VQA models, rebuilt to the zoo's parity standard.

Reference-exact flax compositions of the MMF-heritage models the reference
keeps registered but does not wire to any videoqa config (reference:
pythia/models/pythia.py:16-352, lorra.py:9-62, ban.py:12-97,
top_down_bottom_up.py:15-64; SURVEY.md §2.5 "legacy Pythia").  They compose
the parity-tested module library — AttentionTextEmbedding / BiLSTM
(models/embeddings.py), TopDownAttention / AttentionLayer
(models/attention_legacy.py), NonLinearElementMultiply / LogitClassifier /
BCNet / BiAttention / FCNet / WeightNormClassifier (models/layers.py) —
exactly as the reference models wire them; full-model torch parity lives in
tests/test_legacy_vqa_parity.py.

Config: the reference MMF section schema is accepted
(`text_embeddings`, `image_feature_embeddings`, `image_text_modal_combine`,
`classifier`, `text_embedding`/`bilinear_attention` for BAN); when a section
is absent it is synthesized from the compact keys
(vocab_size/embed_dim/hidden_dim) with MMF's upstream defaults.

Batches: text [B, T] int32, text_len [B], image_feature_0 [B, K, Dv]
(+ optional image_feature_1, image_info_0_max_features), (lorra)
context_feature_0 [B, N, Dc] + optional order_vectors.  Output
{"scores": [B, num_final_outputs]}.

Documented reference quirks:
  * `pythia_question_only` / `pythia_image_only` zero the text embedding
    (pythia.py:307-310, 333-336) and, as written, feed raw token ids into
    the text LSTM (they skip the word_embedding step Pythia.forward
    applies) — a crash in the reference.  The rebuild applies the word
    embedding first (the evident intent) and keeps the zeroed-text quirk.
  * `top_down_bottom_up` is non-constructible in the reference (its
    __init__ takes module objects, not a config — "Doesn't work currently",
    top_down_bottom_up.py:14) — rebuilt as the evident TDBU head.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.core.registry import registry
from vitxtgqa_tpu.models.common import cfg_get
from vitxtgqa_tpu.models.attention_legacy import AttentionLayer
from vitxtgqa_tpu.models.embeddings import (
    BiLSTMTextEmbedding,
    ImageEmbedding,
    text_embedding,
)
from vitxtgqa_tpu.models.layers import (
    BCNet,
    BiAttention,
    ClassifierLayer,
    FCNet,
    ModalCombineLayer,
    ReLUWithWeightNormFC,
    WeightNormClassifier,
)


def _plain(node):
    if hasattr(node, "items"):
        return {k: _plain(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_plain(v) for v in node]
    return node


def _text_emb_cfgs(config, hidden, embed) -> List[Dict[str, Any]]:
    """config.text_embeddings, or MMF pythia.yml's default attention
    embedding (hidden_dim x conv2_out=2 glimpses)."""
    cfgs = _plain(cfg_get(config, "text_embeddings", None))
    if cfgs:
        return cfgs
    return [{
        "type": "attention",
        "params": {
            "hidden_dim": hidden, "embedding_dim": embed, "num_layers": 1,
            "dropout": 0.0, "conv1_out": 512, "conv2_out": 2,
            "kernel_size": 1, "padding": 0,
        },
    }]


def _text_out_dim(cfg: Dict[str, Any], embed: int) -> int:
    p = cfg.get("params", {})
    t = cfg["type"]
    if t == "attention":
        return int(p["hidden_dim"]) * int(p.get("conv2_out", 2))
    if t == "bilstm":
        return int(p["hidden_dim"])
    if t in ("identity", "vocab", "torch"):
        return int(p.get("embedding_dim", embed))
    if t == "preextracted":
        return int(p["out_dim"])
    raise NotImplementedError(t)


def _feat_emb_cfgs(config, key, hidden) -> List[Dict[str, Any]]:
    """config.<attr>_feature_embeddings, or MMF pythia.yml's default
    single top-down attention embedding."""
    cfgs = _plain(cfg_get(config, key, None))
    if cfgs:
        return cfgs
    return [{
        "modal_combine": {
            "type": "non_linear_element_multiply",
            "params": {"dropout": 0.0, "hidden_dim": hidden},
        },
        "normalization": "softmax",
        "transform": {"type": "linear", "params": {"out_dim": 1}},
    }]


class _LegacyBase(nn.Module):
    config: Any
    num_final_outputs: int
    compute_dtype: Any = jnp.float32
    # kept for constructor parity with the videoqa zoo
    bos_idx: int = 2
    decode_recompute: bool = False

    def _dims(self):
        c = self.config
        return (
            int(cfg_get(c, "vocab_size", 30522)),
            int(cfg_get(c, "embed_dim", 300)),
            int(cfg_get(c, "hidden_dim", 1024)),
        )

    def _features(self, batch, attr="image"):
        """image_feature_0, image_feature_1, ... like the reference's
        process_feature_embedding loop (pythia.py:250-270), each run
        through its configured feature encoder
        (`<attr>_feature_encodings[i]`, reference pythia.py:65-80 +
        modules/encoders.py:12-28).  Absent config == `default`
        (identity), matching every config this fork ships."""
        from vitxtgqa_tpu.models.encoders import build_image_encoder

        enc_cfgs = _plain(
            cfg_get(self.config, f"{attr}_feature_encodings", None)
        ) or []
        data_dir = str(cfg_get(self.config, "model_data_dir", "") or "")
        feats = []
        i = 0
        while f"{attr}_feature_{i}" in batch:
            feat = batch[f"{attr}_feature_{i}"].astype(self.compute_dtype)
            if i < len(enc_cfgs):
                ec = enc_cfgs[i]
                params = dict(ec.get("params", {}) or {})
                params.setdefault("model_data_dir", data_dir)
                enc, _out = build_image_encoder(
                    str(ec["type"]), feat.shape[-1],
                    name=f"{attr}_feature_encoders_{i}", **params,
                )
                feat = enc(feat)
            feats.append(feat)
            i += 1
        return feats


class Pythia(_LegacyBase):
    """Word embed -> attention text embeddings -> per-feature top-down
    image embeddings -> modal combine -> logit classifier
    (reference: pythia.py:16-300)."""

    # "full" | "question_only" | "image_only" (the reference ablations'
    # forward paths, pythia.py:301-352)
    MODE = "full"

    @nn.compact
    def __call__(self, batch: Dict[str, jax.Array], train: bool = False):
        det = not train
        vocab, embed, hidden = self._dims()

        # -- text (reference: forward word_embedding + process_text_embedding)
        x = nn.Embed(vocab, embed, name="word_embedding")(batch["text"])
        te_cfgs = _text_emb_cfgs(self.config, hidden, embed)
        text_parts = []
        for i, tc in enumerate(te_cfgs):
            if tc["type"] == "identity":
                text_parts.append(x.reshape(x.shape[0], -1))
            else:
                text_parts.append(
                    text_embedding(
                        tc["type"], name=f"text_embeddings_{i}",
                        **tc.get("params", {}),
                    )(x, deterministic=det)
                )
        text_total = jnp.concatenate(text_parts, axis=1)
        text_dim = sum(_text_out_dim(tc, embed) for tc in te_cfgs)

        if self.MODE != "full":
            # reference quirk: both ablations zero the text embedding
            # (pythia.py:307-310, 333-336)
            text_total = jnp.zeros_like(text_total)

        cc = _plain(cfg_get(self.config, "image_text_modal_combine", None)) or {
            "type": "non_linear_element_multiply",
            "params": {"dropout": 0.0, "hidden_dim": hidden},
        }
        combine = ModalCombineLayer(
            cc["type"], int(cc["params"]["hidden_dim"]),
            dropout=float(cc["params"].get("dropout", 0.0)),
            name="image_text_multi_modal_combine_layer",
        )
        clf = self._classifier(self._classifier_in_dim(combine.out_dim))

        if self.MODE == "question_only":
            # reference pythia.py:301-326: no image pass; joint =
            # dropout(fa_txt(zeroed text)); scores via the text branch of
            # the logit classifier only
            joint = combine.module.dropout_layer(
                combine.module.fa_txt(text_total), deterministic=det
            )
            scores = clf.module.linear_text(clf.module.f_o_text(joint))
            return {"scores": scores}

        # -- image (reference: process_feature_embedding; encoders — both
        # `default` identity and `finetune_faster_rcnn_fpn_fc7` — are
        # applied inside _features, models/encoders.py)
        fe_cfgs = _feat_emb_cfgs(self.config, "image_feature_embeddings",
                                 hidden)
        locs = batch.get("image_info_0_max_features")
        img_parts = []
        for fi, feat in enumerate(self._features(batch, "image")):
            for ei, fe in enumerate(fe_cfgs):
                emb, _ = ImageEmbedding(
                    image_dim=feat.shape[-1], question_dim=text_dim,
                    modal_combine=fe["modal_combine"],
                    transform=fe["transform"],
                    normalization=fe.get("normalization", "softmax"),
                    name=f"image_feature_embeddings_list_{fi}_{ei}",
                )(feat, text_total, locs if fi == 0 else None,
                  deterministic=det)
                img_parts.append(emb)
        image_total = jnp.concatenate(img_parts, axis=1)

        if self.MODE == "image_only":
            # reference pythia.py:329-352: joint = dropout(fa_image(image)),
            # full classifier
            joint = combine.module.dropout_layer(
                combine.module.fa_image(image_total), deterministic=det
            )
            return {"scores": clf(joint, deterministic=det)}

        joint = self._combine(combine, batch, image_total, text_total, det)
        return {"scores": clf(joint, deterministic=det)}

    # hooks LoRRA overrides -------------------------------------------------
    def _combine(self, combine, batch, image_total, text_total, det):
        return combine(image_total, text_total, deterministic=det)

    def _classifier_in_dim(self, combine_out_dim):
        return combine_out_dim

    def _classifier(self, in_dim):
        cl = _plain(cfg_get(self.config, "classifier", None)) or {
            "type": str(cfg_get(self.config, "classifier_type", "logit")),
            "params": {},
        }
        p = dict(cl.get("params", {}))
        p.setdefault("text_hidden_dim", in_dim)
        p.setdefault("img_hidden_dim", in_dim)
        return ClassifierLayer(
            cl["type"], in_dim, self.num_final_outputs, params=p,
            name="classifier",
        )


@registry.register_model("pythia")
class PythiaModel(Pythia):
    pass


@registry.register_model("pythia_question_only")
class PythiaQuestionOnly(Pythia):
    MODE = "question_only"


@registry.register_model("pythia_image_only")
class PythiaImageOnly(Pythia):
    MODE = "image_only"


@registry.register_model("lorra")
class LoRRA(Pythia):
    """Pythia + OCR context stream through the same top-down attention,
    combined with context into a doubled joint embedding
    (reference: lorra.py:9-62)."""

    def _combine(self, combine, batch, image_total, text_total, det):
        _, embed, hidden = self._dims()
        ce_cfgs = _feat_emb_cfgs(self.config, "context_feature_embeddings",
                                 hidden)
        order_vectors = batch.get("order_vectors")
        ctx_parts = []
        for fi, feat in enumerate(self._features(batch, "context")):
            for ei, fe in enumerate(ce_cfgs):
                emb, _ = ImageEmbedding(
                    image_dim=feat.shape[-1],
                    question_dim=0,
                    modal_combine=fe["modal_combine"],
                    transform=fe["transform"],
                    normalization=fe.get("normalization", "softmax"),
                    name=f"context_feature_embeddings_list_{fi}_{ei}",
                )(feat, text_total, None, order_vectors=order_vectors,
                  deterministic=det)
                ctx_parts.append(emb)
        context_total = jnp.concatenate(ctx_parts, axis=1)
        return combine(
            image_total, text_total, context_total, deterministic=det
        )

    def _classifier_in_dim(self, combine_out_dim):
        # reference: classifier input is cat(image-joint, context-joint)
        # (lorra.py:35-38)
        return 2 * combine_out_dim


@registry.register_model("ban")
class BAN(_LegacyBase):
    """Bilinear attention network, reference-exact glimpse recursion
    (reference: ban.py:12-97): BiAttention glimpse maps -> per-glimpse
    BCNet.forward_with_weights fusion -> FCNet question refinement ->
    weight-norm classifier over the summed question states."""

    @nn.compact
    def __call__(self, batch, train: bool = False):
        det = not train
        vocab, embed, hidden = self._dims()
        te = _plain(cfg_get(self.config, "text_embedding", None)) or {
            "num_hidden": hidden, "emb_size": embed, "num_layers": 1,
            "dropout": 0.0, "bidirectional": False, "rnn_type": "GRU",
        }
        ba = _plain(cfg_get(self.config, "bilinear_attention", None)) or {
            "gamma": int(cfg_get(self.config, "glimpses", 2)),
            "bc_net": {"k": 1},
            "fc_net": {"activation": "relu", "dropout": 0.0},
        }
        num_hidden = int(te["num_hidden"])
        gamma = int(ba["gamma"])

        v = batch["image_feature_0"].astype(self.compute_dtype)
        q = nn.Embed(vocab, embed, name="word_embedding")(batch["text"])
        q_emb = BiLSTMTextEmbedding(
            hidden_dim=num_hidden, num_layers=int(te.get("num_layers", 1)),
            dropout=float(te.get("dropout", 0.0)),
            bidirectional=bool(te.get("bidirectional", False)),
            rnn_type=str(te.get("rnn_type", "GRU")), name="q_emb",
        ).forward_all(q, deterministic=det)

        att, _ = BiAttention(
            hidden_dim=num_hidden, glimpses=gamma, name="v_att",
        )(v, q_emb, deterministic=det)

        fc_act = str(ba.get("fc_net", {}).get("activation", "relu"))
        fc_drop = float(ba.get("fc_net", {}).get("dropout", 0.0))
        bc_k = int(ba.get("bc_net", {}).get("k", 1))
        for g in range(gamma):
            b_emb = BCNet(
                h_dim=num_hidden, h_out=None, k=bc_k, name=f"b_net_{g}",
            ).forward_with_weights(v, q_emb, att[:, g], deterministic=det)
            q_emb = FCNet(
                (num_hidden, num_hidden), act=fc_act, dropout=fc_drop,
                name=f"q_prj_{g}",
            )(b_emb[:, None, :], deterministic=det) + q_emb

        cl = _plain(cfg_get(self.config, "classifier", None)) or {
            "dropout": 0.5
        }
        scores = WeightNormClassifier(
            hidden_dim=num_hidden * 2, out_dim=self.num_final_outputs,
            dropout=float(cl.get("dropout", 0.5)), name="classifier",
        )(q_emb.sum(axis=1), deterministic=det)
        return {"scores": scores}


@registry.register_model("top_down_bottom_up")
class TopDownBottomUp(_LegacyBase):
    """Classic TDBU VQA head.  The reference class is non-constructible
    (its __init__ takes prebuilt module objects and is marked "Doesn't work
    currently", top_down_bottom_up.py:14-30); this is the evident TDBU
    computation with the same pieces: text embeddings -> attention-pooled
    image -> ReLUWithWeightNormFC(text) * ReLUWithWeightNormFC(image) ->
    classifier."""

    @nn.compact
    def __call__(self, batch, train: bool = False):
        det = not train
        vocab, embed, hidden = self._dims()
        x = nn.Embed(vocab, embed, name="word_embedding")(batch["text"])
        te_cfgs = _text_emb_cfgs(self.config, hidden, embed)
        text_parts = [
            text_embedding(
                tc["type"], name=f"text_embedding_models_{i}",
                **tc.get("params", {}),
            )(x, deterministic=det)
            for i, tc in enumerate(te_cfgs)
        ]
        text_total = jnp.concatenate(text_parts, axis=1)
        text_dim = sum(_text_out_dim(tc, embed) for tc in te_cfgs)

        v = batch["image_feature_0"].astype(self.compute_dtype)
        fe = _feat_emb_cfgs(self.config, "image_feature_embeddings",
                            hidden)[0]
        attention = AttentionLayer(
            image_dim=v.shape[-1], question_dim=text_dim,
            modal_combine=fe["modal_combine"], transform=fe["transform"],
            normalization=fe.get("normalization", "softmax"),
            name="image_attention_model",
        )(v, text_total, deterministic=det)
        # reference: sum(attention * image, dim=1)
        image_total = (attention * v).sum(axis=1)

        joint = ReLUWithWeightNormFC(hidden, name="non_linear_text")(
            text_total
        ) * ReLUWithWeightNormFC(hidden, name="non_linear_image")(image_total)
        scores = WeightNormClassifier(
            hidden_dim=hidden * 2, out_dim=self.num_final_outputs,
            dropout=0.5, name="classifier",
        )(joint, deterministic=det)
        return {"scores": scores}
