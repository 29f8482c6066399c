"""Torch -> JAX weight conversion.

Maps the reference's released checkpoints (pytorch_transformers-era BERT
naming, reference: pythia/models/t2s.py:521-723, checkpoint layout
pythia/utils/checkpoint.py:206-240) and HF ViT checkpoints onto this
framework's flax param trees, enabling bit-comparable eval parity runs
(SURVEY.md §7.2 item 10).

Conventions: torch Linear.weight [out, in] -> flax Dense kernel [in, out]
(transposed); Embedding.weight -> Embed.embedding; LayerNorm weight/bias ->
scale/bias.  The reference's dead parameters (grounding indicator linears,
frame_attn, the never-called grounding BertEncoder, obj_frame projections)
are skipped.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file to {name: np.ndarray}, unwrapping the
    reference's ckpt dict ({"model": state_dict, ...}) and DataParallel
    `module.` prefixes (reference: checkpoint.py:98-116)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob and isinstance(blob["model"], dict):
        blob = blob["model"]
    out = {}
    for key, val in blob.items():
        if key.startswith("module."):
            key = key[len("module."):]
        out[key] = _np(val)
    return out


# -- BERT-style encoder layers ---------------------------------------------

def _bert_layer_entries(torch_prefix: str, flax_prefix: str, i: int):
    """Name pairs for one reference BertLayer -> one TransformerLayer."""
    t = f"{torch_prefix}.layer.{i}"
    f = f"{flax_prefix}/layer_{i}"
    return [
        (f"{t}.attention.self.query", f"{f}/query", "linear"),
        (f"{t}.attention.self.key", f"{f}/key", "linear"),
        (f"{t}.attention.self.value", f"{f}/value", "linear"),
        (f"{t}.attention.output.dense", f"{f}/attn_out", "linear"),
        (f"{t}.attention.output.LayerNorm", f"{f}/attn_ln", "ln"),
        (f"{t}.intermediate.dense", f"{f}/ffn_in", "linear"),
        (f"{t}.output.dense", f"{f}/ffn_out", "linear"),
        (f"{t}.output.LayerNorm", f"{f}/ffn_ln", "ln"),
    ]


def _emit(entries, sd, out: Dict[str, np.ndarray]):
    for tname, fname, kind in entries:
        if kind == "linear":
            out[f"{fname}/kernel"] = sd[f"{tname}.weight"].T
            out[f"{fname}/bias"] = sd[f"{tname}.bias"]
        elif kind == "ln":
            out[f"{fname}/scale"] = sd[f"{tname}.weight"]
            out[f"{fname}/bias"] = sd[f"{tname}.bias"]
        elif kind == "embed":
            out[f"{fname}/embedding"] = sd[f"{tname}.weight"]
        else:
            raise ValueError(kind)


def convert_bert_encoder(sd, torch_prefix: str, flax_prefix: str,
                         num_layers: int, out: Dict[str, np.ndarray]):
    for i in range(num_layers):
        _emit(_bert_layer_entries(torch_prefix, flax_prefix, i), sd, out)


def convert_text_bert(sd, torch_prefix: str, flax_prefix: str,
                      num_layers: int, out: Dict[str, np.ndarray]):
    e = f"{torch_prefix}.embeddings"
    f = f"{flax_prefix}/embeddings"
    _emit(
        [
            (f"{e}.word_embeddings", f"{f}/word_embeddings", "embed"),
            (f"{e}.position_embeddings", f"{f}/position_embeddings", "embed"),
            (f"{e}.token_type_embeddings", f"{f}/token_type_embeddings", "embed"),
            (f"{e}.LayerNorm", f"{f}/ln", "ln"),
        ],
        sd, out,
    )
    convert_bert_encoder(sd, f"{torch_prefix}.encoder", f"{flax_prefix}/encoder",
                         num_layers, out)


# -- videoqa model conversion ----------------------------------------------

def convert_t2s_like(sd: Dict[str, np.ndarray],
                     text_layers: int = 3, qtv_layers: int = 2,
                     mmt_layers: int = 3, has_qtv: bool = True,
                     has_grounding: bool = True,
                     has_posthoc: bool = False,
                     obj_has_frame_embed: bool = True,
                     ocr_has_ids: bool = True) -> Dict[str, np.ndarray]:
    """Reference t2s/m4c-family state dict -> flat {path: array}.

    Flags cover the family differences: m4c sets has_qtv=False,
    has_grounding=False, has_posthoc=True, obj_has_frame_embed=False,
    ocr_has_ids=False.
    """
    out: Dict[str, np.ndarray] = {}
    convert_text_bert(sd, "text_bert", "text_bert", text_layers, out)

    _emit(
        [
            ("linear_obj_feat_to_mmt_in", "linear_obj_feat_to_mmt_in", "linear"),
            ("obj_feat_layer_norm", "obj_feat_layer_norm", "ln"),
            ("linear_ocr_feat_to_mmt_in", "linear_ocr_feat_to_mmt_in", "linear"),
            ("linear_ocr_bbox_to_mmt_in", "linear_ocr_bbox_to_mmt_in", "linear"),
            ("ocr_feat_layer_norm", "ocr_feat_layer_norm", "ln"),
            ("ocr_bbox_layer_norm", "ocr_bbox_layer_norm", "ln"),
        ],
        sd, out,
    )
    if obj_has_frame_embed:
        _emit([("frame_embeddings", "frame_embeddings", "embed")], sd, out)
    if ocr_has_ids:
        _emit(
            [
                ("temporal_position_embeddings", "temporal_position_embeddings", "embed"),
                ("track_position_embeddings", "track_position_embeddings", "embed"),
            ],
            sd, out,
        )

    if has_qtv:
        convert_bert_encoder(sd, "TransLayer.encoder", "qtv", qtv_layers, out)
    if has_grounding:
        _emit(
            [
                ("Grounding_Module.q_linear", "grounding/q_linear", "linear"),
                ("Grounding_Module.self_attn", "grounding/self_attn", "linear"),
            ],
            sd, out,
        )
    if has_posthoc:
        _emit(
            [
                ("PostHoc.q_linear", "posthoc/q_linear", "linear"),
                ("PostHoc.self_attn", "posthoc/self_attn", "linear"),
            ],
            sd, out,
        )

    # MMT + decoder-slot embeddings
    convert_bert_encoder(sd, "mmt.encoder", "mmt", mmt_layers, out)
    p = "mmt.prev_pred_embeddings"
    f = "prev_pred_embeddings"
    _emit(
        [
            (f"{p}.position_embeddings", f"{f}/position_embeddings", "embed"),
            (f"{p}.token_type_embeddings", f"{f}/token_type_embeddings", "embed"),
            (f"{p}.ans_layer_norm", f"{f}/ans_ln", "ln"),
            (f"{p}.ocr_layer_norm", f"{f}/ocr_ln", "ln"),
            (f"{p}.emb_layer_norm", f"{f}/emb_ln", "ln"),
        ],
        sd, out,
    )

    _emit(
        [
            ("ocr_ptr_net.query", "ocr_ptr_net/query", "linear"),
            ("ocr_ptr_net.key", "ocr_ptr_net/key", "linear"),
        ],
        sd, out,
    )
    # classifier weight doubles as the answer embedding table: [out, in]
    # in both frameworks (reference: ClassifierLayer linear, layers.py:91-109)
    cls_key = "classifier.module.weight" if "classifier.module.weight" in sd else "classifier.weight"
    out["classifier/weight"] = sd[cls_key]
    out["classifier/bias"] = sd[cls_key.replace("weight", "bias")]
    return out


def _detr_decoder_entries(torch_prefix: str, flax_prefix: str,
                          num_layers: int):
    """Reference DETR TransformerDecoder (transtr_module/
    multimodal_transformer.py:37-172) -> models/detr.DetrDecoder names."""
    entries = []
    for i in range(num_layers):
        t = f"{torch_prefix}.layers.{i}"
        f = f"{flax_prefix}/layer_{i}"
        for tattn, fattn in (("self_attn", "self_attn"),
                             ("multihead_attn", "cross_attn")):
            for lin in ("q_lin", "k_lin", "v_lin", "out_lin"):
                entries.append((f"{t}.{tattn}.{lin}", f"{f}/{fattn}/{lin}",
                                "linear"))
        entries += [
            (f"{t}.linear1", f"{f}/linear1", "linear"),
            (f"{t}.linear2", f"{f}/linear2", "linear"),
            (f"{t}.norm1", f"{f}/norm1", "ln"),
            (f"{t}.norm2", f"{f}/norm2", "ln"),
            (f"{t}.norm3", f"{f}/norm3", "ln"),
        ]
    entries.append((f"{torch_prefix}.norm", f"{flax_prefix}/norm", "ln"))
    return entries


def convert_transtr(sd: Dict[str, np.ndarray], text_layers: int = 3,
                    mmt_layers: int = 3,
                    det_layers: int = 2) -> Dict[str, np.ndarray]:
    """Reference TRANSTR state dict (pythia/models/transtr.py:26-347 +
    VideoQAmodel :349-530) -> flat {path: array} for models/transtr.TranSTR.

    Skipped reference parameters are all dead in its forward: the
    spatial_enhance LSTM, obj_frame projections (transtr.py:93-100, never
    called), and VideoQAmodel's text_encoder / vl_encoder / ans_decoder /
    classifier / tokenizer (the question stream reuses text_bert's output,
    transtr.py:415-416, and answering happens in the shared MMT)."""
    out: Dict[str, np.ndarray] = {}
    convert_text_bert(sd, "text_bert", "text_bert", text_layers, out)

    _emit(
        [
            ("frame_embeddings", "frame_embeddings", "embed"),
            ("linear_obj_feat_to_mmt_in", "linear_obj_feat_to_mmt_in", "linear"),
            ("obj_feat_layer_norm", "obj_feat_layer_norm", "ln"),
            ("temporal_position_embeddings", "temporal_position_embeddings", "embed"),
            ("track_position_embeddings", "track_position_embeddings", "embed"),
            ("linear_ocr_feat_to_mmt_in", "linear_ocr_feat_to_mmt_in", "linear"),
            ("linear_ocr_bbox_to_mmt_in", "linear_ocr_bbox_to_mmt_in", "linear"),
            ("ocr_feat_layer_norm", "ocr_feat_layer_norm", "ln"),
            ("ocr_bbox_layer_norm", "ocr_bbox_layer_norm", "ln"),
        ],
        sd, out,
    )

    # selector (reference attribute name: VideoQAmodel)
    v, f = "VideoQAmodel", "selector"
    _emit(
        [
            (f"{v}.ocr_resize.fc", f"{f}/ocr_resize/Dense_0", "linear"),
            (f"{v}.ocr_resize.layer_norm", f"{f}/ocr_resize/LayerNorm_0", "ln"),
        ],
        sd, out,
    )
    for dec in ("frame_decoder", "ocr_decoder", "fo_decoder"):
        _emit(_detr_decoder_entries(f"{v}.{dec}", f"{f}/{dec}", det_layers),
              sd, out)

    convert_bert_encoder(sd, "mmt.encoder", "mmt", mmt_layers, out)
    p = "mmt.prev_pred_embeddings"
    fp = "prev_pred_embeddings"
    _emit(
        [
            (f"{p}.position_embeddings", f"{fp}/position_embeddings", "embed"),
            (f"{p}.token_type_embeddings", f"{fp}/token_type_embeddings", "embed"),
            (f"{p}.ans_layer_norm", f"{fp}/ans_ln", "ln"),
            (f"{p}.ocr_layer_norm", f"{fp}/ocr_ln", "ln"),
            (f"{p}.emb_layer_norm", f"{fp}/emb_ln", "ln"),
            ("ocr_ptr_net.query", "ocr_ptr_net/query", "linear"),
            ("ocr_ptr_net.key", "ocr_ptr_net/key", "linear"),
        ],
        sd, out,
    )
    cls_key = ("classifier.module.weight" if "classifier.module.weight" in sd
               else "classifier.weight")
    out["classifier/weight"] = sd[cls_key]
    out["classifier/bias"] = sd[cls_key.replace("weight", "bias")]
    return out


def convert_mist(sd: Dict[str, np.ndarray], text_layers: int = 3,
                 mmt_layers: int = 3,
                 num_ista: int = 2) -> Dict[str, np.ndarray]:
    """Reference MIST state dict (pythia/models/mist.py:30-625 +
    modules/mist_module/mist_module.py) -> flat {path: array} for
    models/mist.MIST.

    Skipped reference parameters are dead in its forward: the bundled CLIP
    tower, DistilBERT Transformers (MIST_VideoQA.ttrans, ISTA.mmt), the
    position/token-type embedding stacks, vqproj, crossmodal_matching, and
    each ISTA's segment/patch embedding projections (computed then
    discarded by the caller, mist.py:595-597)."""
    out: Dict[str, np.ndarray] = {}
    convert_text_bert(sd, "text_bert", "text_bert", text_layers, out)

    _emit(
        [
            ("frame_embeddings", "frame_embeddings", "embed"),
            ("linear_obj_feat_to_mmt_in", "linear_obj_feat_to_mmt_in", "linear"),
            ("obj_feat_layer_norm", "obj_feat_layer_norm", "ln"),
            ("temporal_position_embeddings", "temporal_position_embeddings", "embed"),
            ("track_position_embeddings", "track_position_embeddings", "embed"),
            ("linear_ocr_feat_to_mmt_in", "linear_ocr_feat_to_mmt_in", "linear"),
            ("linear_ocr_bbox_to_mmt_in", "linear_ocr_bbox_to_mmt_in", "linear"),
            ("ocr_feat_layer_norm", "ocr_feat_layer_norm", "ln"),
            ("ocr_bbox_layer_norm", "ocr_bbox_layer_norm", "ln"),
            # question pooling head (mist.py:413, :502-509)
            ("VideoQAmodel.self_attn", "q_self_attn", "linear"),
        ],
        sd, out,
    )

    for i in range(num_ista):
        t, f = f"VideoQAmodel.ISTA.{i}", f"ista_{i}"
        entries = []
        for sel in ("seg_selector", "reg_selector"):
            entries += [
                (f"{t}.{sel}.linear_Q", f"{f}/{sel}/linear_Q", "linear"),
                (f"{t}.{sel}.norm_Q", f"{f}/{sel}/norm_Q", "ln"),
                (f"{t}.{sel}.linear_K", f"{f}/{sel}/linear_K", "linear"),
                (f"{t}.{sel}.norm_K", f"{f}/{sel}/norm_K", "ln"),
            ]
        _emit(entries, sd, out)

    convert_bert_encoder(sd, "mmt.encoder", "mmt", mmt_layers, out)
    p = "mmt.prev_pred_embeddings"
    fp = "prev_pred_embeddings"
    _emit(
        [
            (f"{p}.position_embeddings", f"{fp}/position_embeddings", "embed"),
            (f"{p}.token_type_embeddings", f"{fp}/token_type_embeddings", "embed"),
            (f"{p}.ans_layer_norm", f"{fp}/ans_ln", "ln"),
            (f"{p}.ocr_layer_norm", f"{fp}/ocr_ln", "ln"),
            (f"{p}.emb_layer_norm", f"{fp}/emb_ln", "ln"),
            ("ocr_ptr_net.query", "ocr_ptr_net/query", "linear"),
            ("ocr_ptr_net.key", "ocr_ptr_net/key", "linear"),
        ],
        sd, out,
    )
    cls_key = ("classifier.module.weight" if "classifier.module.weight" in sd
               else "classifier.weight")
    out["classifier/weight"] = sd[cls_key]
    out["classifier/bias"] = sd[cls_key.replace("weight", "bias")]
    return out


def unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, arr in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, path))
        else:
            out[path] = v
    return out


def convert_into_params(flat: Dict[str, np.ndarray], params: Any,
                        strict: bool = True) -> Any:
    """Graft converted arrays into an existing flax param tree (shape- and
    dtype-checked); returns the new tree.  With strict=True every converted
    array must land somewhere and match shapes."""
    import jax

    target = flatten(jax.tree_util.tree_map(np.asarray, params))
    missing = [k for k in flat if k not in target]
    if strict and missing:
        raise KeyError(f"converted keys not in model params: {missing[:8]}...")
    merged = dict(target)
    for k, arr in flat.items():
        if k not in merged:
            continue
        if merged[k].shape != arr.shape:
            raise ValueError(f"{k}: shape {arr.shape} != model {merged[k].shape}")
        merged[k] = arr.astype(merged[k].dtype)
    return unflatten(merged)


# -- ViT (HF ViTModel) ------------------------------------------------------

def load_torch_vit_params(path: str, cfg) -> Any:
    """HF ViTModel checkpoint file -> vitxtgqa_tpu.models.vit.ViT params."""
    return convert_vit_state(load_state_dict(path), cfg)


def convert_vit_state(sd: Dict[str, np.ndarray], cfg) -> Any:
    """HF ViTModel state dict -> vitxtgqa_tpu.models.vit.ViT params."""
    sd = {k.replace("vit.", "", 1) if k.startswith("vit.") else k: v
          for k, v in sd.items()}
    out: Dict[str, np.ndarray] = {}
    # patchify conv: torch [D, 3, P, P] -> flax [P, P, 3, D]
    w = sd["embeddings.patch_embeddings.projection.weight"]
    out["patch_embed/kernel"] = w.transpose(2, 3, 1, 0)
    out["patch_embed/bias"] = sd["embeddings.patch_embeddings.projection.bias"]
    out["cls_token"] = sd["embeddings.cls_token"][0]
    out["pos_embedding"] = sd["embeddings.position_embeddings"]
    for i in range(cfg.num_layers):
        t = f"encoder.layer.{i}"
        f = f"layer_{i}"
        pairs = [
            (f"{t}.attention.attention.query", f"{f}/query", "linear"),
            (f"{t}.attention.attention.key", f"{f}/key", "linear"),
            (f"{t}.attention.attention.value", f"{f}/value", "linear"),
            (f"{t}.attention.output.dense", f"{f}/attn_out", "linear"),
            (f"{t}.layernorm_before", f"{f}/ln1", "ln"),
            (f"{t}.intermediate.dense", f"{f}/mlp_in", "linear"),
            (f"{t}.output.dense", f"{f}/mlp_out", "linear"),
            (f"{t}.layernorm_after", f"{f}/ln2", "ln"),
        ]
        _emit(pairs, sd, out)
    _emit([("layernorm", "ln_final", "ln")], sd, out)
    # fix cls/pos shapes to [1, ...]
    out["cls_token"] = out["cls_token"].reshape(1, 1, -1)
    return unflatten(out)
