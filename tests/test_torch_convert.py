"""Weight-conversion tests: the name map must cover the T2S param tree
exactly (dead reference params excluded) and preserve values."""

import numpy as np
import jax
import pytest

from vitxtgqa_tpu.utils import torch_convert as TC


def _fake_linear(sd, name, din, dout):
    sd[f"{name}.weight"] = np.random.randn(dout, din).astype(np.float32)
    sd[f"{name}.bias"] = np.random.randn(dout).astype(np.float32)


def _fake_ln(sd, name, d):
    sd[f"{name}.weight"] = np.random.randn(d).astype(np.float32)
    sd[f"{name}.bias"] = np.random.randn(d).astype(np.float32)


def _fake_embed(sd, name, n, d):
    sd[f"{name}.weight"] = np.random.randn(n, d).astype(np.float32)


def _fake_bert_layer(sd, prefix, d, ffn):
    for part in ("query", "key", "value"):
        _fake_linear(sd, f"{prefix}.attention.self.{part}", d, d)
    _fake_linear(sd, f"{prefix}.attention.output.dense", d, d)
    _fake_ln(sd, f"{prefix}.attention.output.LayerNorm", d)
    _fake_linear(sd, f"{prefix}.intermediate.dense", d, ffn)
    _fake_linear(sd, f"{prefix}.output.dense", ffn, d)
    _fake_ln(sd, f"{prefix}.output.LayerNorm", d)


def _make_reference_t2s_state(hidden=64, ffn=128, text_layers=1, qtv=1, mmt=2,
                              vocab=100, nv=17, vf=32, ft=16, ph=24):
    sd = {}
    _fake_embed(sd, "text_bert.embeddings.word_embeddings", vocab, hidden)
    _fake_embed(sd, "text_bert.embeddings.position_embeddings", 32, hidden)
    _fake_embed(sd, "text_bert.embeddings.token_type_embeddings", 2, hidden)
    _fake_ln(sd, "text_bert.embeddings.LayerNorm", hidden)
    for i in range(text_layers):
        _fake_bert_layer(sd, f"text_bert.encoder.layer.{i}", hidden, ffn)
    _fake_embed(sd, "frame_embeddings", 4000, 50)
    _fake_embed(sd, "temporal_position_embeddings", 4000, 50)
    _fake_embed(sd, "track_position_embeddings", 4000, 50)
    _fake_linear(sd, "linear_obj_feat_to_mmt_in", vf + 50, hidden)
    _fake_ln(sd, "obj_feat_layer_norm", hidden)
    _fake_linear(sd, "linear_ocr_feat_to_mmt_in", ft + ph + 100, hidden)
    _fake_linear(sd, "linear_ocr_bbox_to_mmt_in", 4, hidden)
    _fake_ln(sd, "ocr_feat_layer_norm", hidden)
    _fake_ln(sd, "ocr_bbox_layer_norm", hidden)
    for i in range(qtv):
        _fake_bert_layer(sd, f"TransLayer.encoder.layer.{i}", hidden, ffn)
    _fake_linear(sd, "Grounding_Module.q_linear", hidden, hidden)
    _fake_linear(sd, "Grounding_Module.self_attn", hidden, 1)
    for i in range(mmt):
        _fake_bert_layer(sd, f"mmt.encoder.layer.{i}", hidden, ffn)
    _fake_embed(sd, "mmt.prev_pred_embeddings.position_embeddings", 100, hidden)
    _fake_embed(sd, "mmt.prev_pred_embeddings.token_type_embeddings", 5, hidden)
    _fake_ln(sd, "mmt.prev_pred_embeddings.ans_layer_norm", hidden)
    _fake_ln(sd, "mmt.prev_pred_embeddings.ocr_layer_norm", hidden)
    _fake_ln(sd, "mmt.prev_pred_embeddings.emb_layer_norm", hidden)
    _fake_linear(sd, "ocr_ptr_net.query", hidden, hidden)
    _fake_linear(sd, "ocr_ptr_net.key", hidden, hidden)
    sd["classifier.module.weight"] = np.random.randn(nv, hidden).astype(np.float32)
    sd["classifier.module.bias"] = np.random.randn(nv).astype(np.float32)
    return sd


def test_t2s_conversion_covers_model_params():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_t2s_model import tiny_config, tiny_batch, NV, N

    from vitxtgqa_tpu.models.t2s import T2S

    model = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2)
    batch = tiny_batch(0)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "gumbel": jax.random.key(2)},
        batch, train=True,
    )
    params = variables["params"]

    sd = _make_reference_t2s_state()
    flat = TC.convert_t2s_like(sd, text_layers=1, qtv_layers=1, mmt_layers=2)

    target_keys = set(TC.flatten(jax.tree_util.tree_map(np.asarray, params)))
    converted_keys = set(flat)
    # every converted key must exist in the model
    assert converted_keys <= target_keys, sorted(converted_keys - target_keys)[:5]
    # the model must be fully covered
    missing = target_keys - converted_keys
    assert not missing, sorted(missing)[:8]

    new_params = TC.convert_into_params(flat, params)
    # values preserved: linear kernels transposed from torch layout
    np.testing.assert_allclose(
        np.asarray(new_params["ocr_ptr_net"]["query"]["kernel"]),
        sd["ocr_ptr_net.query.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["classifier"]["weight"]),
        sd["classifier.module.weight"],
    )
    # and the model still runs with converted weights
    out = model.apply(
        {"params": new_params}, batch, train=False,
        rngs={"gumbel": jax.random.key(5)},
    )
    assert np.isfinite(np.asarray(out["pos_scores"])).all()


def test_shape_mismatch_raises():
    sd = _make_reference_t2s_state()
    flat = TC.convert_t2s_like(sd, text_layers=1, qtv_layers=1, mmt_layers=2)
    flat["classifier/weight"] = np.zeros((3, 3), np.float32)
    fake_params = TC.unflatten(
        {k: np.zeros_like(v) for k, v in flat.items() if k != "classifier/weight"}
    )
    fake_params["classifier"] = {"weight": np.zeros((17, 64), np.float32)}
    with pytest.raises(ValueError):
        TC.convert_into_params(flat, fake_params, strict=False)


def test_m4c_conversion_covers_model_params():
    import numpy as np

    from vitxtgqa_tpu.models.m4c import M4C
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch, tiny_model_config

    FRAMES, OPF = 8, 3
    N = FRAMES * OPF
    cfg = tiny_model_config(hidden=64, frames=FRAMES, ocr_per_frame=OPF)
    batch = synthetic_batch(
        batch=2, frames=FRAMES, ocr_per_frame=OPF, dec_steps=4, text_len=10,
        video_feat_dim=32, fasttext_dim=16, phoc_dim=24,
        num_final_outputs=32 + N, text_vocab=128,
    )
    model = M4C(config=cfg, num_final_outputs=32 + N, bos_idx=2)
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "gumbel": jax.random.key(2)},
        batch, train=True,
    )["params"]

    sd = _make_reference_t2s_state(vf=32, ft=16, ph=24, nv=32)
    # m4c: obj input is the raw middle-frame feature, ocr is fasttext+phoc
    _fake_linear(sd, "linear_obj_feat_to_mmt_in", 32, 64)
    _fake_linear(sd, "linear_ocr_feat_to_mmt_in", 16 + 24, 64)
    _fake_linear(sd, "PostHoc.q_linear", 64, 64)
    _fake_linear(sd, "PostHoc.self_attn", 64, 1)
    flat = TC.convert_t2s_like(
        sd, text_layers=1, mmt_layers=2, has_qtv=False, has_grounding=False,
        has_posthoc=True, obj_has_frame_embed=False, ocr_has_ids=False,
    )
    target_keys = set(TC.flatten(jax.tree_util.tree_map(np.asarray, params)))
    assert set(flat) <= target_keys, sorted(set(flat) - target_keys)[:5]
    assert not (target_keys - set(flat)), sorted(target_keys - set(flat))[:8]
