"""Parity of the MIST auxiliary modules vs the reference mist_module
(reference: pythia/modules/mist_module/{mist_module.py,EncoderVid.py,
language_model.py}) with converted weights on shared inputs.

Skipped when the reference tree or transformers isn't available.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

REF_DIR = "/root/reference/pythia/modules/mist_module"


def _load(name, fname):
    path = os.path.join(REF_DIR, fname)
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mm():
    return _load("ref_mist_module", "mist_module.py")


@pytest.fixture(scope="module")
def ref_ev():
    return _load("ref_encoder_vid", "EncoderVid.py")


def _lin(w):
    return np.transpose(w.detach().numpy())


def _np(t):
    return t.detach().numpy()


def test_sinusoidal_embeddings(ref_mm):
    from vitxtgqa_tpu.models.mist_text import sinusoidal_embeddings

    out = torch.empty(10, 8)
    out.requires_grad = False
    ref_mm.create_sinusoidal_embeddings(10, 8, out)
    np.testing.assert_allclose(
        sinusoidal_embeddings(10, 8), out.numpy(), atol=1e-6
    )


def test_distil_transformer_parity(ref_mm):
    from transformers import DistilBertConfig

    from vitxtgqa_tpu.models.mist_text import DistilConfig, DistilTransformer

    torch.manual_seed(0)
    tcfg = DistilBertConfig(
        dim=64, n_heads=4, n_layers=2, hidden_dim=128, dropout=0.0,
        attention_dropout=0.0, activation="gelu",
    )
    tmodel = ref_mm.Transformer(tcfg).eval()

    params = {}
    for i, blk in enumerate(tmodel.layer):
        params[f"layer_{i}"] = {
            "attention": {
                "q_lin": {"kernel": _lin(blk.attention.q_lin.weight),
                          "bias": _np(blk.attention.q_lin.bias)},
                "k_lin": {"kernel": _lin(blk.attention.k_lin.weight),
                          "bias": _np(blk.attention.k_lin.bias)},
                "v_lin": {"kernel": _lin(blk.attention.v_lin.weight),
                          "bias": _np(blk.attention.v_lin.bias)},
                "out_lin": {"kernel": _lin(blk.attention.out_lin.weight),
                            "bias": _np(blk.attention.out_lin.bias)},
            },
            "sa_layer_norm": {"scale": _np(blk.sa_layer_norm.weight),
                              "bias": _np(blk.sa_layer_norm.bias)},
            "ffn": {
                "lin1": {"kernel": _lin(blk.ffn.lin1.weight),
                         "bias": _np(blk.ffn.lin1.bias)},
                "lin2": {"kernel": _lin(blk.ffn.lin2.weight),
                         "bias": _np(blk.ffn.lin2.bias)},
            },
            "output_layer_norm": {"scale": _np(blk.output_layer_norm.weight),
                                  "bias": _np(blk.output_layer_norm.bias)},
        }

    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 64).astype(np.float32)
    mask = np.ones((2, 7), np.float32)
    mask[1, 5:] = 0.0

    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(x), attn_mask=torch.from_numpy(mask)
        )[0].numpy()

    cfg = DistilConfig(dim=64, n_heads=4, n_layers=2, hidden_dim=128,
                       dropout=0.0, attention_dropout=0.0)
    got = DistilTransformer(cfg).apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_encoder_vid_parity(ref_ev):
    from vitxtgqa_tpu.models.mist_text import EncoderVid

    torch.manual_seed(1)
    tmodel = ref_ev.EncoderVid(
        feat_dim=16, bbox_dim=5, feat_hidden=32, pos_hidden=8
    ).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(1)
    video_o = rng.randn(2, 1, 4, 3, 21).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(video_o)).numpy()

    def conv_kernel(conv):  # [out, in, 1, 1] -> [in, out]
        return np.transpose(conv.weight.detach().numpy()[:, :, 0, 0])

    def bn_params(bn):
        return (
            {"scale": _np(bn.weight), "bias": _np(bn.bias)},
            {"mean": _np(bn.running_mean), "var": _np(bn.running_var)},
        )

    bn1_p, bn1_s = bn_params(tmodel.bbox_conv[1])
    bn2_p, bn2_s = bn_params(tmodel.bbox_conv[4])
    variables = {
        "params": {
            "bbox_conv1": {"kernel": conv_kernel(tmodel.bbox_conv[0]),
                           "bias": _np(tmodel.bbox_conv[0].bias)},
            "bbox_bn1": bn1_p,
            "bbox_conv2": {"kernel": conv_kernel(tmodel.bbox_conv[3]),
                           "bias": _np(tmodel.bbox_conv[3].bias)},
            "bbox_bn2": bn2_p,
            "tohid": {"kernel": _lin(tmodel.tohid[0].weight),
                      "bias": _np(tmodel.tohid[0].bias)},
        },
        "batch_stats": {"bbox_bn1": bn1_s, "bbox_bn2": bn2_s},
    }
    got = EncoderVid(feat_dim=16, bbox_dim=5, feat_hidden=32, pos_hidden=8).apply(
        variables, video_o
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_fusion_embeddings_parity(ref_mm):
    from vitxtgqa_tpu.models.mist_text import FusionEmbeddings

    torch.manual_seed(2)
    tmodel = ref_mm.Embeddings(
        d_model=16, language_len=3, vision_len=4, dropout=0.0,
        sinusoidal_pos_embds=True,
    ).eval()
    rng = np.random.RandomState(2)
    x = rng.randn(2, 7, 16).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    variables = {
        "params": {
            "position_embeddings": _np(tmodel.position_embeddings.weight),
            "modality_embedding": _np(tmodel.modality_embedding.weight),
            "LayerNorm": {"scale": _np(tmodel.LayerNorm.weight),
                          "bias": _np(tmodel.LayerNorm.bias)},
        }
    }
    got = FusionEmbeddings(
        d_model=16, language_len=3, vision_len=4, dropout=0.0,
        sinusoidal_pos_embds=True,
    ).apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_position_and_token_type_embeddings(ref_mm):
    from vitxtgqa_tpu.models.mist_text import (
        PositionEmbeddings,
        TokenTypeEmbeddings,
    )

    torch.manual_seed(3)
    tpos = ref_mm.PositionEmbeddings(8, 10, True).eval()
    rng = np.random.RandomState(3)
    x3 = rng.randn(2, 5, 8).astype(np.float32)
    x4 = rng.randn(2, 5, 3, 8).astype(np.float32)
    with torch.no_grad():
        w3 = tpos(torch.from_numpy(x3)).numpy()
        w4 = tpos(torch.from_numpy(x4)).numpy()
    variables = {"params": {
        "position_embeddings": _np(tpos.position_embeddings.weight)
    }}
    mod = PositionEmbeddings(8, 10, True)
    np.testing.assert_allclose(np.asarray(mod.apply(variables, x3)), w3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mod.apply(variables, x4)), w4, atol=1e-6)

    ttype = ref_mm.TokenTypeEmbeddings(8, 3).eval()
    with torch.no_grad():
        wt = ttype(torch.from_numpy(x3), "segment").numpy()
    got = TokenTypeEmbeddings(8, 3).apply(
        {"params": {"modality_embedding": _np(ttype.modality_embedding.weight)}},
        x3, "segment",
    )
    # reference returns [L, D] broadcastable; ours returns [B, L, D]
    np.testing.assert_allclose(
        np.asarray(got), np.broadcast_to(wt, got.shape), atol=1e-6
    )


def test_sentence_maxpool_and_amodel_shapes():
    from vitxtgqa_tpu.models.common import TransformerConfig
    from vitxtgqa_tpu.models.mist_text import AModel, SentenceMaxpool

    import jax

    rng = np.random.RandomState(4)
    x = rng.randn(2, 6, 16).astype(np.float32)
    sm = SentenceMaxpool(8)
    params = sm.init(jax.random.key(0), x)
    out = sm.apply(params, x)
    assert out.shape == (2, 8) and (np.asarray(out) >= 0).all()

    cfg = TransformerConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, vocab_size=50,
    )
    am = AModel(out_dim=12, bert_cfg=cfg)
    tokens = rng.randint(1, 50, size=(2, 3, 5)).astype(np.int32)
    variables = am.init(jax.random.key(1), tokens)
    out = am.apply(variables, tokens)
    assert out.shape == (2, 3, 12)
    out2 = am.apply(variables, tokens[:, 0])
    assert out2.shape == (2, 12)
