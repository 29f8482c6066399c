"""FULL-MODEL parity for the legacy image-VQA models vs the reference torch
implementations (reference: pythia/models/pythia.py:16-300, lorra.py:9-62,
ban.py:12-97) on converted weights and shared inputs.

The reference models are built through their real config-driven build()
(registry-backed word embedding, AttentionTextEmbedding stack, top-down
ImageEmbedding list, modal combine, classifier), random-init; every weight
is converted (weight-norm reparam kept: v/g/b) and the flax rebuilds in
models/legacy_vqa.py must match the eval-mode forward to fp32 tolerance.

Not covered here, with reasons documented in models/legacy_vqa.py:
  * pythia_question_only / pythia_image_only — the reference forwards are
    non-runnable as written (they feed raw token ids into the text LSTM,
    pythia.py:303,331); the rebuilds keep the zeroed-text quirk and are
    behaviourally tested in test_legacy_vqa.py.
  * top_down_bottom_up — non-constructible in the reference
    (top_down_bottom_up.py:14-30).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "pythia")),
    reason="reference tree not mounted",
)

# EMBED is pinned to 300: the reference word embedding is hardcoded
# vocab.get_embedding(nn.Embedding, embedding_dim=300) (pythia.py:36)
VOCAB, EMBED, HIDDEN, NOUT = 50, 300, 24, 11
B, T, K, DV, NCTX, DC = 2, 7, 6, 20, 5, 18


# ---------------------------------------------------------------------------
# reference package scaffolding
# ---------------------------------------------------------------------------

class _FakeVocab:
    def get_embedding(self, cls, embedding_dim):
        return cls(VOCAB, embedding_dim)


@pytest.fixture(scope="module")
def refmodels():
    # same shims the videoqa full-model harness installs: modern HF
    # transformers as pytorch_transformers, repo Levenshtein as editdistance
    from tests.test_t2s_full_model_parity import (
        _install_pytorch_transformers_shim,
    )

    _install_pytorch_transformers_shim()
    if "demjson" not in sys.modules:  # pythia.utils.configuration import
        import json as _json

        dj = types.ModuleType("demjson")
        dj.decode = _json.loads
        sys.modules["demjson"] = dj
    if "pythia.utils.vocab" not in sys.modules:
        stub = types.ModuleType("pythia.utils.vocab")
        stub.Vocab = object
        sys.modules["pythia.utils.vocab"] = stub
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from pythia.common.registry import registry as ref_registry

    from vitxtgqa_tpu.core.config import ConfigNode

    if ref_registry.get("config", no_warning=True) is None:
        ref_registry.register("config", ConfigNode({"datasets": "vtextgqa"}))
        ref_registry.register(
            "writer", types.SimpleNamespace(write=lambda *a, **k: None)
        )
    ref_registry.register(
        "vtextgqa_text_processor", types.SimpleNamespace(vocab=_FakeVocab())
    )
    ref_registry.register("vtextgqa_num_final_outputs", NOUT)
    import pythia.models.ban as ref_ban
    import pythia.models.lorra as ref_lorra
    import pythia.models.pythia as ref_pythia

    return types.SimpleNamespace(
        pythia=ref_pythia, lorra=ref_lorra, ban=ref_ban
    )


# ---------------------------------------------------------------------------
# configs (MMF pythia.yml schema, shrunk dims)
# ---------------------------------------------------------------------------

def _pythia_cfg(context=False):
    d = {
        "model_data_dir": "/tmp",
        "vocab_size": VOCAB,
        "embed_dim": EMBED,
        "hidden_dim": HIDDEN,
        "text_embeddings": [{
            "type": "attention",
            "params": {
                "hidden_dim": HIDDEN, "embedding_dim": EMBED,
                "num_layers": 1, "dropout": 0.0, "conv1_out": 8,
                "conv2_out": 2, "kernel_size": 1, "padding": 0,
            },
        }],
        "image_feature_encodings": [{"type": "default", "params": {}}],
        "image_feature_dim": DV,
        "image_feature_embeddings": [{
            "modal_combine": {
                "type": "non_linear_element_multiply",
                "params": {"dropout": 0.0, "hidden_dim": HIDDEN},
            },
            "normalization": "softmax",
            "transform": {"type": "linear", "params": {"out_dim": 1}},
        }],
        "image_text_modal_combine": {
            "type": "non_linear_element_multiply",
            "params": {"dropout": 0.0, "hidden_dim": HIDDEN},
        },
        "classifier": {
            "type": "logit",
            "params": {"text_hidden_dim": HIDDEN, "img_hidden_dim": HIDDEN},
        },
    }
    if context:
        d["context_embeddings"] = [{
            "type": "identity", "params": {"embedding_dim": EMBED},
        }]
        d["context_feature_encodings"] = [{"type": "default", "params": {}}]
        d["context_feature_dim"] = DC
        d["context_feature_embeddings"] = [{
            "modal_combine": {
                "type": "non_linear_element_multiply",
                "params": {"dropout": 0.0, "hidden_dim": HIDDEN},
            },
            "normalization": "softmax",
            "transform": {"type": "linear", "params": {"out_dim": 1}},
        }]
        d["image_text_modal_combine"]["params"]["context_dim"] = DC
    return d


def _ban_cfg():
    return {
        "vocab_size": VOCAB,
        "embed_dim": EMBED,
        "hidden_dim": HIDDEN,
        "text_embedding": {
            "num_hidden": HIDDEN, "emb_size": EMBED, "num_layers": 1,
            "dropout": 0.0, "bidirectional": False, "rnn_type": "GRU",
        },
        "bilinear_attention": {
            "visual_feat_dim": DV, "gamma": 2,
            "bc_net": {"k": 3},
            "fc_net": {"activation": "ReLU", "dropout": 0.0},
        },
        "classifier": {"dropout": 0.0},
    }


def _batch():
    r = np.random.default_rng(5)
    return {
        "text": r.integers(1, VOCAB, (B, T)).astype(np.int64),
        "text_len": np.array([T, T - 2], np.int64),
        "image_feature_0": r.standard_normal((B, K, DV)).astype(np.float32),
        "context_feature_0": r.standard_normal((B, NCTX, DC)).astype(
            np.float32
        ),
    }


class _SampleList(types.SimpleNamespace):
    def __getitem__(self, k):
        return getattr(self, k)

    def get_batch_size(self):
        return self.text.shape[0]

    def get_fields(self, keys):
        return types.SimpleNamespace(
            **{k: getattr(self, k, None) for k in keys}
        )


def _torch_batch(batch):
    return _SampleList(**{
        k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()
    })


# ---------------------------------------------------------------------------
# weight conversion
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().numpy()


def _wn_linear(lin):
    """torch weight_norm(Linear, dim=None) -> {v, g(scalar), b}."""
    if hasattr(lin, "parametrizations"):
        g = _np(lin.parametrizations.weight.original0)
        v = _np(lin.parametrizations.weight.original1)
    else:
        g, v = _np(lin.weight_g), _np(lin.weight_v)
    return {"v": v.T, "g": np.float32(g.reshape(())), "b": _np(lin.bias)}


def _relu_wn_fc(m):
    return _wn_linear(m.layers[0])


def _dense(lin):
    return {"kernel": _np(lin.weight).T, "bias": _np(lin.bias)}


def _conv1d(conv):
    return {"kernel": np.transpose(_np(conv.weight), (2, 1, 0)),
            "bias": _np(conv.bias)}


def _lstm_layer(rnn, layer=0):
    w_ih, w_hh = _np(getattr(rnn, f"weight_ih_l{layer}")), _np(
        getattr(rnn, f"weight_hh_l{layer}")
    )
    b_ih, b_hh = _np(getattr(rnn, f"bias_ih_l{layer}")), _np(
        getattr(rnn, f"bias_hh_l{layer}")
    )
    H = w_hh.shape[1]
    s = lambda i: slice(i * H, (i + 1) * H)
    out = {}
    for j, g in enumerate("ifgo"):
        out[f"i{g}"] = {"kernel": w_ih[s(j)].T}
        out[f"h{g}"] = {"kernel": w_hh[s(j)].T, "bias": b_ih[s(j)] + b_hh[s(j)]}
    return out


def _gru_layer(rnn, layer=0):
    w_ih, w_hh = _np(getattr(rnn, f"weight_ih_l{layer}")), _np(
        getattr(rnn, f"weight_hh_l{layer}")
    )
    b_ih, b_hh = _np(getattr(rnn, f"bias_ih_l{layer}")), _np(
        getattr(rnn, f"bias_hh_l{layer}")
    )
    H = w_hh.shape[1]
    s = lambda i: slice(i * H, (i + 1) * H)
    return {
        "ir": {"kernel": w_ih[s(0)].T, "bias": b_ih[s(0)] + b_hh[s(0)]},
        "iz": {"kernel": w_ih[s(1)].T, "bias": b_ih[s(1)] + b_hh[s(1)]},
        "in": {"kernel": w_ih[s(2)].T, "bias": b_ih[s(2)]},
        "hr": {"kernel": w_hh[s(0)].T},
        "hz": {"kernel": w_hh[s(1)].T},
        "hn": {"kernel": w_hh[s(2)].T, "bias": b_hh[s(2)]},
    }


def _att_text_embedding(m):
    return {
        "recurrent_unit": {"fwd_0": _lstm_layer(m.recurrent_unit)},
        "conv1": _conv1d(m.conv1),
        "conv2": _conv1d(m.conv2),
    }


def _image_embedding(m):
    """reference ImageEmbedding -> flax ImageEmbedding tree."""
    td = m.image_attention_model.module  # TopDownAttention
    return {"image_attention_model": {"module": {
        "combine": {"module": {
            "fa_image": _relu_wn_fc(td.combination_layer.module.fa_image),
            "fa_txt": _relu_wn_fc(td.combination_layer.module.fa_txt),
        }},
        "transform": _wn_to_dense(td.transform.module.lc),
    }}}


def _wn_to_dense(lin):
    """collapse weight_norm(dim=None) into a plain Dense kernel (the flax
    TopDownAttention transform is a Dense — documented deviation in
    models/attention_legacy.py)."""
    p = _wn_linear(lin)
    v = p["v"]
    w = p["g"] * v / max(np.linalg.norm(v), 1e-12)
    return {"kernel": w, "bias": p["b"]}


def _nlem(m, context=False):
    out = {
        "fa_image": _relu_wn_fc(m.fa_image),
        "fa_txt": _relu_wn_fc(m.fa_txt),
    }
    if context:
        out["fa_context"] = _relu_wn_fc(m.fa_context)
    return out


def _logit_classifier(m):
    return {"module": {
        "f_o_text": _relu_wn_fc(m.f_o_text),
        "f_o_image": _relu_wn_fc(m.f_o_image),
        "linear_text": _dense(m.linear_text),
        "linear_image": _dense(m.linear_image),
    }}


def _fcnet(m):
    """reference FCNet -> {fc0: wn, fc1: wn, ...} (dropout layers skipped)."""
    out = {}
    i = 0
    for layer in m.main:
        if isinstance(layer, torch.nn.Linear):
            out[f"fc{i}"] = _wn_linear(layer)
            i += 1
    return out


def _bcnet(m, hmat_wn=False):
    out = {"v_net": _fcnet(m.v_net), "q_net": _fcnet(m.q_net)}
    if getattr(m, "h_out", None) is not None and m.h_out is not None:
        if hmat_wn:
            if hasattr(m, "parametrizations") and hasattr(
                m.parametrizations, "h_mat"
            ):
                g = _np(m.parametrizations.h_mat.original0)
                v = _np(m.parametrizations.h_mat.original1)
            else:
                g, v = _np(m.h_mat_g), _np(m.h_mat_v)
            out["h_mat_v"] = v
            out["h_mat_g"] = np.float32(g.reshape(()))
        else:
            out["h_mat"] = _np(m.h_mat)
        out["h_bias"] = _np(m.h_bias)
    return out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def _graft(zeros_tree, flat):
    """Place converted arrays into the eval_shape tree, asserting shapes."""
    import flax

    tree = flax.core.unfreeze(zeros_tree) if hasattr(
        zeros_tree, "unfreeze"
    ) else zeros_tree

    def put(node, path, val):
        key = path[0]
        assert key in node, (
            f"missing {'/'.join(path)}; have {sorted(node.keys())}"
        )
        if len(path) == 1:
            assert tuple(node[key].shape) == tuple(np.shape(val)), (
                "/".join(path), node[key].shape, np.shape(val),
            )
            node[key] = np.asarray(val, np.float32)
        else:
            put(node[key], path[1:], val)

    def walk(prefix, sub):
        for k, v in sub.items():
            if isinstance(v, dict):
                walk(prefix + [k], v)
            else:
                put(tree, prefix + [k], v)

    walk([], flat)
    return tree


def _init_zeros(model, batch, rngs=None):
    rngs = rngs or {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = jax.eval_shape(lambda: model.init(rngs, batch, train=False))
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables["params"]
    )


def test_pythia_full_model_parity(refmodels):
    from vitxtgqa_tpu.core.config import ConfigNode
    from vitxtgqa_tpu.models.legacy_vqa import PythiaModel

    torch.manual_seed(3)
    cfg = _pythia_cfg()
    tmodel = refmodels.pythia.Pythia(ConfigNode(cfg))
    tmodel.build()
    tmodel = tmodel.float().eval()

    batch = _batch()
    with torch.no_grad():
        want = tmodel.forward(_torch_batch(batch))["scores"].numpy()

    jmodel = PythiaModel(config=ConfigNode(cfg), num_final_outputs=NOUT)
    params = _init_zeros(jmodel, batch)
    conv = {
        "word_embedding": {"embedding": _np(tmodel.word_embedding.weight)},
        "text_embeddings_0": _att_text_embedding(
            tmodel.text_embeddings[0].module
        ),
        "image_feature_embeddings_list_0_0": _image_embedding(
            tmodel.image_feature_embeddings_list[0][0]
        ),
        "image_text_multi_modal_combine_layer": {"module": _nlem(
            tmodel.image_text_multi_modal_combine_layer.module
        )},
        "classifier": _logit_classifier(tmodel.classifier.module),
    }
    params = _graft(params, conv)
    got = jmodel.apply({"params": params}, batch, train=False)["scores"]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_lorra_full_model_parity(refmodels):
    from vitxtgqa_tpu.core.config import ConfigNode
    from vitxtgqa_tpu.models.legacy_vqa import LoRRA

    torch.manual_seed(4)
    cfg = _pythia_cfg(context=True)
    tmodel = refmodels.lorra.LoRRA(ConfigNode(cfg))
    tmodel.build()
    tmodel = tmodel.float().eval()

    batch = _batch()
    with torch.no_grad():
        want = tmodel.forward(_torch_batch(batch))["scores"].numpy()

    jmodel = LoRRA(config=ConfigNode(cfg), num_final_outputs=NOUT)
    params = _init_zeros(jmodel, batch)
    conv = {
        "word_embedding": {"embedding": _np(tmodel.word_embedding.weight)},
        "text_embeddings_0": _att_text_embedding(
            tmodel.text_embeddings[0].module
        ),
        "image_feature_embeddings_list_0_0": _image_embedding(
            tmodel.image_feature_embeddings_list[0][0]
        ),
        "context_feature_embeddings_list_0_0": _image_embedding(
            tmodel.context_feature_embeddings_list[0][0]
        ),
        "image_text_multi_modal_combine_layer": {"module": _nlem(
            tmodel.image_text_multi_modal_combine_layer.module, context=True
        )},
        "classifier": _logit_classifier(tmodel.classifier.module),
    }
    params = _graft(params, conv)
    got = jmodel.apply({"params": params}, batch, train=False)["scores"]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_ban_full_model_parity(refmodels):
    from vitxtgqa_tpu.core.config import ConfigNode
    from vitxtgqa_tpu.models.legacy_vqa import BAN

    torch.manual_seed(6)
    cfg = _ban_cfg()
    tmodel = refmodels.ban.BAN(ConfigNode(cfg))
    tmodel.build()
    tmodel = tmodel.float().eval()

    batch = _batch()
    with torch.no_grad():
        want = tmodel.forward(_torch_batch(batch))["scores"].numpy()

    jmodel = BAN(config=ConfigNode(cfg), num_final_outputs=NOUT)
    params = _init_zeros(jmodel, batch)
    conv = {
        "word_embedding": {"embedding": _np(tmodel.word_embedding.weight)},
        "q_emb": {"recurrent_encoder": {
            "fwd_0": _gru_layer(tmodel.q_emb.recurrent_encoder),
        }},
        "v_att": {"logits_net": _bcnet(tmodel.v_att.logits, hmat_wn=True)},
        "b_net_0": _bcnet(tmodel.b_net[0]),
        "b_net_1": _bcnet(tmodel.b_net[1]),
        "q_prj_0": _fcnet(tmodel.q_prj[0]),
        "q_prj_1": _fcnet(tmodel.q_prj[1]),
        "classifier": {
            "fc1": _wn_linear(tmodel.classifier.main[0]),
            "fc2": _wn_linear(tmodel.classifier.main[3]),
        },
    }
    params = _graft(params, conv)
    got = jmodel.apply({"params": params}, batch, train=False)["scores"]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
