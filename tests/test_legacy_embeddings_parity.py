"""Legacy embeddings/attention parity vs the reference torch modules
(reference: pythia/modules/embeddings.py, pythia/modules/attention.py)
with converted weights on shared inputs.  Skipped when torch or the
reference tree is unavailable.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/pythia/modules"


def _load_ref(name, fname, stub_deps=()):
    path = os.path.join(REF_DIR, fname)
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    for dep in stub_deps:
        if dep not in sys.modules:
            sys.modules[dep] = types.ModuleType(dep)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _np(t):
    return t.detach().numpy()


def _lin(w):
    return np.transpose(w.detach().numpy())


def _torch_gru_layer_params(rnn, layer=0, H=None):
    """torch GRU gate rows (r, z, n) -> flax GRUCell param dict."""
    w_ih = _np(getattr(rnn, f"weight_ih_l{layer}"))
    w_hh = _np(getattr(rnn, f"weight_hh_l{layer}"))
    b_ih = _np(getattr(rnn, f"bias_ih_l{layer}"))
    b_hh = _np(getattr(rnn, f"bias_hh_l{layer}"))
    H = H or w_hh.shape[1]
    s = lambda i: slice(i * H, (i + 1) * H)
    return {
        "ir": {"kernel": w_ih[s(0)].T, "bias": b_ih[s(0)] + b_hh[s(0)]},
        "iz": {"kernel": w_ih[s(1)].T, "bias": b_ih[s(1)] + b_hh[s(1)]},
        "in": {"kernel": w_ih[s(2)].T, "bias": b_ih[s(2)]},
        "hr": {"kernel": w_hh[s(0)].T},
        "hz": {"kernel": w_hh[s(1)].T},
        "hn": {"kernel": w_hh[s(2)].T, "bias": b_hh[s(2)]},
    }


def _torch_lstm_layer_params(rnn, layer=0, suffix=""):
    """torch LSTM gate rows (i, f, g, o) -> flax OptimizedLSTMCell params."""
    w_ih = _np(getattr(rnn, f"weight_ih_l{layer}{suffix}"))
    w_hh = _np(getattr(rnn, f"weight_hh_l{layer}{suffix}"))
    b_ih = _np(getattr(rnn, f"bias_ih_l{layer}{suffix}"))
    b_hh = _np(getattr(rnn, f"bias_hh_l{layer}{suffix}"))
    H = w_hh.shape[1]
    s = lambda i: slice(i * H, (i + 1) * H)
    out = {}
    for j, g in enumerate("ifgo"):
        out[f"i{g}"] = {"kernel": w_ih[s(j)].T}
        out[f"h{g}"] = {"kernel": w_hh[s(j)].T, "bias": b_ih[s(j)] + b_hh[s(j)]}
    return out


@pytest.fixture(scope="module")
def ref_emb():
    # embeddings.py imports pythia Vocab utilities at module scope; provide
    # just enough package scaffolding for a standalone import
    import pythia  # noqa: F401  (the reference root is importable via path?)
    return None


def _load_ref_embeddings():
    """Import the reference embeddings/attention/layers as the real pythia
    package, stubbing only the unavailable torchtext-backed vocab module."""
    if not os.path.exists(os.path.join(REF_DIR, "embeddings.py")):
        pytest.skip("reference tree not mounted")
    if "pythia.utils.vocab" not in sys.modules:
        stub = types.ModuleType("pythia.utils.vocab")
        stub.Vocab = object
        sys.modules["pythia.utils.vocab"] = stub
    sys.path.insert(0, "/root/reference")
    try:
        from pythia.modules import attention as real_attention
        from pythia.modules import embeddings as mod
        from pythia.modules import layers as real_layers
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference modules not importable here: {e}")
    finally:
        sys.path.remove("/root/reference")
    return mod, real_attention, real_layers


def test_bilstm_gru_parity():
    mod, _, _ = _load_ref_embeddings()
    torch.manual_seed(0)
    tm = mod.BiLSTMTextEmbedding(
        hidden_dim=12, embedding_dim=8, num_layers=1, dropout=0.0,
        bidirectional=True, rnn_type="GRU",
    ).eval()

    from vitxtgqa_tpu.models.embeddings import BiLSTMTextEmbedding

    rng = np.random.RandomState(0)
    x = rng.randn(3, 7, 8).astype(np.float32)
    with torch.no_grad():
        want_all, _ = tm.recurrent_encoder(torch.from_numpy(x))
        want_last = tm(torch.from_numpy(x)).numpy()
        want_all = want_all.numpy()

    params = {
        "recurrent_encoder": {
            "fwd_0": _torch_gru_layer_params(tm.recurrent_encoder),
        }
    }
    # reverse-direction weights
    w = tm.recurrent_encoder
    rev = {
        "ir": {"kernel": _np(w.weight_ih_l0_reverse)[0:12].T,
               "bias": _np(w.bias_ih_l0_reverse)[0:12] + _np(w.bias_hh_l0_reverse)[0:12]},
        "iz": {"kernel": _np(w.weight_ih_l0_reverse)[12:24].T,
               "bias": _np(w.bias_ih_l0_reverse)[12:24] + _np(w.bias_hh_l0_reverse)[12:24]},
        "in": {"kernel": _np(w.weight_ih_l0_reverse)[24:36].T,
               "bias": _np(w.bias_ih_l0_reverse)[24:36]},
        "hr": {"kernel": _np(w.weight_hh_l0_reverse)[0:12].T},
        "hz": {"kernel": _np(w.weight_hh_l0_reverse)[12:24].T},
        "hn": {"kernel": _np(w.weight_hh_l0_reverse)[24:36].T,
               "bias": _np(w.bias_hh_l0_reverse)[24:36]},
    }
    params["recurrent_encoder"]["bwd_0"] = rev

    jm = BiLSTMTextEmbedding(hidden_dim=12, bidirectional=True, rnn_type="GRU")
    got_all = jm.apply({"params": params}, x, method=BiLSTMTextEmbedding.forward_all)
    got_last = jm.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got_all), want_all, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_last), want_last, atol=2e-5)


def test_attention_text_embedding_parity():
    mod, _, _ = _load_ref_embeddings()
    torch.manual_seed(1)
    tm = mod.AttentionTextEmbedding(
        hidden_dim=10, embedding_dim=6, num_layers=1, dropout=0.0,
        conv1_out=8, conv2_out=2, kernel_size=1, padding=0,
    ).eval()

    from vitxtgqa_tpu.models.embeddings import AttentionTextEmbedding

    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 6).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    def conv1d_params(conv):  # torch [out, in, k] -> flax [k, in, out]
        return {
            "kernel": np.transpose(_np(conv.weight), (2, 1, 0)),
            "bias": _np(conv.bias),
        }

    params = {
        "recurrent_unit": {
            "fwd_0": _torch_lstm_layer_params(tm.recurrent_unit),
        },
        "conv1": conv1d_params(tm.conv1),
        "conv2": conv1d_params(tm.conv2),
    }
    jm = AttentionTextEmbedding(
        hidden_dim=10, conv1_out=8, conv2_out=2, kernel_size=1, padding=0,
    )
    got = jm.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_top_down_attention_parity():
    _, ref_attention, ref_layers = (_load_ref_embeddings())
    torch.manual_seed(2)
    combine = ref_layers.ModalCombineLayer(
        "non_linear_element_multiply", 16, 12, hidden_dim=20, dropout=0.0,
    )
    transform = ref_layers.TransformLayer("linear", combine.out_dim, 2)
    tm = ref_attention.TopDownAttention(combine, transform, "softmax").eval()

    from vitxtgqa_tpu.models.attention_legacy import TopDownAttention

    rng = np.random.RandomState(2)
    img = rng.randn(3, 6, 16).astype(np.float32)
    q = rng.randn(3, 12).astype(np.float32)
    locs = np.asarray([6, 4, 2], np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(img), torch.from_numpy(q),
                  torch.from_numpy(locs)).numpy()

    def wn_linear(lin):
        """torch weight_norm(dim=None) Linear -> (v, g scalar, bias)."""
        if hasattr(lin, "parametrizations"):
            g = _np(lin.parametrizations.weight.original0)
            v = _np(lin.parametrizations.weight.original1)
        else:  # older torch API
            g, v = _np(lin.weight_g), _np(lin.weight_v)
        return v, np.float32(g.reshape(())), _np(lin.bias)

    def relu_wn_fc(m):
        v, g, b = wn_linear(m.layers[0])
        return {"v": v.T, "g": g, "b": b}

    v, g, b = wn_linear(tm.transform.module.lc)
    eff_w = g * v / np.linalg.norm(v)
    params = {
        "combine": {"module": {
            "fa_image": relu_wn_fc(tm.combination_layer.module.fa_image),
            "fa_txt": relu_wn_fc(tm.combination_layer.module.fa_txt),
        }},
        "transform": {"kernel": eff_w.T, "bias": b},
    }
    jm = TopDownAttention(
        combine_type="non_linear_element_multiply",
        combine_params={"hidden_dim": 20},
        transform_out_dim=2,
    )
    got = jm.apply({"params": params}, img, q, locs)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
