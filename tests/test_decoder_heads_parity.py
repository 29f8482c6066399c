"""Numeric parity of OcrPtrNet and PrevPredEmbeddings vs torch constructions
of the reference formulas (t2s.py:636-723): pointer scores = scaled q.k^T +
raw 0/1 mask; decoder-slot embeddings = LN'd table gather + position/type
embeddings through a final LN."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitxtgqa_tpu.models.common import (
    OcrPtrNet,
    PrevPredEmbeddings,
    TransformerConfig,
)


def test_ocr_ptr_net_matches_torch():
    torch = pytest.importorskip("torch")

    hidden = 16
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 3, hidden)).astype(np.float32)
    k = rng.standard_normal((2, 5, hidden)).astype(np.float32)
    mask = (rng.random((2, 5)) > 0.4).astype(np.float32)

    net = OcrPtrNet(hidden_size=hidden, query_key_size=hidden)
    params = net.init(jax.random.key(0), jnp.asarray(q), jnp.asarray(k),
                      jnp.asarray(mask))["params"]
    got = np.asarray(
        net.apply({"params": params}, jnp.asarray(q), jnp.asarray(k),
                  jnp.asarray(mask))
    )

    # torch re-computation with the same weights (reference: t2s.py:648-670)
    wq = np.asarray(params["query"]["kernel"])  # [in, out]
    bq = np.asarray(params["query"]["bias"])
    wk = np.asarray(params["key"]["kernel"])
    bk = np.asarray(params["key"]["bias"])
    tq = torch.from_numpy(q) @ torch.from_numpy(wq) + torch.from_numpy(bq)
    tk = torch.from_numpy(k) @ torch.from_numpy(wk) + torch.from_numpy(bk)
    scores = tq @ tk.transpose(-1, -2) / np.sqrt(hidden)
    want = (scores + torch.from_numpy(mask).unsqueeze(1)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_prev_pred_embeddings_matches_torch():
    torch = pytest.importorskip("torch")

    hidden, V, N, S = 16, 7, 5, 4
    cfg = TransformerConfig(hidden_size=hidden, hidden_dropout_prob=0.0)
    rng = np.random.default_rng(1)
    ans_emb = rng.standard_normal((V, hidden)).astype(np.float32)
    ocr_emb = rng.standard_normal((2, N, hidden)).astype(np.float32)
    prev = np.array([[2, 8, 0, 11], [1, 2, 3, 4]], np.int64)  # mix vocab/OCR

    mod = PrevPredEmbeddings(cfg)
    params = mod.init(
        jax.random.key(0), jnp.asarray(ans_emb), jnp.asarray(ocr_emb),
        jnp.asarray(prev),
    )["params"]
    got = np.asarray(
        mod.apply({"params": params}, jnp.asarray(ans_emb),
                  jnp.asarray(ocr_emb), jnp.asarray(prev))
    )

    def t_ln(x, scope):
        w = torch.from_numpy(np.asarray(params[scope]["scale"]))
        b = torch.from_numpy(np.asarray(params[scope]["bias"]))
        return torch.nn.functional.layer_norm(x, (hidden,), w, b, eps=1e-12)

    ans = t_ln(torch.from_numpy(ans_emb), "ans_ln")
    ocr = t_ln(torch.from_numpy(ocr_emb), "ocr_ln")
    table = torch.cat([ans.unsqueeze(0).expand(2, -1, -1), ocr], dim=1)
    raw = torch.gather(
        table, 1,
        torch.from_numpy(prev).unsqueeze(-1).expand(-1, -1, hidden),
    )
    pos_table = torch.from_numpy(np.asarray(params["position_embeddings"]["embedding"]))
    type_table = torch.from_numpy(np.asarray(params["token_type_embeddings"]["embedding"]))
    positions = torch.arange(S)
    token_type = torch.from_numpy((prev >= V).astype(np.int64))
    emb = pos_table[positions][None] + type_table[token_type]
    emb = t_ln(emb, "emb_ln")
    want = (raw + emb).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
