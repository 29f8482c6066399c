"""Numeric parity of the joint prefix-LM transformer vs a torch construction.

The reference MMT is a BertEncoder under a hand-built prefix-LM + causal
decoder additive mask (reference: t2s.py:548-633).  The torch side here
builds exactly that mask over HF's BertEncoder; weights convert through the
torch_convert name map; outputs must match on encoder and decoder rows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitxtgqa_tpu.models.common import TransformerConfig, TransformerEncoder
from vitxtgqa_tpu.ops.masks import prefix_lm_bias
from vitxtgqa_tpu.utils import torch_convert as TC


@pytest.mark.slow
def test_prefix_lm_encoder_matches_torch():
    torch = pytest.importorskip("torch")
    try:
        from transformers import BertConfig
        from transformers.models.bert.modeling_bert import BertEncoder
    except ImportError:
        pytest.skip("transformers unavailable")

    hidden, layers, heads, ffn = 64, 2, 4, 128
    lenc, dec = 14, 4
    total = lenc + dec
    b = 2

    tconf = BertConfig(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=ffn, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, attn_implementation="eager",
    )
    if getattr(tconf, "_attn_implementation", None) is None:
        tconf._attn_implementation = "eager"
    torch.manual_seed(0)
    tenc = BertEncoder(tconf).eval()

    sd = {f"mmt.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    flat = {}
    TC.convert_bert_encoder(sd, "mmt", "mmt", layers, flat)
    jparams = TC.unflatten(flat)["mmt"]

    rng = np.random.default_rng(3)
    x = rng.standard_normal((b, total, hidden)).astype(np.float32)
    enc_mask = np.ones((b, lenc), np.float32)
    enc_mask[1, 10:] = 0.0  # padded encoder tail on row 1

    # torch: reference-style extended mask (t2s.py:600-619)
    key_mask = np.concatenate([enc_mask, np.zeros((b, dec), np.float32)], 1)
    full = np.broadcast_to(key_mask[:, None, :], (b, total, total)).copy()
    causal = np.tril(np.ones((dec, dec), np.float32))
    full[:, lenc:, lenc:] = causal
    ext = (1.0 - full[:, None, :, :]) * -10000.0
    with torch.no_grad():
        want = tenc(
            torch.from_numpy(x), attention_mask=torch.from_numpy(ext)
        ).last_hidden_state.numpy()

    jconf = TransformerConfig(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=ffn, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    jenc = TransformerEncoder(jconf)
    bias = prefix_lm_bias(jnp.asarray(enc_mask), dec)
    init = jenc.init(jax.random.key(0), jnp.asarray(x), bias)
    merged = TC.convert_into_params(TC.flatten(jparams), init["params"])
    got = np.asarray(jenc.apply({"params": merged}, jnp.asarray(x), bias))

    # valid encoder rows + all decoder rows must match
    np.testing.assert_allclose(got[0], want[0], atol=3e-5)
    np.testing.assert_allclose(got[1, :10], want[1, :10], atol=3e-5)
    np.testing.assert_allclose(got[1, lenc:], want[1, lenc:], atol=3e-5)
