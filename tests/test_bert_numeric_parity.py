"""Numeric parity of the converted text encoder vs torch BERT.

Random-initialises a HF BertModel (same architecture family as the
reference's pytorch_transformers TextBert, reference: t2s.py:521-545),
converts its weights through vitxtgqa_tpu.utils.torch_convert, and compares
encoder outputs on shared inputs — the end-to-end numeric validation of the
checkpoint-conversion path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitxtgqa_tpu.models.common import TextEncoder, TransformerConfig
from vitxtgqa_tpu.ops.masks import length_mask
from vitxtgqa_tpu.utils import torch_convert as TC


@pytest.mark.slow
def test_text_encoder_matches_torch_bert():
    torch = pytest.importorskip("torch")
    try:
        from transformers import BertConfig, BertModel
    except ImportError:
        pytest.skip("transformers unavailable")

    hidden, layers, heads, ffn, vocab = 64, 2, 4, 128, 120
    tconf = BertConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=ffn,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=32, type_vocab_size=2,
    )
    torch.manual_seed(0)
    tmodel = BertModel(tconf, add_pooling_layer=False).eval()

    # reference-style names: the converter expects a "text_bert." prefix
    sd = {
        f"text_bert.{k}": v.detach().numpy()
        for k, v in tmodel.state_dict().items()
    }
    flat = {}
    TC.convert_text_bert(sd, "text_bert", "text_bert", layers, flat)
    jparams = TC.unflatten(flat)["text_bert"]

    jconf = TransformerConfig(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=ffn, vocab_size=vocab, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    jmodel = TextEncoder(jconf)

    rng = np.random.default_rng(1)
    tokens = rng.integers(1, vocab, (3, 12)).astype(np.int32)
    lengths = np.array([12, 8, 5])
    mask = np.asarray(length_mask(jnp.asarray(lengths), 12))

    with torch.no_grad():
        want = tmodel(
            input_ids=torch.from_numpy(tokens).long(),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    # shape-check the converted tree against a fresh init, then apply
    init = jmodel.init(jax.random.key(0), jnp.asarray(tokens), jnp.asarray(mask))
    merged = TC.convert_into_params(
        TC.flatten(jparams), init["params"], strict=True
    )
    got = np.asarray(
        jmodel.apply({"params": merged}, jnp.asarray(tokens), jnp.asarray(mask))
    )

    # compare valid positions only (padded rows see different mask constants)
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(
            got[i, :n], want[i, :n], atol=2e-5,
            err_msg=f"row {i}",
        )
