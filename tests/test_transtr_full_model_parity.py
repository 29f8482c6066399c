"""FULL-MODEL numeric parity: the reference torch TRANSTR vs the JAX TranSTR.

Loads the reference's actual model code (/root/reference/pythia/models/
transtr.py:26-530 + modules/transtr_module/) under the same
pytorch_transformers shim as the T2S harness, builds it at the real
transtr_abinet.yml dims with random init, converts the state dict through
utils/torch_convert.convert_transtr, and runs the same batch through both
frameworks:

  * eval-mode 12-step greedy decode (transtr.py:307-325): fully
    deterministic — the selector uses HardtopK at eval (transtr.py:437,465)
    — so scores, the decoded token trace, ground_frame and ground_bbox must
    all match with no shared-noise plumbing;
  * train-mode teacher-forced forward under shared PerturbedTopK noise
    (topk.py:190-212) with every dropout disabled on both sides.

This catches wiring bugs module tests cannot — it is the test that flushed
out transtr's one-of-a-kind MMT composition (the question text is NOT part
of the answering MMT's joint sequence: transtr.py:616-633 concatenates only
[obj, ocr, dec] and sets txt_end = txt_begin).

The reference VideoQAmodel constructor loads a local HuggingFace BERT as a
text encoder (transtr.py:358-359) that its forward never uses (the question
stream reuses text_bert's output, transtr.py:415-416); it is stubbed out.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference"
NUM_FINAL = 5050 + 960  # fixed vocab + OCR copy space (transtr_abinet.yml)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF_ROOT, "pythia")),
        reason="reference tree not mounted",
    ),
]

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_t2s_full_model_parity import (  # noqa: E402
    _install_pytorch_transformers_shim,
    _torch_sample_list,
    _zero_dropout,
)


@pytest.fixture(scope="module")
def reftranstr():
    torch = pytest.importorskip("torch")  # noqa: F841
    _install_pytorch_transformers_shim()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from pythia.common.registry import registry as ref_registry

    from vitxtgqa_tpu.core.config import ConfigNode

    if ref_registry.get("config", no_warning=True) is None:
        ref_registry.register("config", ConfigNode({"datasets": "vtextgqa"}))
        ref_registry.register(
            "writer", types.SimpleNamespace(write=lambda *a, **k: None)
        )
    # UNCONDITIONAL: the reference registry is process-global and other
    # parity harnesses overwrite these keys (test_legacy_vqa_parity's
    # NOUT) — each harness must (re-)register its own sizes
    ref_registry.register("vtextgqa_num_final_outputs", NUM_FINAL)
    ref_registry.register(
        "vtextgqa_answer_processor",
        types.SimpleNamespace(BOS_IDX=2, EOS_IDX=3, PAD_IDX=0, UNK_IDX=1),
    )
    import pythia.models.transtr as ref_transtr

    # the dead text-encoder load (transtr.py:358-359) would pull a local HF
    # checkpoint this image doesn't have; its params are unused in forward
    import torch.nn as nn

    class _StubAuto:
        @staticmethod
        def from_pretrained(*a, **k):
            return nn.Module()

    ref_transtr.AutoModel = _StubAuto
    ref_transtr.AutoTokenizer = _StubAuto
    return ref_transtr


def _model_config_dict():
    """configs/transtr_abinet.yml model_attributes.transtr with every
    dropout zeroed (incl. the selector's hard-coded rates, exposed via the
    grounding config keys) and bert-base init disabled."""
    from vitxtgqa_tpu.core.config import build_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = build_config(os.path.join(root, "configs", "transtr_abinet.yml"))

    def plain(node):
        if hasattr(node, "items"):
            return {k: plain(v) for k, v in node.items()}
        return node

    d = plain(cfg.model_attributes.transtr)
    d["text_bert_init_from_bert_base"] = False
    d["grounding"]["dropout_prob"] = 0.0
    d["grounding"]["resize_dropout_prob"] = 0.0
    _zero_dropout(d)
    for sect in ("text_bert", "translayers", "encoder", "mmt"):
        d.setdefault(sect, {})
        d[sect]["hidden_dropout_prob"] = 0.0
        d[sect]["attention_probs_dropout_prob"] = 0.0
    return d


def _build_pair(reftranstr, cfg_dict, batch_size=1):
    import torch

    from vitxtgqa_tpu.core.config import ConfigNode
    from vitxtgqa_tpu.models.transtr import TranSTR
    from vitxtgqa_tpu.utils import torch_convert as TC
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    torch.manual_seed(0)
    tmodel = reftranstr.TRANSTR(ConfigNode(cfg_dict))
    tmodel.build()
    tmodel = tmodel.float()
    # zero every dropout module, incl. VideoQAmodel's hard-coded rates
    # (train-mode parity needs identical deterministic forwards)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    jmodel = TranSTR(
        config=ConfigNode(cfg_dict), num_final_outputs=NUM_FINAL, bos_idx=2,
        compute_dtype=jnp.float32,
    )
    init_batch = synthetic_batch(
        batch=batch_size, num_final_outputs=NUM_FINAL, seed=0
    )
    variables = jax.eval_shape(
        lambda: jmodel.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1),
             "gumbel": jax.random.key(2)},
            init_batch, train=True,
        )
    )
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables["params"]
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    flat = TC.convert_transtr(
        sd,
        text_layers=int(cfg_dict["text_bert"]["num_hidden_layers"]),
        mmt_layers=int(cfg_dict["mmt"]["num_hidden_layers"]),
    )
    params = TC.convert_into_params(flat, params, strict=True)
    return tmodel, jmodel, params


def _jax_apply(jmodel, params, batch, train):
    return jmodel.apply(
        {"params": params},
        {k: jnp.asarray(v) for k, v in batch.items()},
        train=train,
        rngs={"dropout": jax.random.key(7), "gumbel": jax.random.key(8)},
    )


def _aligned_batch(b, seed):
    """Synthetic batch with all OCR slots valid, so the reference's
    dynamic grounded-box recovery (transtr.py:469-505) stays row-aligned
    and comparable against this framework's static-shape equivalent (see
    models/transtr.py module docstring)."""
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    batch = synthetic_batch(batch=b, num_final_outputs=NUM_FINAL, seed=seed)
    batch["ocr_mask"] = np.ones_like(batch["ocr_mask"])
    return batch


def test_transtr_eval_greedy_decode_parity(reftranstr):
    """Eval is deterministic end-to-end (HardtopK selector): 12-step greedy
    decode trace, scores, ground_frame and ground_bbox all match."""
    import torch

    b = 2
    batch = _aligned_batch(b, seed=3)
    cfg = _model_config_dict()
    tmodel, jmodel, params = _build_pair(reftranstr, cfg, batch_size=b)

    tmodel.eval()
    sl = _torch_sample_list(batch)
    with torch.no_grad():
        tout = tmodel.forward(sl)

    jout = _jax_apply(jmodel, params, batch, train=False)

    np.testing.assert_array_equal(
        np.asarray(jout["ground_frame"]), tout["ground_frame"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(jout["ground_box"]), tout["ground_box"].numpy(), atol=1e-5
    )
    t_scores = tout["pos_scores"].numpy()
    j_scores = np.asarray(jout["pos_scores"])
    np.testing.assert_array_equal(
        j_scores.argmax(-1), t_scores.argmax(-1),
        err_msg="greedy decode chose different tokens",
    )
    np.testing.assert_allclose(j_scores, t_scores, atol=2e-3)


def test_transtr_train_forward_parity(reftranstr, monkeypatch):
    """Teacher-forced train forward under shared PerturbedTopK noise
    (topk.py:190-212): scores + grounding outputs match."""
    import torch
    import torch.nn.functional as TF

    import vitxtgqa_tpu.models.transtr as JT

    b = 2
    batch = _aligned_batch(b, seed=5)
    cfg = _model_config_dict()

    sigma, n_samples = 0.05, 500
    rng = np.random.default_rng(17)
    noise = {}

    def _noise(shape):
        if shape not in noise:
            noise[shape] = rng.standard_normal(shape).astype(np.float32)
        return noise[shape]

    class _FixedPTK(torch.nn.Module):
        def __init__(self, k, num_samples=n_samples, sigma=sigma):
            super().__init__()
            self.k = k

        def __call__(self, x):
            bs, d = x.shape
            nz = torch.from_numpy(_noise((bs, n_samples, d)))
            perturbed = x.unsqueeze(1) + nz * sigma
            idx = torch.sort(
                torch.topk(perturbed, self.k, dim=-1, sorted=False).indices,
                dim=-1,
            ).values
            return TF.one_hot(idx, d).float().mean(dim=1).transpose(1, 2)

    monkeypatch.setattr(reftranstr, "PerturbedTopK", _FixedPTK)

    def _fixed_jax_ptk(x, key, k, num_samples=n_samples, s=sigma):
        del key
        nz = jnp.asarray(_noise((x.shape[0], n_samples, x.shape[1])))
        perturbed = x[:, None, :] + nz * s
        _, idx = jax.lax.top_k(perturbed, k)
        idx = jnp.sort(idx, axis=-1)
        onehot = jax.nn.one_hot(idx, x.shape[-1], dtype=x.dtype)
        return onehot.mean(axis=1).transpose(0, 2, 1)

    monkeypatch.setattr(JT, "perturbed_topk", _fixed_jax_ptk)

    tmodel, jmodel, params = _build_pair(reftranstr, cfg, batch_size=b)

    tmodel.train()
    sl = _torch_sample_list(batch)
    with torch.no_grad():
        tout = tmodel.forward(sl)

    jout = _jax_apply(jmodel, params, batch, train=True)

    np.testing.assert_array_equal(
        np.asarray(jout["ground_frame"]), tout["ground_frame"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(jout["ground_box"]), tout["ground_box"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jout["pos_scores"]), tout["pos_scores"].numpy(), atol=2e-3,
        err_msg="train-mode pos_scores diverged between torch and JAX",
    )
