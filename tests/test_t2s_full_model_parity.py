"""FULL-MODEL numeric parity: the reference torch T2S vs the JAX T2S.

Loads the reference's actual model code (/root/reference/pythia/models/
t2s.py:21-518) under a `pytorch_transformers` shim backed by modern HF
transformers, builds it at the real t2s_abinet.yml dims with random init,
converts the state dict through utils/torch_convert, and runs the same
batch through both frameworks under shared gumbel noise:

  * train-mode teacher-forced forward: ref/pos/neg scores, grounding
    outputs, and the two losses (pos_bce_loss losses.py:323-343, InfoNCE
    losses.py:346-385) must match to fp32 tolerance;
  * eval-mode 12-step greedy decode (t2s.py:315-354): the KV-cached scan
    must reproduce the reference's full-MMT-per-step trace, argmax ids
    exactly.

Determinism: both sides draw identical gumbel noise keyed by logits shape,
and the reference's -10000-tie-dominated bottom-k/sort calls are patched to
stable (lowest-index-first) order, which is jax.lax.top_k's documented tie
rule — see models/grounding.py module docstring.

Module-level parity (MMT vs torch BERT, grounding indicators, decoder
heads) lives in the sibling test files; this file catches wiring and
ordering bugs BETWEEN the modules, which module tests cannot.
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
NUM_FINAL = 5050 + 960  # fixed vocab + OCR copy space (t2s_abinet.yml)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF_ROOT, "pythia")),
        reason="reference tree not mounted",
    ),
]


# ---------------------------------------------------------------------------
# pytorch_transformers shim: the reference imports the 2019-era library
# (t2s.py:9-12); this image carries modern `transformers`, whose BertEncoder/
# BertEmbeddings keep the same eager-mode call contract (positional additive
# attention mask, tuple-indexable output) — validated module-wise in
# test_mmt_numeric_parity.py.
# ---------------------------------------------------------------------------

def _install_pytorch_transformers_shim():
    if "pytorch_transformers" in sys.modules:
        return
    import torch.nn as nn
    from transformers import BertConfig as HFBertConfig
    from transformers.models.bert.modeling_bert import (
        BertEmbeddings,
        BertEncoder,
        BertPreTrainedModel,
    )

    class BertConfig(HFBertConfig):
        def __init__(self, **kw):
            kw.setdefault("attn_implementation", "eager")
            super().__init__(**kw)
            if getattr(self, "_attn_implementation", None) is None:
                self._attn_implementation = "eager"

    def BertLayerNorm(size, eps=1e-12):
        return nn.LayerNorm(size, eps=eps)

    shim = types.ModuleType("pytorch_transformers")
    mb = types.ModuleType("pytorch_transformers.modeling_bert")
    mb.BertConfig = BertConfig
    mb.BertEncoder = BertEncoder
    mb.BertEmbeddings = BertEmbeddings
    mb.BertPreTrainedModel = BertPreTrainedModel
    mb.BertLayerNorm = BertLayerNorm
    shim.modeling_bert = mb
    sys.modules["pytorch_transformers"] = shim
    sys.modules["pytorch_transformers.modeling_bert"] = mb

    # the reference's ANLS evaluator imports `editdistance` at module load
    # (compute_anls.py:2); back it with this framework's Levenshtein DP
    if "editdistance" not in sys.modules:
        from vitxtgqa_tpu.metrics.evaluators import levenshtein

        ed = types.ModuleType("editdistance")
        ed.eval = levenshtein
        sys.modules["editdistance"] = ed


@pytest.fixture(scope="module")
def refpkg():
    """Import the reference package with registry state prepared."""
    torch = pytest.importorskip("torch")  # noqa: F841
    _install_pytorch_transformers_shim()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from pythia.common.registry import registry as ref_registry

    from vitxtgqa_tpu.core.config import ConfigNode

    if ref_registry.get("config", no_warning=True) is None:
        ref_registry.register("config", ConfigNode({"datasets": "vtextgqa"}))
        ref_registry.register("writer", types.SimpleNamespace(write=lambda *a, **k: None))
    # register the numeric keys UNCONDITIONALLY: the reference registry is
    # process-global and other parity harnesses (test_legacy_vqa_parity's
    # NOUT=11) overwrite vtextgqa_num_final_outputs — gating on "config
    # already present" left the stale value in and the reference model
    # built a [-949, 768] classifier in full-suite runs
    ref_registry.register("vtextgqa_num_final_outputs", NUM_FINAL)
    ref_registry.register(
        "vtextgqa_answer_processor",
        types.SimpleNamespace(BOS_IDX=2, EOS_IDX=3, PAD_IDX=0, UNK_IDX=1),
    )
    import pythia.models.t2s as ref_t2s
    import pythia.modules.spatio_temporal_grounding as ref_stg
    import pythia.modules.losses as ref_losses

    return types.SimpleNamespace(t2s=ref_t2s, stg=ref_stg, losses=ref_losses)


# ---------------------------------------------------------------------------
# shared config / batch / determinism plumbing
# ---------------------------------------------------------------------------

def _zero_dropout(d):
    for k, v in list(d.items()):
        if isinstance(v, dict):
            _zero_dropout(v)
        elif "dropout" in k:
            d[k] = 0.0
    return d


def _model_config_dict():
    """configs/t2s_abinet.yml model_attributes.t2s, dropouts zeroed and
    bert-base init disabled (no HF downloads; random init on both sides)."""
    from vitxtgqa_tpu.core.config import build_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = build_config(os.path.join(root, "configs", "t2s_abinet.yml"))

    def plain(node):
        if hasattr(node, "items"):
            return {k: plain(v) for k, v in node.items()}
        return node

    d = plain(cfg.model_attributes.t2s)
    d["text_bert_init_from_bert_base"] = False
    _zero_dropout(d)
    # zero the BertConfig-default dropouts the yml never mentions
    for sect in ("text_bert", "translayers", "encoder", "mmt"):
        d.setdefault(sect, {})
        d[sect]["hidden_dropout_prob"] = 0.0
        d[sect]["attention_probs_dropout_prob"] = 0.0
    return d


class _SampleList(types.SimpleNamespace):
    """Attribute + item access, like the reference SampleList."""

    def __getitem__(self, key):
        return getattr(self, key)


def _torch_sample_list(batch):
    import torch

    out = {}
    for k, v in batch.items():
        t = torch.from_numpy(np.asarray(v))
        out[k] = t
    return _SampleList(**out)


def _fixed_gumbel(shape, seed):
    return np.random.default_rng(seed).gumbel(size=shape).astype(np.float32)


class _StableTorch:
    """torch proxy whose topk/sort break ties by lowest index (stable),
    matching jax.lax.top_k's documented tie rule.  The reference's negative
    streams take bottom-k over -10000-dominated ties
    (spatio_temporal_grounding.py:57-63,112-117) where torch's default tie
    order is arbitrary; pinning it makes the two frameworks comparable."""

    def __init__(self, torch_mod):
        object.__setattr__(self, "_torch", torch_mod)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_torch"), name)

    def topk(self, x, k, dim=-1, largest=True, sorted=True):
        t = object.__getattribute__(self, "_torch")
        vals, idx = t.sort(x, dim=dim, descending=largest, stable=True)
        return vals.narrow(dim, 0, k), idx.narrow(dim, 0, k)

    def sort(self, x, dim=-1, descending=False, stable=False):
        t = object.__getattribute__(self, "_torch")
        return t.sort(x, dim=dim, descending=descending, stable=True)


def _patch_determinism(monkeypatch, ref_stg, batch, frames=64, n_ocr=960):
    """Shared shape-keyed gumbel noise on both sides + stable torch ties."""
    import torch

    noise = {
        (batch, 2, frames): _fixed_gumbel((batch, 2, frames), seed=11),
        (batch, 2, n_ocr): _fixed_gumbel((batch, 2, n_ocr), seed=12),
    }

    def torch_gumbel_softmax(logits, tau=1.0, hard=False, dim=-1):
        g = torch.from_numpy(noise[tuple(logits.shape)])
        y = torch.softmax((logits + g) / tau, dim=dim)
        if hard:
            idx = y.argmax(dim=dim, keepdim=True)
            y_hard = torch.zeros_like(y).scatter_(dim, idx, 1.0)
            y = y_hard + y - y.detach()
        return y

    monkeypatch.setattr(ref_stg.F, "gumbel_softmax", torch_gumbel_softmax)
    monkeypatch.setattr(ref_stg, "torch", _StableTorch(torch))

    # softmax-tail floor: the grounding attention over 960 slots produces
    # values down to ~1e-30, where torch and XLA exp() tails round
    # differently (XLA flushes to exact 0.0 around 1e-30 while torch keeps
    # denearly-zero values), and the reference's bottom-k then ranks that
    # fp dust (spatio_temporal_grounding.py:104-117).  Flooring sub-1e-12
    # attention (below the renormalisation epsilon) to exactly 0 on BOTH
    # sides turns the dust into ties, which the stable index rule resolves
    # identically.  Values >= 1e-12 agree to ~1e-6 relative.
    FLOOR = 1e-12

    def torch_attn_forward(self, q, k, attn_mask=None):
        attention = torch.bmm(q, k.transpose(-2, -1)).squeeze(1)
        attention = self.softmax(attention)
        attention = attention * attn_mask
        attention = attention / (attention.sum(dim=-1, keepdim=True) + 1e-12)
        attention = torch.where(
            attention < FLOOR, torch.zeros_like(attention), attention
        )
        return torch.where(attn_mask == 0, -10000.0, attention)

    monkeypatch.setattr(ref_stg.AttentionScore, "forward", torch_attn_forward)

    import vitxtgqa_tpu.models.grounding as G

    def jax_attention_score(q_global, feats, mask):
        attn = jnp.einsum(
            "bqd,bld->bl", q_global, feats,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn * mask
        attn = attn / (attn.sum(-1, keepdims=True) + 1e-12)
        attn = jnp.where(attn < FLOOR, 0.0, attn)
        return jnp.where(mask == 0, -10000.0, attn)

    monkeypatch.setattr(G, "attention_score", jax_attention_score)

    def jax_gumbel_softmax(rng, logits, tau=1.0, axis=-1, hard=True):
        g = jnp.asarray(noise[tuple(logits.shape)])
        y = jax.nn.softmax((logits + g) / tau, axis=axis)
        if hard:
            idx = jnp.argmax(y, axis=axis, keepdims=True)
            y_hard = jnp.zeros_like(y)
            y_hard = jnp.put_along_axis(y_hard, idx, 1.0, axis=axis,
                                        inplace=False)
            y = y_hard
        return y

    monkeypatch.setattr(G, "gumbel_softmax", jax_gumbel_softmax)


def _build_pair(refpkg, cfg_dict, batch_size=1, decode_recompute=False):
    """Reference torch model (random init) + JAX model on converted weights.

    Returns (torch_model, jax_model, jax_params)."""
    import torch

    from vitxtgqa_tpu.core.config import ConfigNode
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.utils import torch_convert as TC
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    torch.manual_seed(0)
    tmodel = refpkg.t2s.T2S(ConfigNode(cfg_dict))
    tmodel.build()
    tmodel = tmodel.float()

    jmodel = T2S(
        config=ConfigNode(cfg_dict), num_final_outputs=NUM_FINAL, bos_idx=2,
        compute_dtype=jnp.float32, decode_recompute=decode_recompute,
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
    # eval_shape gives the tree without running the (expensive) real init;
    # fill it with zeros of the right shape/dtype, then graft the converted
    # torch weights (strict: every converted tensor must land + match)
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables["params"]
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    flat = TC.convert_t2s_like(
        sd,
        text_layers=int(cfg_dict["text_bert"]["num_hidden_layers"]),
        qtv_layers=int(cfg_dict["translayers"]["num_hidden_layers"]),
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


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_t2s_train_forward_and_loss_parity(refpkg, monkeypatch):
    """One teacher-forced train-mode batch: scores, grounding, losses
    (reference: t2s.py:288-313, losses.py:323-385)."""
    import torch

    from vitxtgqa_tpu.losses import info_nce, pos_bce_loss
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    b = 2
    batch = synthetic_batch(batch=b, num_final_outputs=NUM_FINAL, seed=42)
    _patch_determinism(monkeypatch, refpkg.stg, b)

    cfg = _model_config_dict()
    tmodel, jmodel, params = _build_pair(refpkg, cfg, batch_size=b)

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
    for key in ("ref_scores", "pos_scores", "neg_scores"):
        np.testing.assert_allclose(
            np.asarray(jout[key]), tout[key].numpy(), atol=2e-3,
            err_msg=f"{key} diverged between torch and JAX full models",
        )

    # losses on each side's own outputs (loss-fn parity is covered by
    # test_losses_parity; this asserts end-to-end loss parity)
    t_bce = refpkg.losses.POSBCEWithMaskLoss()(sl, tout).item()
    t_nce = refpkg.losses.InfoNCE()(sl, tout).item()
    j_bce = float(pos_bce_loss(batch, {k: np.asarray(v) for k, v in jout.items()}))
    j_nce = float(info_nce(batch, {k: np.asarray(v) for k, v in jout.items()}))
    assert abs(t_bce - j_bce) < 2e-3, (t_bce, j_bce)
    assert abs(t_nce - j_nce) < 2e-3, (t_nce, j_nce)


def test_t2s_greedy_decode_trace_parity(refpkg, monkeypatch):
    """12-step eval greedy decode: the KV-cached scan vs the reference's
    full-MMT-per-step loop (t2s.py:315-354) — argmax ids exact, scores to
    fp32 tolerance."""
    import torch

    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    b = 1
    batch = synthetic_batch(batch=b, num_final_outputs=NUM_FINAL, seed=7)
    _patch_determinism(monkeypatch, refpkg.stg, b)

    cfg = _model_config_dict()
    tmodel, jmodel, params = _build_pair(refpkg, cfg, batch_size=b)

    tmodel.eval()
    sl = _torch_sample_list(batch)
    with torch.no_grad():
        tout = tmodel.forward(sl)

    jout = _jax_apply(jmodel, params, batch, train=False)

    np.testing.assert_array_equal(
        np.asarray(jout["ground_frame"]), tout["ground_frame"].numpy()
    )
    t_scores = tout["pos_scores"].numpy()
    j_scores = np.asarray(jout["pos_scores"])
    # decoded token trace must match exactly step by step
    np.testing.assert_array_equal(
        j_scores.argmax(-1), t_scores.argmax(-1),
        err_msg="greedy decode chose different tokens",
    )
    np.testing.assert_allclose(j_scores, t_scores, atol=2e-3)
    for key in ("ref_scores", "neg_scores"):
        np.testing.assert_allclose(
            np.asarray(jout[key]), tout[key].numpy(), atol=2e-3,
            err_msg=f"{key} diverged in eval decode",
        )


# ---------------------------------------------------------------------------
# M4C baseline (reference: pythia/models/m4c.py:29-310) — deterministic
# post-hoc middle-frame grounding, single MMT variant, pos_scores only.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def refm4c(refpkg):
    import pythia.models.m4c as ref_m4c

    return ref_m4c


def _m4c_config_dict():
    from vitxtgqa_tpu.core.config import build_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = build_config(os.path.join(root, "configs", "m4c_abinet.yml"))

    def plain(node):
        if hasattr(node, "items"):
            return {k: plain(v) for k, v in node.items()}
        return node

    d = plain(cfg.model_attributes.m4c)
    d["text_bert_init_from_bert_base"] = False
    _zero_dropout(d)
    for sect in ("text_bert", "translayers", "encoder", "mmt"):
        d.setdefault(sect, {})
        d[sect]["hidden_dropout_prob"] = 0.0
        d[sect]["attention_probs_dropout_prob"] = 0.0
    return d


def _patch_m4c_determinism(monkeypatch, ref_m4c):
    """m4c is noise-free; only the stable-tie + softmax-floor patches apply
    (its PostHoc sorts the question-OCR attention, m4c.py:384-400, whose
    tail has the same cross-framework fp-dust problem)."""
    import torch

    FLOOR = 1e-12

    def torch_attn_forward(self, q, k, attn_mask=None):
        attention = torch.bmm(q, k.transpose(-2, -1)).squeeze(1)
        attention = self.softmax(attention)
        attention = attention * attn_mask
        attention = attention / (attention.sum(dim=-1, keepdim=True) + 1e-12)
        attention = torch.where(
            attention < FLOOR, torch.zeros_like(attention), attention
        )
        return torch.where(attn_mask == 0, -10000.0, attention)

    monkeypatch.setattr(ref_m4c.AttentionScore, "forward", torch_attn_forward)
    monkeypatch.setattr(ref_m4c, "torch", _StableTorch(torch))

    import vitxtgqa_tpu.models.posthoc as PH

    def jax_attention_score(q_global, feats, mask):
        attn = jnp.einsum(
            "bqd,bld->bl", q_global, feats,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn * mask
        attn = attn / (attn.sum(-1, keepdims=True) + 1e-12)
        attn = jnp.where(attn < FLOOR, 0.0, attn)
        return jnp.where(mask == 0, -10000.0, attn)

    monkeypatch.setattr(PH, "attention_score", jax_attention_score)


def _build_m4c_pair(refm4c, cfg_dict, batch_size):
    import torch

    from vitxtgqa_tpu.core.config import ConfigNode
    from vitxtgqa_tpu.models.m4c import M4C
    from vitxtgqa_tpu.utils import torch_convert as TC
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    torch.manual_seed(1)
    tmodel = refm4c.M4C(ConfigNode(cfg_dict))
    tmodel.build()
    tmodel = tmodel.float()

    jmodel = M4C(
        config=ConfigNode(cfg_dict), num_final_outputs=NUM_FINAL, bos_idx=2,
        compute_dtype=jnp.float32,
    )
    init_batch = synthetic_batch(
        batch=batch_size, num_final_outputs=NUM_FINAL, seed=0
    )
    variables = jax.eval_shape(
        lambda: jmodel.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            init_batch, train=True,
        )
    )
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables["params"]
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    flat = TC.convert_t2s_like(
        sd,
        text_layers=int(cfg_dict["text_bert"]["num_hidden_layers"]),
        mmt_layers=int(cfg_dict["mmt"]["num_hidden_layers"]),
        has_qtv=False, has_grounding=False, has_posthoc=True,
        obj_has_frame_embed=False, ocr_has_ids=False,
    )
    params = TC.convert_into_params(flat, params, strict=True)
    return tmodel, jmodel, params


def _jax_apply_m4c(jmodel, params, batch, train):
    return jmodel.apply(
        {"params": params},
        {k: jnp.asarray(v) for k, v in batch.items()},
        train=train,
        rngs={"dropout": jax.random.key(7)},
    )


def test_m4c_train_forward_parity(refm4c, monkeypatch):
    import torch

    from vitxtgqa_tpu.losses import pos_bce_loss
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    b = 2
    batch = synthetic_batch(batch=b, num_final_outputs=NUM_FINAL, seed=21)
    _patch_m4c_determinism(monkeypatch, refm4c)

    cfg = _m4c_config_dict()
    tmodel, jmodel, params = _build_m4c_pair(refm4c, cfg, batch_size=b)

    tmodel.train()
    sl = _torch_sample_list(batch)
    with torch.no_grad():
        tout = tmodel.forward(sl)
    jout = _jax_apply_m4c(jmodel, params, batch, train=True)

    np.testing.assert_array_equal(
        np.asarray(jout["ground_frame"]), tout["ground_frame"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(jout["ground_box"]), tout["ground_box"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jout["pos_scores"]), tout["pos_scores"].numpy(), atol=2e-3,
        err_msg="m4c pos_scores diverged between torch and JAX full models",
    )
    t_bce = torch.nn.functional.binary_cross_entropy_with_logits(
        tout["pos_scores"], sl.targets, reduction="none"
    )
    t_bce = (t_bce * sl.train_loss_mask.unsqueeze(-1)).sum() / torch.clamp(
        sl.train_loss_mask.sum(), min=1.0
    )
    j_bce = float(
        pos_bce_loss(batch, {k: np.asarray(v) for k, v in jout.items()})
    )
    assert abs(float(t_bce) - j_bce) < 2e-3


def test_m4c_greedy_decode_trace_parity(refm4c, monkeypatch):
    import torch

    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    b = 1
    batch = synthetic_batch(batch=b, num_final_outputs=NUM_FINAL, seed=23)
    _patch_m4c_determinism(monkeypatch, refm4c)

    cfg = _m4c_config_dict()
    tmodel, jmodel, params = _build_m4c_pair(refm4c, cfg, batch_size=b)

    tmodel.eval()
    sl = _torch_sample_list(batch)
    with torch.no_grad():
        tout = tmodel.forward(sl)
    jout = _jax_apply_m4c(jmodel, params, batch, train=False)

    t_scores = tout["pos_scores"].numpy()
    j_scores = np.asarray(jout["pos_scores"])
    np.testing.assert_array_equal(
        j_scores.argmax(-1), t_scores.argmax(-1),
        err_msg="m4c greedy decode chose different tokens",
    )
    np.testing.assert_allclose(j_scores, t_scores, atol=2e-3)


# ---------------------------------------------------------------------------
# T5-ViteVQA baseline (reference: pythia/models/t5vitevqa.py) — full-video
# object stream, OCR temporal/track ids, global post-hoc OCR top-k.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def reft5(refpkg):
    import pythia.models.t5vitevqa as ref_t5

    return ref_t5


def test_t5vitevqa_train_forward_parity(reft5, monkeypatch):
    import torch

    from vitxtgqa_tpu.core.config import ConfigNode
    from vitxtgqa_tpu.models.t5vitevqa import T5ViteVQA
    from vitxtgqa_tpu.utils import torch_convert as TC
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    b = 2
    batch = synthetic_batch(batch=b, num_final_outputs=NUM_FINAL, seed=31)
    # t5vitevqa's PostHoc is noise-free; its AttentionScore + sort come
    # from its own module copy — same determinism patches as m4c
    _patch_m4c_determinism(monkeypatch, reft5)
    import vitxtgqa_tpu.models.t5vitevqa as T5MOD
    import vitxtgqa_tpu.models.posthoc as PH

    monkeypatch.setattr(T5MOD, "attention_score", PH.attention_score)

    from vitxtgqa_tpu.core.config import build_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_node = build_config(
        os.path.join(root, "configs", "t5vitevqa_abinet.yml")
    ).model_attributes.t5vitevqa

    def plain(node):
        if hasattr(node, "items"):
            return {k: plain(v) for k, v in node.items()}
        return node

    cfg = plain(cfg_node)
    cfg["text_bert_init_from_bert_base"] = False
    _zero_dropout(cfg)
    for sect in ("text_bert", "translayers", "encoder", "mmt"):
        cfg.setdefault(sect, {})
        cfg[sect]["hidden_dropout_prob"] = 0.0
        cfg[sect]["attention_probs_dropout_prob"] = 0.0

    torch.manual_seed(2)
    tmodel = reft5.T5VITEVQA(ConfigNode(cfg))
    tmodel.build()
    tmodel = tmodel.float().train()

    jmodel = T5ViteVQA(
        config=ConfigNode(cfg), num_final_outputs=NUM_FINAL, bos_idx=2,
        compute_dtype=jnp.float32,
    )
    variables = jax.eval_shape(
        lambda: jmodel.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch, train=True,
        )
    )
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables["params"]
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    flat = TC.convert_t2s_like(
        sd,
        text_layers=int(cfg["text_bert"]["num_hidden_layers"]),
        mmt_layers=int(cfg["mmt"]["num_hidden_layers"]),
        has_qtv=False, has_grounding=False, has_posthoc=True,
    )
    params = TC.convert_into_params(flat, params, strict=True)

    sl = _torch_sample_list(batch)
    with torch.no_grad():
        tout = tmodel.forward(sl)
    jout = jmodel.apply(
        {"params": params},
        {k: jnp.asarray(v) for k, v in batch.items()},
        train=True, rngs={"dropout": jax.random.key(7)},
    )

    np.testing.assert_array_equal(
        np.asarray(jout["ground_frame"]), tout["ground_frame"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(jout["ground_box"]), tout["ground_box"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jout["pos_scores"]), tout["pos_scores"].numpy(), atol=2e-3,
        err_msg="t5vitevqa pos_scores diverged",
    )
