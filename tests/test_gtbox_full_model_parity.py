"""FULL-MODEL numeric parity: the reference torch GTBOX vs the JAX GTBox.

The gt_box oracle (reference: pythia/models/gt_box.py:24-382) is fully
deterministic — its Grounding_Module just passes the GT annotation fields
through (gt_box.py:467-487; every parameter it owns is dead) and the OCR
stream runs over the human-annotated grid — so parity needs no shared-noise
plumbing: the teacher-forced train forward and the eval 12-step greedy
decode trace must both match on converted random-init weights.

The live parameter set is exactly convert_t2s_like(has_qtv=False,
has_grounding=False): the reference's QTV (TransLayer), Grounding_Module
internals, spatial_enhance LSTM and obj_frame projections are all dead in
its forward.
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
NUM_FINAL = 5050 + 960  # fixed vocab + OCR copy space (gt_box_clipocr.yml)

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
def refgtbox():
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
    import pythia.models.gt_box as ref_gtbox

    return ref_gtbox


def _model_config_dict():
    from vitxtgqa_tpu.core.config import build_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = build_config(os.path.join(root, "configs", "gt_box_clipocr.yml"))

    def plain(node):
        if hasattr(node, "items"):
            return {k: plain(v) for k, v in node.items()}
        return node

    d = plain(cfg.model_attributes.gt_box)
    d["text_bert_init_from_bert_base"] = False
    _zero_dropout(d)
    for sect in ("text_bert", "translayers", "encoder", "mmt"):
        d.setdefault(sect, {})
        d[sect]["hidden_dropout_prob"] = 0.0
        d[sect]["attention_probs_dropout_prob"] = 0.0
    return d


def _gt_batch(b, seed):
    """Synthetic batch with the gt_box oracle's GT annotation fields
    (data/gt_box_dataset.py field layout)."""
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    batch = synthetic_batch(batch=b, num_final_outputs=NUM_FINAL, seed=seed)
    batch["ocr_temporal_id"] = batch["temporal_id"]
    batch["ocr_track_id"] = batch["track_id"]
    batch["ocr_bbox_list"] = batch["ocr_bbox_coordinates"]
    batch["ocr_mask_embedding"] = batch["ocr_mask"]
    batch["frame_mask_embedding"] = batch["frame_mask"]
    batch["frame_list"] = batch["frame_id"]
    return batch


def _build_pair(refgtbox, cfg_dict, batch_size=1):
    import torch

    from vitxtgqa_tpu.core.config import ConfigNode
    from vitxtgqa_tpu.models.gt_box import GTBox
    from vitxtgqa_tpu.utils import torch_convert as TC

    torch.manual_seed(0)
    tmodel = refgtbox.GTBOX(ConfigNode(cfg_dict))
    tmodel.build()
    tmodel = tmodel.float()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    jmodel = GTBox(
        config=ConfigNode(cfg_dict), num_final_outputs=NUM_FINAL, bos_idx=2,
        compute_dtype=jnp.float32,
    )
    init_batch = _gt_batch(batch_size, seed=0)
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
        has_qtv=False, has_grounding=False,
    )
    params = TC.convert_into_params(flat, params, strict=True)
    return tmodel, jmodel, params


def _jax_apply(jmodel, params, batch, train):
    return jmodel.apply(
        {"params": params},
        {k: jnp.asarray(v) for k, v in batch.items()},
        train=train,
        rngs={"dropout": jax.random.key(7)},
    )


def test_gtbox_train_forward_parity(refgtbox):
    import torch

    b = 2
    batch = _gt_batch(b, seed=31)
    cfg = _model_config_dict()
    tmodel, jmodel, params = _build_pair(refgtbox, cfg, batch_size=b)

    tmodel.train()
    sl = _torch_sample_list(batch)
    with torch.no_grad():
        tout = tmodel.forward(sl)

    jout = _jax_apply(jmodel, params, batch, train=True)

    np.testing.assert_array_equal(
        np.asarray(jout["ground_frame"]), tout["ground_frame"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(jout["ground_box"]), tout["ground_box"].numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jout["pos_scores"]), tout["pos_scores"].numpy(), atol=2e-3,
        err_msg="train-mode pos_scores diverged between torch and JAX",
    )


def test_gtbox_eval_greedy_decode_parity(refgtbox):
    import torch

    b = 2
    batch = _gt_batch(b, seed=33)
    cfg = _model_config_dict()
    tmodel, jmodel, params = _build_pair(refgtbox, cfg, batch_size=b)

    tmodel.eval()
    sl = _torch_sample_list(batch)
    with torch.no_grad():
        tout = tmodel.forward(sl)

    jout = _jax_apply(jmodel, params, batch, train=False)

    t_scores = tout["pos_scores"].numpy()
    j_scores = np.asarray(jout["pos_scores"])
    np.testing.assert_array_equal(
        j_scores.argmax(-1), t_scores.argmax(-1),
        err_msg="greedy decode chose different tokens",
    )
    np.testing.assert_allclose(j_scores, t_scores, atol=2e-3)
