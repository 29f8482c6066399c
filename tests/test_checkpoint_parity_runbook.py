"""Exercise the checkpoint-parity runbook (tools/checkpoint_parity.py)
against fixture-shaped stand-ins: a random-init reference torch T2S saved in
the reference's checkpoint layout, converted and evaluated on the synthetic
fixture dataset with reference_compat — the exact command that will run the
day the released checkpoints + real data exist.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
FIXROOT = os.path.join(os.path.dirname(__file__), "fixtures", "data")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF_ROOT, "pythia")),
        reason="reference tree not mounted",
    ),
]


def test_load_torch_state_dict_strips_module_prefix(tmp_path):
    from tools.checkpoint_parity import load_torch_state_dict

    sd = {"module.a.weight": torch.ones(2), "b.bias": torch.zeros(3)}
    path = tmp_path / "ckpt.pth"
    torch.save({"model": sd, "best_iteration": 7}, path)
    out = load_torch_state_dict(str(path))
    assert set(out) == {"a.weight", "b.bias"}
    np.testing.assert_array_equal(out["a.weight"], np.ones(2))


def test_runbook_end_to_end(tmp_path, repo_root):
    from tests.test_t2s_full_model_parity import (
        _build_pair,
        _model_config_dict,
        refpkg as _refpkg_fixture,  # noqa: F401
    )

    if not os.path.exists(os.path.join(FIXROOT, "vtextgqa")):
        subprocess.run(
            [sys.executable, os.path.join(repo_root, "tools",
                                          "make_fixtures.py"),
             "--root", FIXROOT, "--feat_dim", "1024"],
            check=True, cwd=repo_root,
        )

    # build the reference torch T2S at 1-layer dims and save it in the
    # reference's checkpoint layout ({"model": sd} + module. prefixes)
    import types

    from tests import test_t2s_full_model_parity as H

    H._install_pytorch_transformers_shim()
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
            "vtextgqa_answer_processor",
            types.SimpleNamespace(BOS_IDX=2, EOS_IDX=3, PAD_IDX=0, UNK_IDX=1),
        )
    # the torch model's classifier width must match the FIXTURE vocab
    # (answer vocab + 960 copy slots), not the production 5050+960
    vocab_file = os.path.join(
        FIXROOT, "vtextgqa", "vocabulary", "fixed_vocab_top5k.txt"
    )
    with open(vocab_file) as f:
        n_vocab = len([ln for ln in f.read().splitlines() if ln])
    ref_registry.register("vtextgqa_num_final_outputs", n_vocab + 960)
    import pythia.models.t2s as ref_t2s

    cfg = _model_config_dict()
    for sect in ("text_bert", "translayers", "mmt"):
        cfg[sect]["num_hidden_layers"] = 1
    torch.manual_seed(0)
    tmodel = ref_t2s.T2S(ConfigNode(cfg))
    tmodel.build()
    sd = {"module." + k: v for k, v in tmodel.float().state_dict().items()}
    ckpt_path = tmp_path / "best.ckpt"
    torch.save({"model": sd, "best_iteration": 123}, ckpt_path)

    from vitxtgqa_tpu.core.registry import registry

    registry.clear_state()
    from tools.checkpoint_parity import SIX_METRICS, main

    out_path = tmp_path / "report.json"
    status = main([
        "--torch_ckpt", str(ckpt_path),
        "--config", os.path.join(repo_root, "configs", "t2s_abinet.yml"),
        "--model", "t2s", "--out", str(out_path),
        f"dataset_attributes.vtextgqa.data_root_dir={FIXROOT}",
        "dataset_attributes.vtextgqa.processors.answer_processor.params."
        "vocab_file=vtextgqa/vocabulary/fixed_vocab_top5k.txt",
        "training_parameters.batch_size=2",
        "training_parameters.num_workers=0",
        f"training_parameters.save_dir={tmp_path}/save",
        "training_parameters.device=cpu",
        "training_parameters.tpu.compute_dtype=float32",
        "model_attributes.t2s.text_bert.num_hidden_layers=1",
        "model_attributes.t2s.mmt.num_hidden_layers=1",
        "model_attributes.t2s.translayers.num_hidden_layers=1",
        "model_attributes.t2s.text_bert_init_from_bert_base=False",
    ])
    assert status == 0
    report = json.loads(out_path.read_text())
    assert report["reference_compat"] is True
    for key in SIX_METRICS:
        assert key in report["metrics"]
        assert 0.0 <= report["metrics"][key] <= 1.0
