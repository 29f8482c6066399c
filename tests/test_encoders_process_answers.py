"""ImageEncoder (models/encoders.py) + process_answers CLI parity tests.

The encoder parity oracle is the reference computation itself
(pythia/modules/encoders.py:31-55: Linear initialised from pickled numpy
weights, then ReLU); the process_answers oracle is the reference module
loaded directly from /root/reference (it is torch-free and standalone).
"""

import importlib.util
import json
import os
import pickle
import subprocess
import sys

import jax
import numpy as np
import pytest

REF_PROCESS_ANSWERS = "/root/reference/pythia/utils/process_answers.py"


@pytest.fixture()
def frcnn_pickles(tmp_path):
    rng = np.random.default_rng(3)
    w = rng.normal(size=(6, 10)).astype(np.float32)  # [out, in]
    b = rng.normal(size=(6,)).astype(np.float32)
    wf, bf = str(tmp_path / "fc7_w.pkl"), str(tmp_path / "fc7_b.pkl")
    with open(wf, "wb") as f:
        pickle.dump(w, f)
    with open(bf, "wb") as f:
        pickle.dump(b, f)
    return w, b, wf, bf


def test_identity_encoder():
    from vitxtgqa_tpu.models.encoders import build_image_encoder

    enc, out_dim = build_image_encoder("default", 37)
    assert out_dim == 37
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    params = enc.init(jax.random.key(0), x)
    np.testing.assert_array_equal(enc.apply(params, x), x)


def test_frcnn_fc7_encoder_matches_reference_computation(frcnn_pickles):
    from vitxtgqa_tpu.models.encoders import build_image_encoder

    w, b, wf, bf = frcnn_pickles
    enc, out_dim = build_image_encoder(
        "finetune_faster_rcnn_fpn_fc7", 10,
        weights_file=wf, bias_file=bf, model_data_dir="",
    )
    assert out_dim == 6
    x = np.random.default_rng(5).normal(size=(4, 3, 10)).astype(np.float32)
    params = enc.init(jax.random.key(0), x)
    got = np.asarray(enc.apply(params, x))

    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(10, 6)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
        lin.bias.copy_(torch.from_numpy(b))
        want = torch.nn.functional.relu(lin(torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_unknown_encoder_type_raises():
    from vitxtgqa_tpu.models.encoders import build_image_encoder

    with pytest.raises(NotImplementedError):
        build_image_encoder("resnet_magic", 10)


def test_pythia_applies_configured_encoder(frcnn_pickles):
    """image_feature_encodings config routes features through the encoder
    inside the model (reference pythia.py:65-80 + 250-253)."""
    from vitxtgqa_tpu.models.legacy_vqa import Pythia

    w, b, wf, bf = frcnn_pickles
    cfg = {
        "vocab_size": 20,
        "embed_dim": 8,
        "hidden_dim": 16,
        "image_feature_encodings": [
            {
                "type": "finetune_faster_rcnn_fpn_fc7",
                "params": {"weights_file": wf, "bias_file": bf},
            }
        ],
    }
    model = Pythia(config=cfg, num_final_outputs=5)
    batch = {
        "text": np.ones((2, 6), np.int64),
        "text_len": np.full((2,), 6, np.int64),
        "image_feature_0": np.random.default_rng(0)
        .normal(size=(2, 4, 10))
        .astype(np.float32),
    }
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False,
    )
    # encoder params were seeded from the pickles
    enc_p = variables["params"]["image_feature_encoders_0"]
    np.testing.assert_allclose(np.asarray(enc_p["kernel"]), w.T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(enc_p["bias"]), b, rtol=1e-6)
    out = model.apply(variables, batch, train=False)
    assert out["scores"].shape == (2, 5)


def _load_reference_process_answers():
    spec = importlib.util.spec_from_file_location(
        "ref_process_answers", REF_PROCESS_ANSWERS
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


RAW_ANSWERS = [
    "The Red, Bus!", "dont know", "three", "a stop sign", "it's 7.30",
    "StOp", "an apple;", "one hundred", "couldnt've said", "y'all'd've",
    "", "  ", "red bus", "red bus", "RED bus",
]


@pytest.mark.skipif(
    not os.path.exists(REF_PROCESS_ANSWERS), reason="reference not present"
)
def test_preprocess_answer_parity():
    from tools.process_answers import preprocess_answer

    ref = _load_reference_process_answers()
    for a in RAW_ANSWERS:
        assert preprocess_answer(a) == ref.preprocess_answer(a), a


@pytest.mark.skipif(
    not os.path.exists(REF_PROCESS_ANSWERS), reason="reference not present"
)
def test_filter_and_build_answer_list_parity():
    from tools.process_answers import build_answer_list

    ref = _load_reference_process_answers()
    annotations = [
        {"multiple_choice_answer": a, "question_id": qi}
        for qi, a in enumerate(RAW_ANSWERS * 2)
    ]
    for min_freq in (0, 2, 3):
        ours = build_answer_list(annotations, min_freq=min_freq)
        # reference main-block logic (process_answers.py:283-299)
        ref_list = ref.filter_answers(annotations, min_freq)
        ref_list = [t.strip() for t in ref_list if len(t.strip()) > 0]
        ref_list.sort()
        if "<unk>" not in ref_list:
            ref_list = ["<unk>"] + ref_list
        assert ours == ref_list, min_freq


def test_process_answers_cli(tmp_path, repo_root):
    ann = {
        "annotations": [
            {"multiple_choice_answer": a, "question_id": i}
            for i, a in enumerate(RAW_ANSWERS)
        ]
    }
    ann_file = tmp_path / "train_ann.json"
    ann_file.write_text(json.dumps(ann))
    out_dir = tmp_path / "out"
    subprocess.run(
        [
            sys.executable, os.path.join(repo_root, "tools", "process_answers.py"),
            "--annotation_file", str(ann_file), "--out_dir", str(out_dir),
            "--min_freq", "1",
        ],
        check=True, cwd=repo_root,
    )
    lines = (out_dir / "answers_vqa.txt").read_text().splitlines()
    assert lines[0] == "<unk>"
    assert "red bus" in lines
    assert len(lines) == len(set(lines))
