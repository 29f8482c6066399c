"""Legacy image-VQA dataset chain e2e: pythia + lorra val inference through
tools/run.py on synthetic vqa2/textvqa-format imdbs.

Covers the reference dataset inheritance chain VQA2 -> VizWiz -> TextVQA
(+ vqa2_ocr) end-to-end: builders registered under the reference keys,
`update_registry_for_model` head sizing (vqa2/builder.py:40-48), feature
reading, OCR context assembly, soft answer targets, the evaluate() loss +
vqa_accuracy path, and format_for_evalai prediction records.
"""

import os
import sys

import numpy as np
import pytest

QUESTION_WORDS = [
    "what", "is", "the", "sign", "color", "of", "bus", "on", "says",
    "red", "stop", "word", "number",
]
ANSWERS = ["<unk>", "red", "stop", "bus", "7", "yes"]
FEAT_DIM = 16
MAX_LOC = 7


def _write_vocab(path, words):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(words) + "\n")


def _make_root(root, n=6, with_ocr=False):
    """Synthetic VQA2-format data root: imdb npy + feature dir + vocabs."""
    rng = np.random.default_rng(7)
    _write_vocab(os.path.join(root, "vocabs", "vocabulary_100k.txt"),
                 QUESTION_WORDS)
    _write_vocab(os.path.join(root, "vocabs", "answers_vqa.txt"), ANSWERS)
    feat_dir = os.path.join(root, "feat")
    os.makedirs(feat_dir, exist_ok=True)
    data = []
    for i in range(n):
        image_id = 1000 + i
        np.save(
            os.path.join(feat_dir, f"img_{image_id}.npy"),
            rng.normal(size=(4 + i % 3, FEAT_DIM)).astype(np.float32),
        )
        entry = {
            "question_id": i,
            "image_id": image_id,
            "feature_path": f"img_{image_id}.npy",
            "question": "what is the color of the bus",
            "question_tokens": ["what", "is", "the", "color", "of", "the", "bus"],
            "answers": [ANSWERS[1 + i % 4]] * 7 + [ANSWERS[1 + (i + 1) % 4]] * 3,
        }
        if with_ocr:
            entry["ocr_tokens"] = ["stop", "red", f"tok{i}"]
            entry["image_name"] = f"VizWiz_val_{image_id:08d}"
        data.append(entry)
    imdb = np.empty(1, dtype=object)
    imdb[0] = {"metadata": {"version": 1}, "data": data}
    np.save(os.path.join(root, "imdb_val.npy"), imdb[0])
    return root


def _common_opts(root, tmp_path, dataset, model):
    return [
        f"dataset_attributes.{dataset}.data_root_dir={root}",
        f"dataset_attributes.{dataset}.imdb_files.val=['imdb_val.npy']",
        f"dataset_attributes.{dataset}.image_features.val=['feat']",
        f"dataset_attributes.{dataset}.features_max_len={MAX_LOC}",
        # hashed word-vector fallback kicks in for the absent wiki.en.bin
        "training_parameters.batch_size=3",
        "training_parameters.num_workers=0",
        f"training_parameters.save_dir={tmp_path}/save",
        "training_parameters.seed=13",
        "training_parameters.run_type=val",
        "training_parameters.tpu.compute_dtype=float32",
        # shrink for CPU compile speed
        f"model_attributes.{model}.vocab_size={len(QUESTION_WORDS) + 1}",
        f"model_attributes.{model}.embed_dim=8",
        f"model_attributes.{model}.hidden_dim=16",
    ]


@pytest.fixture(scope="module")
def vqa2_root(tmp_path_factory):
    return _make_root(str(tmp_path_factory.mktemp("vqa2_fix")), with_ocr=False)


@pytest.fixture(scope="module")
def textvqa_root(tmp_path_factory):
    return _make_root(str(tmp_path_factory.mktemp("textvqa_fix")), with_ocr=True)


def test_pythia_val_inference_e2e(vqa2_root, tmp_path, repo_root):
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    registry.clear_state()
    trainer = run(
        [
            "--config", os.path.join(repo_root, "configs", "pythia_vqa2.yml"),
            "--model", "pythia", "--datasets", "vqa2", "--run_type", "val",
        ]
        + _common_opts(vqa2_root, tmp_path, "vqa2", "pythia")
    )
    # head sized from the dataset registry hook (vqa2/builder.py:40-48)
    assert registry.get("vqa2_num_final_outputs") == len(ANSWERS)
    loss_avg, metric_avg = trainer.evaluate("val")
    assert "total_loss" in loss_avg and np.isfinite(loss_avg["total_loss"])
    assert "vqa2/vqa_accuracy" in metric_avg
    assert 0.0 <= metric_avg["vqa2/vqa_accuracy"] <= 1.0

    # evalai-format predictions (vqa2/dataset.py:180-206)
    ds = trainer.datasets["val"]
    batch = next(iter(trainer.loaders["val"]))
    out = trainer.eval_step(trainer.params, batch["tensors"], trainer.rng, 0)
    import jax

    preds = ds.format_for_evalai(
        batch["tensors"], jax.device_get(out), batch["host"]
    )
    assert len(preds) == 3
    for p in preds:
        assert set(p) >= {"question_id", "answer", "image_id"}
        assert isinstance(p["answer"], str)


@pytest.mark.slow
def test_lorra_val_inference_e2e(textvqa_root, tmp_path, repo_root):
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    registry.clear_state()
    trainer = run(
        [
            "--config", os.path.join(repo_root, "configs", "lorra_textvqa.yml"),
            "--model", "lorra", "--datasets", "textvqa", "--run_type", "val",
        ]
        + _common_opts(textvqa_root, tmp_path, "textvqa", "lorra")
        + [
            "dataset_attributes.textvqa.processors.answer_processor.params."
            "vocab_file=vocabs/answers_vqa.txt",
            "dataset_attributes.textvqa.processors.answer_processor.params."
            "max_length=8",
            "dataset_attributes.textvqa.processors.context_processor.params."
            "max_length=8",
        ]
    )
    # soft-copy answer space = fixed vocab + OCR copy slots
    assert registry.get("textvqa_num_final_outputs") == len(ANSWERS) + 8
    loss_avg, metric_avg = trainer.evaluate("val")
    assert "total_loss" in loss_avg and np.isfinite(loss_avg["total_loss"])
    assert "textvqa/vqa_accuracy" in metric_avg

    ds = trainer.datasets["val"]
    batch = next(iter(trainer.loaders["val"]))
    import jax

    out = jax.device_get(
        trainer.eval_step(trainer.params, batch["tensors"], trainer.rng, 0)
    )
    preds = ds.format_for_evalai(batch["tensors"], out, batch["host"])
    assert len(preds) == 3
    assert all(isinstance(p["answer"], str) for p in preds)


def test_dataset_chain_units(textvqa_root):
    """Chain semantics without the trainer: VizWiz image_name override,
    vqa2_ocr question_id quirk, order-vector zero tail."""
    from vitxtgqa_tpu.core.config import Configuration
    from vitxtgqa_tpu.core.registry import registry
    from vitxtgqa_tpu.data.builders import VizWizBuilder, VQA2OCRBuilder

    registry.clear_state()
    cfg = Configuration(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "lorra_textvqa.yml"),
    )
    cfg.override_with_cmd_opts([
        f"dataset_attributes.textvqa.data_root_dir={textvqa_root}",
        "dataset_attributes.textvqa.imdb_files.val=['imdb_val.npy']",
        "dataset_attributes.textvqa.image_features.val=['feat']",
        "dataset_attributes.textvqa.features_max_len=7",
        "dataset_attributes.textvqa.processors.answer_processor.params."
        "vocab_file=vocabs/answers_vqa.txt",
        "dataset_attributes.textvqa.processors.answer_processor.params."
        "max_length=8",
        "dataset_attributes.textvqa.processors.context_processor.params."
        "max_length=8",
    ])
    node = cfg.freeze()
    ds_cfg = node.dataset_attributes["textvqa"]

    ds = VizWizBuilder().load("val", ds_cfg, seed=1)
    s = ds[0]
    # VizWiz: image_name overrides image_id (vizwiz/dataset.py:20-22)
    assert s["image_id"].startswith("VizWiz_")
    assert s["image_feature_0"].shape == (7, FEAT_DIM)
    assert int(s["image_info_0_max_features"]) == 4
    assert s["context_feature_0"].shape[0] == 8
    # order vectors: eye rows past the token count zeroed
    # (vqa2/dataset.py:152-155)
    n = int(s["context_info_0_max_features"])
    assert n == 3
    assert np.allclose(s["order_vectors"][:n], np.eye(8, dtype=np.float32)[:n])
    assert np.all(s["order_vectors"][n:] == 0)
    assert s["targets"].shape == (len(ANSWERS) + 8,)
    assert s["text"].shape == (14,)

    ocr_ds = VQA2OCRBuilder().load("val", ds_cfg, seed=1)
    assert ocr_ds[0]["dataset_name"] == "vqa2_ocr"
