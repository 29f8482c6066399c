"""Minimum end-to-end slice (SURVEY.md §7.4): m4c val inference on fixtures,
CPU, single process — config -> dataset -> jitted KV-cached decode -> QA +
grounding metrics.  Then a short t2s train run exercising the full loop.
"""

import os
import subprocess
import sys

import pytest

FIXROOT = os.path.join(os.path.dirname(__file__), "fixtures", "data")


@pytest.fixture(scope="module")
def fixture_data(repo_root):
    if not os.path.exists(os.path.join(FIXROOT, "vtextgqa")):
        subprocess.run(
            [sys.executable, os.path.join(repo_root, "tools", "make_fixtures.py"),
             "--root", FIXROOT, "--feat_dim", "1024"],
            check=True, cwd=repo_root,
        )
    return FIXROOT


def _common_opts(fixture_data, tmp_path, model):
    return [
        f"dataset_attributes.vtextgqa.data_root_dir={fixture_data}",
        "dataset_attributes.vtextgqa.processors.answer_processor.params.vocab_file="
        "vtextgqa/vocabulary/fixed_vocab_top5k.txt",
        "training_parameters.batch_size=2",
        "training_parameters.num_workers=0",
        f"training_parameters.save_dir={tmp_path}/save",
        "training_parameters.seed=13",
        "training_parameters.tpu.compute_dtype=float32",
        # shrink transformers so CPU compile stays fast
        f"model_attributes.{model}.text_bert.num_hidden_layers=1",
        f"model_attributes.{model}.mmt.num_hidden_layers=1",
        f"model_attributes.{model}.translayers.num_hidden_layers=1",
        f"model_attributes.{model}.encoder.num_hidden_layers=1",
    ]


@pytest.mark.slow
def test_m4c_val_inference(fixture_data, tmp_path, repo_root):
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    registry.clear_state()
    trainer = run(
        [
            "--config", os.path.join(repo_root, "configs", "m4c_abinet.yml"),
            "--model", "m4c", "--datasets", "vtextgqa", "--run_type", "val",
        ]
        + _common_opts(fixture_data, tmp_path, "m4c")
    )
    loss_avg, metric_avg = trainer.evaluate("val")
    # the full metric suite must produce values
    for key in (
        "vtextgqa/textvqa_accuracy", "vtextgqa/stvqa_anls",
        "vtextgqa/IOU@0.3", "vtextgqa/IOU@0.5",
        "vtextgqa/GQA@0.3", "vtextgqa/GQA@0.5",
    ):
        assert key in metric_avg, key
        assert 0.0 <= metric_avg[key] <= 1.0
    assert "total_loss" in loss_avg


@pytest.mark.slow
def test_t2s_train_short(fixture_data, tmp_path, repo_root):
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    registry.clear_state()
    trainer = run(
        [
            "--config", os.path.join(repo_root, "configs", "t2s_abinet.yml"),
            "--model", "t2s", "--datasets", "vtextgqa", "--run_type", "train",
        ]
        + _common_opts(fixture_data, tmp_path, "t2s")
        + [
            "training_parameters.max_iterations=3",
            "training_parameters.log_interval=2",
            "training_parameters.snapshot_interval=3",
            "training_parameters.warmup_iterations=2",
        ]
    )
    assert trainer.iteration == 3
    # snapshot at it 3 saved best + final checkpoints
    assert os.path.exists(os.path.join(str(tmp_path), "save", "ckpt", "best"))
    assert os.path.exists(os.path.join(str(tmp_path), "save", "ckpt", "final"))
    # validation metrics made it into the meter
    assert any(k.startswith("val/") for k in trainer.meter.get_scalar_dict())
