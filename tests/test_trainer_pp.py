"""Trainer-level pipeline parallelism: mesh.pp builds a (data, pp) mesh,
routes divisible transformer stacks through the GPipe schedule, and
completes real train + val steps end to end (reference has no PP —
SURVEY.md §2.9; capability extension)."""

import os
import subprocess
import sys

import jax
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


@pytest.mark.slow
def test_train_and_val_with_pp_mesh(fixture_data, tmp_path, repo_root):
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices (1 data x 2 pp)")
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry
    from vitxtgqa_tpu.models.common import set_pipeline

    registry.clear_state()
    try:
        trainer = run(
            [
                "--config", os.path.join(repo_root, "configs", "m4c_abinet.yml"),
                "--model", "m4c", "--datasets", "vtextgqa", "--run_type", "train",
                f"dataset_attributes.vtextgqa.data_root_dir={fixture_data}",
                "training_parameters.batch_size=2",
                "training_parameters.num_workers=0",
                f"training_parameters.save_dir={tmp_path}/save",
                "training_parameters.seed=13",
                "training_parameters.max_iterations=2",
                "training_parameters.log_interval=1",
                "training_parameters.snapshot_interval=2",
                "training_parameters.tpu.compute_dtype=float32",
                "training_parameters.tpu.mesh.data=1",
                "training_parameters.tpu.mesh.pp=2",
                # 2-layer stacks divide into 2 stages; dropout 0 so the
                # pipeline path is eligible in the train step too; small
                # hidden keeps the grad-through-GPipe graph inside the
                # virtual-CPU-device memory budget (full dims abort)
                "model_attributes.m4c.text_bert.num_hidden_layers=2",
                "model_attributes.m4c.mmt.num_hidden_layers=2",
                "model_attributes.m4c.text_bert.hidden_size=128",
                "model_attributes.m4c.text_bert.num_attention_heads=4",
                "model_attributes.m4c.text_bert.intermediate_size=256",
                "model_attributes.m4c.mmt.hidden_size=128",
                "model_attributes.m4c.mmt.num_attention_heads=4",
                "model_attributes.m4c.mmt.intermediate_size=256",
                "model_attributes.m4c.grounding.hidden_size=128",
                "model_attributes.m4c.classifier.ocr_ptr_net.hidden_size=128",
                "model_attributes.m4c.classifier.ocr_ptr_net.query_key_size=128",
                "model_attributes.m4c.text_bert.hidden_dropout_prob=0.0",
                "model_attributes.m4c.text_bert.attention_probs_dropout_prob=0.0",
                "model_attributes.m4c.mmt.hidden_dropout_prob=0.0",
                "model_attributes.m4c.mmt.attention_probs_dropout_prob=0.0",
                "model_attributes.m4c.obj.dropout_prob=0.0",
                "model_attributes.m4c.ocr.dropout_prob=0.0",
            ]
        )
        assert dict(trainer.mesh.shape)["pp"] == 2
        assert trainer.iteration == 2  # both train steps ran through GPipe
        loss_avg, metric_avg = trainer.evaluate("val")
        assert "vtextgqa/textvqa_accuracy" in metric_avg
    finally:
        set_pipeline(None)
