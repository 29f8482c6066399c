"""Trainer-level sequence parallelism: mesh.sp knob builds a 3-axis mesh,
routes attention through the sp shard_map, and completes a val run."""

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
def test_val_inference_with_sp_mesh(fixture_data, tmp_path, repo_root):
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry
    from vitxtgqa_tpu.ops.attention import set_sequence_parallel

    registry.clear_state()
    try:
        trainer = run(
            [
                "--config", os.path.join(repo_root, "configs", "m4c_abinet.yml"),
                "--model", "m4c", "--datasets", "vtextgqa", "--run_type", "val",
                f"dataset_attributes.vtextgqa.data_root_dir={fixture_data}",
                "training_parameters.batch_size=2",
                "training_parameters.num_workers=0",
                f"training_parameters.save_dir={tmp_path}/save",
                "training_parameters.seed=13",
                "training_parameters.tpu.compute_dtype=float32",
                "training_parameters.tpu.mesh.data=1",
                "training_parameters.tpu.mesh.sp=2",
                "model_attributes.m4c.text_bert.num_hidden_layers=1",
                "model_attributes.m4c.mmt.num_hidden_layers=1",
            ]
        )
        assert dict(trainer.mesh.shape)["sp"] == 2
        loss_avg, metric_avg = trainer.evaluate("val")
        assert "vtextgqa/textvqa_accuracy" in metric_avg
    finally:
        set_sequence_parallel(None)
