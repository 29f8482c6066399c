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


def test_spmd_mesh_disables_pallas(fixture_data, tmp_path, repo_root):
    """pallas_call has no GSPMD partitioning rule — under a plain
    dp/tp/pp-sharded jit XLA all-gathers its inputs and replicates the
    kernel on every device (round-5 probe: sharded input in,
    PartitionSpec() out), silently destroying data-parallel scaling.
    The trainer must fall back to the sharded XLA paths (and drop the
    int8 KV cache, whose XLA fallback pays a per-step dequantize) on
    any multi-device dp x tp x pp mesh, even when the config asks for
    Pallas.  sp-only meshes keep Pallas: sequence parallelism routes
    attention through its own shard_map."""
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry
    from vitxtgqa_tpu.models.common import kv_cache_int8_enabled
    from vitxtgqa_tpu.ops.attention import pallas_enabled

    registry.clear_state()
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
            "training_parameters.tpu.use_pallas=True",
            "training_parameters.tpu.kv_cache_int8=True",
            "training_parameters.tpu.mesh.data=2",
            "model_attributes.m4c.text_bert.num_hidden_layers=1",
            "model_attributes.m4c.mmt.num_hidden_layers=1",
        ]
    )
    assert dict(trainer.mesh.shape)["data"] == 2
    assert not pallas_enabled()
    assert not kv_cache_int8_enabled()
