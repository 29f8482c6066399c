"""Trainer resume on a dp x tp mesh restores arrays directly onto their
mesh shards (Checkpoint.load shardings path wired through _restore):
params come back with their model-axis partitioning, not host-replicated
copies — the multi-host resume behaviour, exercised on virtual devices."""

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


def _args(fixture_data, tmp_path, repo_root, flags=()):
    # extra flags (e.g. --resume_file) must precede the dotted opts —
    # argparse's REMAINDER swallows flags after the first override token
    # (core/flags.py errors on it since round 5; the original form of the
    # resume test below appended --resume_file AFTER the opts, so the
    # "resumed" trainer silently trained from scratch and the iteration
    # assert passed vacuously)
    return [
        "--config", os.path.join(repo_root, "configs", "m4c_abinet.yml"),
        "--model", "m4c", "--datasets", "vtextgqa", "--run_type", "train",
        *flags,
        f"dataset_attributes.vtextgqa.data_root_dir={fixture_data}",
        "training_parameters.batch_size=2",
        "training_parameters.num_workers=0",
        f"training_parameters.save_dir={tmp_path}/save",
        "training_parameters.seed=13",
        "training_parameters.log_interval=10",
        "training_parameters.tpu.compute_dtype=float32",
        "training_parameters.tpu.mesh.data=2",
        "training_parameters.tpu.mesh.model=2",
        # hidden 128 divides the 2-way model axis, so dense kernels shard
        "model_attributes.m4c.text_bert.num_hidden_layers=1",
        "model_attributes.m4c.mmt.num_hidden_layers=1",
        "model_attributes.m4c.text_bert.hidden_size=128",
        "model_attributes.m4c.text_bert.num_attention_heads=4",
        "model_attributes.m4c.text_bert.intermediate_size=256",
        "model_attributes.m4c.mmt.hidden_size=128",
        "model_attributes.m4c.mmt.num_attention_heads=4",
        "model_attributes.m4c.mmt.intermediate_size=256",
        "model_attributes.m4c.grounding.hidden_size=128",
        "model_attributes.m4c.classifier.ocr_ptr_net.hidden_size=128",
        "model_attributes.m4c.classifier.ocr_ptr_net.query_key_size=128",
    ]


@pytest.mark.slow
def test_resume_restores_model_axis_sharding(fixture_data, tmp_path, repo_root):
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices (2 data x 2 model)")
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    registry.clear_state()
    trainer = run(
        _args(fixture_data, tmp_path, repo_root)
        + ["training_parameters.max_iterations=2",
           "training_parameters.snapshot_interval=2"]
    )
    assert trainer.iteration == 2
    snap = os.path.join(str(tmp_path), "save", "ckpt", "models", "model_2")
    trainer.checkpoint.wait()
    assert os.path.exists(snap)

    import numpy as np

    saved = jax.tree.map(np.asarray, trainer.params)
    registry.clear_state()
    resumed = run(
        _args(fixture_data, tmp_path, repo_root,
              flags=("--resume_file", snap))
        + ["training_parameters.max_iterations=3",
           "training_parameters.snapshot_interval=10"]
    )
    # resumed at 2, ran one more step, then finalize() restored BEST —
    # which also restores the iteration counter (reference
    # base_trainer.py:280-291), so the trained-step evidence is the
    # model_3 snapshot finalize writes: it must exist and differ from
    # the resume point (guards the vacuous-pass mode the original test
    # had, where a swallowed --resume_file trained 3 fresh iterations)
    resumed.checkpoint.wait()
    snap3 = os.path.join(str(tmp_path), "save", "ckpt", "models", "model_3")
    assert os.path.exists(snap3), snap3
    stepped = jax.tree_util.tree_leaves(jax.tree.map(
        np.asarray, resumed.checkpoint.load(snap3)["params"]))
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(saved), stepped)
    ), "resume ran no optimizer step"

    # restored params carry their mesh partitioning: at least one kernel is
    # model-axis sharded (not a host-replicated copy that was re-put)
    leaves = jax.tree_util.tree_leaves(resumed.params)
    assert any(
        hasattr(p, "sharding") and not p.sharding.is_fully_replicated
        for p in leaves
    ), "no restored param is model-axis sharded"
    specs = {
        str(p.sharding.spec)
        for p in leaves
        if hasattr(p, "sharding") and not p.sharding.is_fully_replicated
    }
    assert any("model" in s for s in specs), specs
