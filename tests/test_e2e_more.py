"""Additional end-to-end coverage: gt_box oracle pipeline + checkpoint resume."""

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


def _opts(fixture_data, tmp_path, model, dataset="vtextgqa"):
    return [
        f"dataset_attributes.{dataset}.data_root_dir={fixture_data}",
        "training_parameters.batch_size=2",
        "training_parameters.num_workers=0",
        f"training_parameters.save_dir={tmp_path}/save",
        "training_parameters.seed=13",
        "training_parameters.tpu.compute_dtype=float32",
        f"model_attributes.{model}.text_bert.num_hidden_layers=1",
        f"model_attributes.{model}.mmt.num_hidden_layers=1",
        f"model_attributes.{model}.translayers.num_hidden_layers=1",
        f"model_attributes.{model}.encoder.num_hidden_layers=1",
    ]


@pytest.mark.slow
def test_gt_box_val_inference(fixture_data, tmp_path, repo_root):
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    registry.clear_state()
    trainer = run(
        [
            "--config", os.path.join(repo_root, "configs", "gt_box_clipocr.yml"),
            "--model", "gt_box", "--datasets", "gt_box", "--run_type", "val",
        ]
        + _opts(fixture_data, tmp_path, "gt_box", dataset="gt_box")
        + [
            # fixtures ship the abinet-named OCR dir; point ClipOCR there
            "dataset_attributes.gt_box.ocr_infos.val=['fps10_ocr_detection/val']",
        ]
    )
    loss_avg, metric_avg = trainer.evaluate("val")
    # the oracle's grounded frames come straight from GT spans: temporal
    # grounding must be (near-)perfect on fixtures
    assert metric_avg["gt_box/IOU@0.5"] >= 0.5
    assert "gt_box/textvqa_accuracy" in metric_avg


@pytest.mark.slow
def test_resume_from_checkpoint(fixture_data, tmp_path, repo_root):
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    flags = [
        "--config", os.path.join(repo_root, "configs", "m4c_abinet.yml"),
        "--model", "m4c", "--datasets", "vtextgqa",
    ]
    opts = _opts(fixture_data, tmp_path, "m4c")

    registry.clear_state()
    run(flags + ["--run_type", "train"] + opts
        + ["training_parameters.max_iterations=2",
           "training_parameters.log_interval=10",
           "training_parameters.snapshot_interval=2"])
    best = os.path.join(str(tmp_path), "save", "ckpt", "best")
    assert os.path.exists(best)
    import json

    with open(best + ".meta.json") as f:
        meta = json.load(f)
    assert "epoch" in meta  # resume restores the epoch-seeded data shuffle

    registry.clear_state()
    # flags must precede the dotted opts — the original form appended
    # --run_type/--resume_file after two overrides, which argparse's
    # REMAINDER silently swallowed (the "resume" trained from scratch
    # and the iteration assert passed vacuously) until core/flags.py
    # started erroring on flags inside the opts remainder
    trainer = run(
        flags + ["--run_type", "train", "--resume_file", best] + opts
        + ["training_parameters.max_iterations=3",
           "training_parameters.log_interval=10",
           "training_parameters.snapshot_interval=10"]
    )
    # resumed at 2, ran one more step, finalize restored BEST (which
    # also restores the iteration counter — best may remain iteration
    # 2's); the model_3 snapshot proves the resumed step ran
    trainer.checkpoint.wait()
    assert os.path.exists(
        os.path.join(str(tmp_path), "save", "ckpt", "models", "model_3"))


@pytest.mark.slow
@pytest.mark.parametrize("model,config", [
    ("t5vitevqa", "t5vitevqa_abinet.yml"),
    ("transtr", "transtr_abinet.yml"),
    ("mist", "mist_abinet.yml"),
    # ablations share the t2s attribute block (lone-entry fallback)
    ("t2s_wo_tg", "t2s_abinet.yml"),
    ("t2s_wo_sg", "t2s_abinet.yml"),
])
def test_baseline_models_val_inference(model, config, fixture_data, tmp_path,
                                       repo_root):
    """Every remaining baseline and ablation runs val inference end-to-end
    through the CLI on fixtures (selectors, configs, metrics wired)."""
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    attr_key = "t2s" if model.startswith("t2s") else model
    registry.clear_state()
    trainer = run(
        [
            "--config", os.path.join(repo_root, "configs", config),
            "--model", model, "--datasets", "vtextgqa", "--run_type", "val",
        ]
        + _opts(fixture_data, tmp_path, attr_key)
    )
    loss_avg, metric_avg = trainer.evaluate("val")
    assert "total_loss" in loss_avg
    for key in ("textvqa_accuracy", "IOU@0.5", "GQA@0.5"):
        assert f"vtextgqa/{key}" in metric_avg, (model, key)


@pytest.mark.slow
def test_t2s_train_variant_scan_via_trainer(fixture_data, tmp_path, repo_root):
    """training_parameters.tpu.variant_scan=True must route through the
    trainer's model rebind (regression: flax modules have no .replace —
    clone() is the rebinding API) and train with the scanned variants."""
    sys.path.insert(0, repo_root)
    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    registry.clear_state()
    trainer = run(
        [
            "--config", os.path.join(repo_root, "configs", "t2s_abinet.yml"),
            "--model", "t2s", "--datasets", "vtextgqa",
            "--run_type", "train",
        ]
        + _opts(fixture_data, tmp_path, "t2s")
        + [
            "training_parameters.tpu.variant_scan=True",
            "training_parameters.max_iterations=2",
            "training_parameters.log_interval=2",
            "training_parameters.snapshot_interval=10",
        ]
    )
    assert trainer.model.train_variant_scan is True
    assert trainer.iteration == 2


@pytest.mark.slow
def test_t2s_evalai_predict_compact_serving(fixture_data, tmp_path, repo_root):
    """evalai_inference routes through the serving (inference_only) model,
    and compact_serving composes with it end to end: the prediction JSON
    comes out of the grounding-compacted decode."""
    sys.path.insert(0, repo_root)
    import glob
    import json

    from tools.run import run
    from vitxtgqa_tpu.core.registry import registry

    registry.clear_state()
    trainer = run(
        [
            "--config", os.path.join(repo_root, "configs", "t2s_abinet.yml"),
            "--model", "t2s", "--datasets", "vtextgqa",
            "--run_type", "inference",
        ]
        + _opts(fixture_data, tmp_path, "t2s")
        + [
            "training_parameters.evalai_inference=True",
            "training_parameters.tpu.compact_serving=True",
        ]
    )
    assert trainer.model.inference_only is True
    reports = glob.glob(f"{tmp_path}/save/**/reports/*.json", recursive=True)
    assert reports, "no prediction JSON written"
    with open(reports[0]) as f:
        preds = json.load(f)
    assert preds and {"question_id", "answer", "grounded frame",
                      "grounded box", "pred_source"} <= set(preds[0])
