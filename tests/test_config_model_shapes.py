"""Every experiment config builds its model at production dims and traces
both train and eval forwards under jax.eval_shape (no compile) — catches
config/model dimension mismatches across the whole zoo in seconds."""

import glob
import os

import jax
import numpy as np
import pytest

import vitxtgqa_tpu
from vitxtgqa_tpu.core.config import build_config
from vitxtgqa_tpu.core.registry import registry
from vitxtgqa_tpu.training.trainer import build_model
from vitxtgqa_tpu.utils.synthetic import synthetic_batch

NV = 5050
N_OCR = 960
DEC = 12


def _production_batch(need_gt=False):
    b = synthetic_batch(batch=2, num_final_outputs=NV + N_OCR)
    if need_gt:
        r = np.random.default_rng(0)
        b["ocr_bbox_list"] = r.random((2, N_OCR, 4)).astype(np.float32)
        b["eval_box_list"] = r.random((2, N_OCR, 4)).astype(np.float32)
        b["frame_list"] = b["frame_id"].astype(np.int64)
        b["frame_mask_embedding"] = b["frame_mask"]
        b["ocr_mask_embedding"] = b["ocr_mask"]
        b["ocr_track_id"] = b["track_id"]
        b["ocr_temporal_id"] = b["temporal_id"]
    return b


@pytest.fixture(scope="module", autouse=True)
def _registry_setup():
    vitxtgqa_tpu.setup_imports()

    class FakeProc:
        BOS_IDX = 2

    for name in ("vtextgqa", "gt_box"):
        registry.register(f"{name}_num_final_outputs", NV + N_OCR)
        registry.register(f"{name}_answer_processor", FakeProc())


# legacy image-VQA configs (pythia/lorra) take VQA2/TextVQA-format
# batches and emit {"scores"} — traced separately below
LEGACY_KEYS = ("pythia", "pythia_question_only", "pythia_image_only",
               "lorra", "ban", "top_down_bottom_up")


def _legacy_batch(with_context: bool):
    r = np.random.default_rng(0)
    b = {
        "text": r.integers(1, 900, (2, 14)).astype(np.int32),
        "text_len": np.array([14, 9], np.int64),
        "image_feature_0": r.standard_normal((2, 100, 2048)).astype(np.float32),
        "image_info_0_max_features": np.array([100, 73], np.int64),
    }
    if with_context:
        b["context_feature_0"] = r.standard_normal((2, 50, 300)).astype(
            np.float32
        )
        b["order_vectors"] = np.eye(50, dtype=np.float32)[None].repeat(2, 0)
    return b


@pytest.mark.parametrize(
    "config_name", [os.path.basename(p) for p in sorted(glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "configs", "*.yml")))],
)
def test_config_builds_and_traces(config_name, repo_root):
    cfg = build_config(os.path.join(repo_root, "configs", config_name))
    model_key = sorted(cfg.model_attributes)[0]
    if model_key in LEGACY_KEYS:
        _trace_legacy_config(cfg, model_key, config_name)
        return
    (model_key,) = list(cfg.model_attributes)
    dataset = "gt_box" if model_key in ("gt_box", "T2S_human") else "vtextgqa"
    model = build_model(model_key, cfg.model_attributes[model_key], dataset)
    batch = _production_batch(need_gt=(dataset == "gt_box"))

    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = jax.eval_shape(
        lambda r, b: model.init(r, b, train=True), rngs, batch
    )

    def fwd(v, b, train):
        return model.apply(
            v, b, train=train,
            rngs={"dropout": jax.random.key(3), "gumbel": jax.random.key(4)},
        )

    train_out = jax.eval_shape(lambda v, b: fwd(v, b, True), variables, batch)
    eval_out = jax.eval_shape(lambda v, b: fwd(v, b, False), variables, batch)
    for out in (train_out, eval_out):
        assert out["pos_scores"].shape == (2, DEC, NV + N_OCR), config_name
        assert "ground_frame" in out and "ground_box" in out


def _trace_legacy_config(cfg, model_key, config_name):
    """Legacy pythia/lorra configs: VQA2/TextVQA batch format, fixed-vocab
    (+soft-copy) scores head sized from the registry."""
    from vitxtgqa_tpu.core.registry import registry

    # the CLI supplies --datasets; the config carries the dataset defaults
    dataset = sorted(cfg.dataset_attributes)[0]
    n_out = 3129 if model_key.startswith("pythia") else 8000 + 50

    class FakeProc:
        BOS_IDX = 2

    registry.register(f"{dataset}_num_final_outputs", n_out)
    registry.register(f"{dataset}_answer_processor", FakeProc())
    model = build_model(model_key, cfg.model_attributes[model_key], dataset)
    batch = _legacy_batch(with_context=(model_key == "lorra"))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = jax.eval_shape(
        lambda r, b: model.init(r, b, train=True), rngs, batch
    )
    for train in (True, False):
        out = jax.eval_shape(
            lambda v, b: model.apply(
                v, b, train=train, rngs={"dropout": jax.random.key(3)}
            ),
            variables, batch,
        )
        assert out["scores"].shape == (2, n_out), config_name
