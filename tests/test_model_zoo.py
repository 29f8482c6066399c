"""Model-zoo smoke tests: every registered model runs train + eval forward
on tiny shapes with the expected output contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitxtgqa_tpu.utils.synthetic import synthetic_batch, tiny_model_config

FRAMES, OPF, HID = 8, 3, 64
N = FRAMES * OPF
NUM_FINAL = 32 + N
DEC = 4


def _batch(extra_gt=False):
    b = synthetic_batch(
        batch=2, frames=FRAMES, ocr_per_frame=OPF, dec_steps=DEC, text_len=10,
        video_feat_dim=32, fasttext_dim=16, phoc_dim=24,
        num_final_outputs=NUM_FINAL, text_vocab=128, seed=3,
    )
    if extra_gt:
        r = np.random.default_rng(0)
        b["ocr_bbox_list"] = r.random((2, N, 4)).astype(np.float32)
        b["frame_list"] = b["frame_id"].astype(np.int64)
        b["frame_mask_embedding"] = b["frame_mask"]
        b["ocr_mask_embedding"] = b["ocr_mask"]
        b["ocr_track_id"] = b["track_id"]
        b["ocr_temporal_id"] = b["temporal_id"]
    return b


def _init_and_run(model_cls, batch, **kw):
    model = model_cls(
        config=tiny_model_config(hidden=HID, frames=FRAMES, ocr_per_frame=OPF),
        num_final_outputs=NUM_FINAL, bos_idx=2, **kw,
    )
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    train_out = model.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.key(3), "gumbel": jax.random.key(4)},
    )
    eval_out = model.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(5)}
    )
    return train_out, eval_out


def _check_contract(out, n_box_rows=None):
    assert out["pos_scores"].shape == (2, DEC, NUM_FINAL)
    assert np.isfinite(np.asarray(out["pos_scores"])).all()
    assert out["ground_box"].shape[0] == 2 and out["ground_box"].shape[-1] == 4
    if n_box_rows is not None:
        assert out["ground_box"].shape[1] == n_box_rows
    assert "ground_frame" in out and "frame_topk" in out and "ocr_topk" in out


def test_m4c():
    from vitxtgqa_tpu.models.m4c import M4C

    train_out, eval_out = _init_and_run(M4C, _batch())
    _check_contract(train_out, n_box_rows=2)  # ocr_topk=2 in the middle frame
    _check_contract(eval_out, n_box_rows=2)
    assert eval_out["ground_frame"].shape == (2, 1)


def test_t5vitevqa():
    from vitxtgqa_tpu.models.t5vitevqa import T5ViteVQA

    train_out, eval_out = _init_and_run(T5ViteVQA, _batch())
    _check_contract(train_out, n_box_rows=4)  # frame_topk*ocr_topk = 4
    assert eval_out["ground_frame"].shape == (2, FRAMES)


def test_gt_box():
    from vitxtgqa_tpu.models.gt_box import GTBox

    batch = _batch(extra_gt=True)
    train_out, eval_out = _init_and_run(GTBox, batch)
    _check_contract(train_out, n_box_rows=N)
    np.testing.assert_array_equal(
        np.asarray(eval_out["ground_frame"]), batch["frame_list"]
    )


def test_t2s_wo_tg():
    from vitxtgqa_tpu.models.t2s_ablations import T2SWithoutTemporalGrounding

    train_out, eval_out = _init_and_run(T2SWithoutTemporalGrounding, _batch())
    for k in ("ref_scores", "pos_scores", "neg_scores"):
        assert train_out[k].shape == (2, DEC, NUM_FINAL)
    # ground_frame holds grid indices here (reference quirk)
    gf = np.asarray(eval_out["ground_frame"])
    assert gf.shape == (2, 2) and (gf < FRAMES).all()


def test_t2s_wo_sg():
    from vitxtgqa_tpu.models.t2s_ablations import T2SWithoutSpatialGrounding

    train_out, eval_out = _init_and_run(T2SWithoutSpatialGrounding, _batch())
    _check_contract(train_out, n_box_rows=2 * OPF)  # topk frames x all slots
    # pos/neg ocr masks partition: neg = 1 - pos, so InfoNCE logits differ
    assert np.isfinite(np.asarray(train_out["neg_scores"])).all()


def test_registry_has_all_models():
    import vitxtgqa_tpu

    vitxtgqa_tpu.setup_imports()
    from vitxtgqa_tpu.core.registry import registry

    for key in ("t2s", "t2s_wo_tg", "t2s_wo_sg", "m4c", "t5vitevqa", "gt_box"):
        assert key in registry.list("model"), key


@pytest.mark.parametrize("model_key", ["t2s", "t2s_wo_tg", "t2s_wo_sg"])
def test_eval_fast_path_matches_recompute_oracle(model_key):
    """The teacher-forced ref/neg eval path must equal the reference-style
    full-recompute loop (decode_recompute=True) for the base model AND the
    grounding ablations, under identical weights and gumbel noise."""
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.models.t2s_ablations import (
        T2SWithoutSpatialGrounding,
        T2SWithoutTemporalGrounding,
    )

    model_cls = {
        "t2s": T2S,
        "t2s_wo_tg": T2SWithoutTemporalGrounding,
        "t2s_wo_sg": T2SWithoutSpatialGrounding,
    }[model_key]
    batch = _batch()
    cfg = tiny_model_config(hidden=HID, frames=FRAMES, ocr_per_frame=OPF)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}

    fast = model_cls(config=cfg, num_final_outputs=NUM_FINAL, bos_idx=2)
    variables = fast.init(rngs, batch, train=True)
    out_fast = fast.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(9)}
    )
    oracle = model_cls(
        config=cfg, num_final_outputs=NUM_FINAL, bos_idx=2,
        decode_recompute=True,
    )
    out_oracle = oracle.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(9)}
    )
    for key in ("pos_scores", "ref_scores", "neg_scores"):
        np.testing.assert_allclose(
            np.asarray(out_fast[key]), np.asarray(out_oracle[key]),
            atol=2e-4, err_msg=f"{model_key}: {key}",
        )
    np.testing.assert_array_equal(
        np.asarray(out_fast["ground_frame"]),
        np.asarray(out_oracle["ground_frame"]),
    )
