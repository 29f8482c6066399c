"""MIST model tests: selector semantics + forward contract."""

import jax
import jax.numpy as jnp
import numpy as np

from vitxtgqa_tpu.models.mist import MIST, Selector, MIST_OCR_MASK_ONES
from vitxtgqa_tpu.utils.synthetic import synthetic_batch, tiny_model_config

FRAMES, OPF = 8, 3
N = FRAMES * OPF
NUM_FINAL = 32 + N


def test_selector_shapes_and_mask():
    sel = Selector(topk=3, dim=16)
    q = jnp.ones((2, 1, 16))
    keys = jax.random.normal(jax.random.key(0), (2, 6, 16))
    values = jax.random.normal(jax.random.key(1), (2, 6, 4, 16))
    variables = sel.init({"params": jax.random.key(2), "gumbel": jax.random.key(3)},
                         q, keys, values)
    picked, idx, mask = sel.apply(
        variables, q, keys, values, rngs={"gumbel": jax.random.key(4)}
    )
    assert picked.shape == (2, 3, 4, 16)
    assert idx.shape == (2, 3) and (np.asarray(idx) < 6).all()
    # accumulated mask sums to topk (duplicates allowed)
    np.testing.assert_allclose(np.asarray(mask.sum(-1)), 3.0)


def test_mist_forward():
    cfg = tiny_model_config(hidden=64, frames=FRAMES, ocr_per_frame=OPF)
    batch = synthetic_batch(
        batch=2, frames=FRAMES, ocr_per_frame=OPF, dec_steps=4, text_len=10,
        video_feat_dim=32, fasttext_dim=16, phoc_dim=24,
        num_final_outputs=NUM_FINAL, text_vocab=128,
    )
    model = MIST(config=cfg, num_final_outputs=NUM_FINAL, bos_idx=2)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    train_out = model.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.key(3), "gumbel": jax.random.key(4)},
    )
    assert train_out["pos_scores"].shape == (2, 4, NUM_FINAL)
    eval_out = model.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(5)}
    )
    assert eval_out["pos_scores"].shape == (2, 4, NUM_FINAL)
    assert eval_out["ground_frame"].shape == (2, 2)  # frame_topk=2 indices
    assert eval_out["ground_box"].shape == (2, min(MIST_OCR_MASK_ONES, N), 4)
    assert np.isfinite(np.asarray(eval_out["pos_scores"])).all()
