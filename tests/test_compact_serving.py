"""Grounding-compacted serving (models/common.set_compact_serving).

The pos grounding masks keep a static row set (frame_topk frames +
ocr_topk OCR slots per frame), so the serving decode can run the MMT on
just those rows.  Kept-row outputs must match the full masked pass
exactly (attention is permutation-equivariant over the key set); copy
scores for never-kept OCR slots are pinned to -1e4 — the one documented
deviation vs the reference's raw-0/1 ptr-mask quirk (t2s.py:665).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_t2s_model import tiny_config, tiny_batch, NV, N, F, K, S, T


@pytest.fixture(autouse=True)
def _reset_flag():
    from vitxtgqa_tpu.models.common import set_compact_serving

    yield
    set_compact_serving(False)


def _serving_outputs(compact: bool, gumbel_seed: int = 9):
    from vitxtgqa_tpu.models.common import set_compact_serving
    from vitxtgqa_tpu.models.t2s import T2S

    batch = tiny_batch(0)
    model = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2,
                inference_only=True)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    set_compact_serving(compact)
    try:
        out = model.apply(
            variables, batch, train=False,
            rngs={"gumbel": jax.random.key(gumbel_seed)},
        )
    finally:
        set_compact_serving(False)
    return out


def _assert_compact_agreement(full, comp):
    """Shared compact-vs-full assertions; returns the per-row kept counts.

    Traces may diverge only via the documented deviation (the full path's
    argmax picking a never-kept OCR slot); on agreeing prefixes the fixed
    vocab and kept-slot scores must match, and never-kept copy scores are
    pinned to -1e4."""
    ps_full = np.asarray(full["pos_scores"], np.float32)  # [B, S, NV+N]
    ps_comp = np.asarray(comp["pos_scores"], np.float32)
    assert ps_full.shape == ps_comp.shape

    # grounding outputs are untouched by the compact path
    np.testing.assert_array_equal(
        np.asarray(full["ground_frame"]), np.asarray(comp["ground_frame"])
    )

    kept = ps_comp[..., NV:] > -1e4 + 1.0  # [B, S, N]
    assert (kept == kept[:, :1, :]).all()  # same set every step

    am_full = ps_full.argmax(-1)
    am_comp = ps_comp.argmax(-1)
    b_idx, s_idx = np.nonzero(am_full != am_comp)
    for b, s in zip(b_idx, s_idx):
        first = s_idx[b_idx == b].min()
        tok = am_full[b, first]
        assert tok >= NV and not kept[b, first, tok - NV], (
            "trace diverged without the full path selecting a non-kept "
            f"OCR slot: b={b} s={s} tok={tok}"
        )

    agree = np.ones(ps_full.shape[:2], bool)
    for b in range(ps_full.shape[0]):
        bad = np.nonzero(am_full[b] != am_comp[b])[0]
        if bad.size:
            agree[b, bad.min():] = False
    np.testing.assert_allclose(
        ps_comp[agree][:, :NV], ps_full[agree][:, :NV], atol=2e-4
    )
    k = kept[agree]
    np.testing.assert_allclose(
        ps_comp[agree][..., NV:][k], ps_full[agree][..., NV:][k], atol=2e-4
    )
    assert (ps_comp[..., NV:][~kept] == -1e4).all()
    assert agree.any()
    return kept[:, 0, :].sum(axis=-1)


def test_compact_decode_matches_full_on_kept_rows():
    full = _serving_outputs(compact=False)
    comp = _serving_outputs(compact=True)
    n_kept = _assert_compact_agreement(full, comp)
    # exactly ocr_topk per frame are kept, every step the same set
    assert (n_kept == F * 2).all()  # tiny config: ocr_topk=2


def _wo_sg_outputs(compact: bool, batch, gumbel_seed: int = 9):
    from vitxtgqa_tpu.models.common import set_compact_serving
    from vitxtgqa_tpu.models.t2s_ablations import T2SWithoutSpatialGrounding

    model = T2SWithoutSpatialGrounding(
        config=tiny_config(), num_final_outputs=NV + N, bos_idx=2,
        inference_only=True,
    )
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    set_compact_serving(compact)
    try:
        out = model.apply(
            variables, batch, train=False,
            rngs={"gumbel": jax.random.key(gumbel_seed)},
        )
    finally:
        set_compact_serving(False)
    return out


def test_wo_sg_compact_matches_full_on_kept_rows():
    """t2s_wo_sg keeps every OCR slot of the grounded frames: with unique
    ground ids that is frame_topk * ocr_frame_num rows (tiny: 2*3=6)."""
    batch = tiny_batch(0)
    full = _wo_sg_outputs(compact=False, batch=batch)
    comp = _wo_sg_outputs(compact=True, batch=batch)
    n_kept = _assert_compact_agreement(full, comp)
    assert (n_kept == 2 * K).all()


def test_wo_sg_compact_with_duplicate_ground_ids():
    """One real frame + frame_topk=2 forces a padding ground frame, whose
    id maps 0->1 (frames_to_ocr_mask quirk) and collapses onto the real
    frame 1 — the pos_ocr_idx gather list -1-pads and the padded rows must
    neither attend nor clobber slot 0's copy score."""
    batch = tiny_batch(0)
    for i in range(batch["frame_id"].shape[0]):
        batch["frame_id"][i, 1:] = 0
        batch["frame_mask"][i, 1:] = 0
        batch["temporal_id"][i, K:] = 0
        batch["ocr_mask"][i] *= batch["temporal_id"][i] > 0
        batch["ocr_mask"][i, 0] = 1.0  # keep slot 0 live: the clobber probe
    full = _wo_sg_outputs(compact=False, batch=batch)
    comp = _wo_sg_outputs(compact=True, batch=batch)
    n_kept = _assert_compact_agreement(full, comp)
    # both ground entries collapse onto frame 1 -> only its K slots kept
    assert (n_kept == K).all()


def test_compact_decode_recompute_oracle_untouched():
    """decode_recompute (the reference-style per-step oracle) ignores the
    compact flag — it is the parity baseline."""
    from vitxtgqa_tpu.models.common import set_compact_serving
    from vitxtgqa_tpu.models.t2s import T2S

    batch = tiny_batch(0)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    model = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2,
                inference_only=True, decode_recompute=True)
    variables = model.init(rngs, batch, train=True)
    set_compact_serving(True)
    out = model.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(9)}
    )
    set_compact_serving(False)
    ref = model.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(9)}
    )
    np.testing.assert_allclose(
        np.asarray(out["pos_scores"]), np.asarray(ref["pos_scores"]),
        atol=1e-6,
    )


def _full_eval_outputs(compact: bool, gumbel_seed: int = 9):
    """3-variant full-eval (inference_only=False, eval mode)."""
    from vitxtgqa_tpu.models.common import set_compact_serving
    from vitxtgqa_tpu.models.t2s import T2S

    batch = tiny_batch(0)
    model = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2,
                inference_only=False)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    set_compact_serving(compact)
    try:
        out = model.apply(
            variables, batch, train=False,
            rngs={"gumbel": jax.random.key(gumbel_seed)},
        )
    finally:
        set_compact_serving(False)
    return out


def test_compact_full_eval_matches_full_on_kept_rows():
    """Compact full-eval: pos decode + the teacher-forced neg pass run on
    the statically-kept grounding rows; ref stays full.  When the decoded
    traces agree, ref must match exactly and pos/neg must match on the
    fixed vocab and their kept slots, with never-kept copy scores pinned
    to -1e4."""
    full = _full_eval_outputs(compact=False)
    comp = _full_eval_outputs(compact=True)
    n_kept = _assert_compact_agreement(full, comp)
    assert (n_kept == F * 2).all()  # pos: ocr_topk=2 per frame

    am_full = np.asarray(full["pos_scores"]).argmax(-1)
    am_comp = np.asarray(comp["pos_scores"]).argmax(-1)
    if (am_full == am_comp).all():
        # same teacher tokens -> ref is computed identically (full rows)
        np.testing.assert_allclose(
            np.asarray(comp["ref_scores"]), np.asarray(full["ref_scores"]),
            atol=2e-4,
        )
        # neg: fixed vocab + kept rows match; never-kept pinned
        ns_full = np.asarray(full["neg_scores"], np.float32)
        ns_comp = np.asarray(comp["neg_scores"], np.float32)
        np.testing.assert_allclose(
            ns_comp[..., :NV], ns_full[..., :NV], atol=2e-4
        )
        kept_n = ns_comp[..., NV:] > -1e4 + 1.0
        assert (kept_n == kept_n[:, :1, :]).all()
        np.testing.assert_allclose(
            ns_comp[..., NV:][kept_n], ns_full[..., NV:][kept_n], atol=2e-4
        )
        # neg keeps at most ocr_topk slots per frame (masked rows gather 0)
        assert (kept_n[:, 0, :].sum(-1) <= F * 2).all()


def test_postscan_epilogue_matches_inscan():
    """set_compact_postscan(True) (the measured-negative A/B arm kept
    in-tree) must produce bit-identical serving outputs to the default
    in-scan scatter — the argmax-in-compact-space token mapping and the
    one post-scan scatter are exact restructurings."""
    from vitxtgqa_tpu.models.base import set_compact_postscan

    inscan = _serving_outputs(compact=True)
    set_compact_postscan(True)
    try:
        postscan = _serving_outputs(compact=True)
    finally:
        set_compact_postscan(False)
    for k in ("pos_scores", "ground_frame"):
        np.testing.assert_array_equal(
            np.asarray(inscan[k]), np.asarray(postscan[k]), err_msg=k
        )
