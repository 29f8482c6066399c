"""Grounding-compacted TRAINING (models/common.set_compact_train).

The pos/neg contrastive variants run their teacher-forced MMT pass on the
statically-kept grounding rows; the ref variant stays full.  Kept-row
scores must match the full train path exactly (attention is
permutation-equivariant over the key set); non-kept copy-score slots take
the ref variant's stop-gradient values — the documented estimator
deviation (full training computes live pos/neg scores there via the
reference's raw 0/1 ptr-mask quirk, feeding InfoNCE's full-vector cosine
and the BCE on non-grounded answer slots)."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_t2s_model import tiny_config, tiny_batch, NV, N, F


@pytest.fixture(autouse=True)
def _reset_flag():
    from vitxtgqa_tpu.models.common import set_compact_train

    yield
    set_compact_train(False)


def _train_outputs(compact: bool, grad: bool = False,
                   capture_grounding: bool = False):
    from vitxtgqa_tpu.models.common import set_compact_train
    from vitxtgqa_tpu.models.grounding import GroundingModule
    from vitxtgqa_tpu.models.t2s import T2S

    cfg = tiny_config()
    # exactness requires dropout off (the two paths draw different
    # dropout streams); gumbel stays on and is seed-matched
    for sect in ("text_bert", "translayers", "encoder", "mmt"):
        cfg[sect]["hidden_dropout_prob"] = 0.0
        cfg[sect]["attention_probs_dropout_prob"] = 0.0
    cfg["obj"]["dropout_prob"] = 0.0
    cfg["ocr"]["dropout_prob"] = 0.0
    batch = tiny_batch(0)
    model = T2S(config=cfg, num_final_outputs=NV + N, bos_idx=2)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    apply_rngs = {"dropout": jax.random.key(5), "gumbel": jax.random.key(9)}
    set_compact_train(compact)
    try:
        if capture_grounding:
            # the grounding gather lists (pos/neg_ocr_idx) identify the
            # kept copy-score slots but don't ride in the train outputs;
            # capture the module's output dict (rng consumption is
            # unchanged, so the kept set matches the score run's)
            out, aux = model.apply(
                variables, batch, train=True, rngs=apply_rngs,
                capture_intermediates=lambda mdl, _:
                    isinstance(mdl, GroundingModule),
                mutable=["intermediates"],
            )
            g = jax.tree_util.tree_leaves(
                aux["intermediates"],
                is_leaf=lambda x: isinstance(x, dict) and "pos_ocr_idx" in x,
            )[0]
            out = dict(out, _grounding=g)
        else:
            out = model.apply(variables, batch, train=True, rngs=apply_rngs)
        grads = None
        if grad:
            def loss(p):
                o = model.apply({"params": p}, batch, train=True,
                                rngs=apply_rngs)
                from vitxtgqa_tpu.losses import info_nce, pos_bce_loss

                return pos_bce_loss(batch, o) + 1000.0 * info_nce(batch, o)

            grads = jax.grad(loss)(variables["params"])
    finally:
        set_compact_train(False)
    return out, grads


def test_compact_train_matches_full_on_kept_rows():
    full, _ = _train_outputs(False)
    comp, _ = _train_outputs(True, capture_grounding=True)
    # ref variant is identical (it never compacts)
    np.testing.assert_allclose(
        np.asarray(comp["ref_scores"], np.float32),
        np.asarray(full["ref_scores"], np.float32), atol=2e-4,
    )
    ref = np.asarray(full["ref_scores"], np.float32)
    g = comp["_grounding"]
    for key, pfx in (("pos_scores", "pos"), ("neg_scores", "neg")):
        fs = np.asarray(full[key], np.float32)
        cs = np.asarray(comp[key], np.float32)
        assert fs.shape == cs.shape
        # fixed-vocab scores: exact (dec rows attend to the same kept keys
        # under either formulation)
        np.testing.assert_allclose(cs[..., :NV], fs[..., :NV], atol=2e-4,
                                   err_msg=key)
        # the kept copy-slot set comes from the grounding gather lists
        # (as tools/compact_agreement.py derives it), NOT from which
        # scores happen to agree — a broken scatter that returned ref
        # fills on kept slots must fail here
        ci = np.asarray(g[f"{pfx}_ocr_idx"], np.int64)  # [B, K], -1 pads
        b_n = fs.shape[0]
        kept = np.zeros((b_n, N), dtype=bool)
        for b in range(b_n):
            kept[b, ci[b][ci[b] >= 0]] = True
        assert kept.any() and not kept.all(), key
        kept3 = np.broadcast_to(kept[:, None, :], fs[..., NV:].shape)
        # kept slots: exact vs the full path
        np.testing.assert_allclose(
            cs[..., NV:][kept3], fs[..., NV:][kept3], atol=2e-4,
            err_msg=f"{key} kept slots",
        )
        # non-kept slots: exactly the ref variant's fill
        np.testing.assert_allclose(
            cs[..., NV:][~kept3], ref[..., NV:][~kept3], atol=2e-4,
            err_msg=f"{key} non-kept slots",
        )
    # grounding outputs untouched
    np.testing.assert_array_equal(
        np.asarray(full["ground_frame"]), np.asarray(comp["ground_frame"])
    )


def test_compact_train_grad_structure():
    """Compact-path gradients: finite everywhere, nonzero on the MMT
    trunk, and grounding params stay zero-grad exactly like the full path
    (the reference's dead-grounding-params quirk: the gumbel split is
    parameter-free and the top-k selection is hard — reference:
    spatio_temporal_grounding.py:26-142; CLAUDE.md reference-quirk
    policy).  The compact/full gradient agreement on the trunk is the
    per-parameter-group cosine — the estimator deviation (non-kept copy
    scores take stop-grad ref fills) shows up as sub-1.0 cosines, and the
    on-chip trajectory probe (tools/compact_train_check.py) owns the
    does-it-train question."""
    _, grads_c = _train_outputs(True, grad=True)
    _, grads_f = _train_outputs(False, grad=True)
    leaves_c = jax.tree_util.tree_leaves_with_path(grads_c)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(grads_f))
    trunk_norm = 0.0
    for path, g in leaves_c:
        gc = np.asarray(g, np.float32)
        assert np.isfinite(gc).all(), path
        name = jax.tree_util.keystr(path).lower()
        gf = np.asarray(flat_f[path], np.float32)
        if "ground" in name:
            # dead in both paths (reference quirk)
            assert np.abs(gc).sum() == 0.0, path
            assert np.abs(gf).sum() == 0.0, path
        else:
            trunk_norm += float(np.abs(gc).sum())
    assert trunk_norm > 0.0
    # whole-trunk gradient cosine between the two estimators: positive
    # and strongly aligned (the deviation is a perturbation, not a
    # different direction)
    vc = np.concatenate([
        np.asarray(g, np.float32).ravel() for p, g in leaves_c
        if "ground" not in jax.tree_util.keystr(p).lower()
    ])
    vf = np.concatenate([
        np.asarray(flat_f[p], np.float32).ravel() for p, _ in leaves_c
        if "ground" not in jax.tree_util.keystr(p).lower()
    ])
    cos = float(vc @ vf / (np.linalg.norm(vc) * np.linalg.norm(vf) + 1e-12))
    assert cos > 0.7, f"compact/full gradient cosine {cos}"


def test_compact_train_trainer_wiring(tmp_path):
    """The tpu.compact_train config knob reaches the global flag."""
    from vitxtgqa_tpu.models.common import (
        compact_train_enabled,
        set_compact_train,
    )

    set_compact_train(True)
    assert compact_train_enabled()
    set_compact_train(False)
    assert not compact_train_enabled()
