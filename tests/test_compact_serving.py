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


def test_compact_decode_matches_full_on_kept_rows():
    full = _serving_outputs(compact=False)
    comp = _serving_outputs(compact=True)

    ps_full = np.asarray(full["pos_scores"], np.float32)  # [B, S, NV+N]
    ps_comp = np.asarray(comp["pos_scores"], np.float32)
    assert ps_full.shape == ps_comp.shape

    # grounding outputs are untouched by the compact path
    np.testing.assert_array_equal(
        np.asarray(full["ground_frame"]), np.asarray(comp["ground_frame"])
    )

    kept = ps_comp[..., NV:] > -1e4 + 1.0  # [B, S, N]
    n_kept = kept[:, 0, :].sum(axis=-1)
    # exactly ocr_topk per frame are kept, every step the same set
    assert (n_kept == F * 2).all()  # tiny config: ocr_topk=2
    assert (kept == kept[:, :1, :]).all()

    # greedy traces: diverging is only legal via the documented deviation
    # (the full path's argmax picking a never-kept OCR slot)
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

    # where traces agree the prefix is identical, so scores must match:
    # fixed vocab exactly-ish, kept OCR slots too
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
