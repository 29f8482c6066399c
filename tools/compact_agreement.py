"""Greedy-decode agreement: full masked serving vs grounding-compacted.

Compact serving (models/common.set_compact_serving) runs the MMT on just
the grounding-kept rows.  Its one semantic deviation vs the reference:
OCR slots outside the kept set get copy score -1e4 instead of the
reference's live raw q.k score (the raw-0/1 ptr-mask quirk, reference
t2s.py:665).  This probe runs the serving decode both ways on the same
batch + gumbel noise and reports:

  * per-step predicted-token agreement (the deviation only matters when
    the full path's argmax picks a non-kept OCR slot);
  * grounding-frame agreement (must be 1.0 — grounding is untouched);
  * with AGREEMENT_KERNEL_CHECK=1, a second compact run with the Pallas
    kernels disabled, reporting the max |score| gap — a hardware parity
    check of the kernel set at the compact 384-row geometry.

Evidence for/against enabling compact_serving in production; validate on
real checkpoints before relying on it (random weights overstate
disagreement — a trained ptr net separates kept/non-kept scores far more
than noise does).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "576"))
KERNEL_CHECK = os.environ.get("AGREEMENT_KERNEL_CHECK", "0") == "1"
# "t2s" (default) or "t2s_wo_sg" — the two models with a compact path
MODEL = os.environ.get("AGREEMENT_MODEL", "t2s")
_VALID_MODELS = ("t2s", "t2s_wo_sg")
if MODEL not in _VALID_MODELS:
    raise SystemExit(
        f"AGREEMENT_MODEL={MODEL!r} is not one of {_VALID_MODELS} — "
        "refusing to silently probe t2s instead"
    )


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/vitxtgqa_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.models.common import (
        set_compact_serving,
        set_kv_cache_int8,
    )
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.ops.attention import set_use_pallas
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    set_kv_cache_int8(True)

    cfg = build_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "t2s_abinet.yml")
    ).model_attributes.t2s
    num_final = 5050 + 960
    if MODEL == "t2s_wo_sg":
        from vitxtgqa_tpu.models.t2s_ablations import (
            T2SWithoutSpatialGrounding as model_cls,
        )
    else:
        model_cls = T2S
    model = model_cls(config=cfg, num_final_outputs=num_final, bos_idx=2,
                      compute_dtype=jnp.bfloat16, inference_only=True)
    batch = synthetic_batch(batch=BATCH, num_final_outputs=num_final, seed=0)
    for key in ("video_feat", "mid_img_feat", "context_feature_0",
                "context_feature_1", "ocr_bbox_coordinates"):
        batch[key] = batch[key].astype(jnp.bfloat16)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    set_use_pallas(True)
    params = jax.jit(lambda r, b: model.init(r, b, train=True))(rngs, batch)[
        "params"
    ]
    # AGREEMENT_TRAIN_STEPS>0: overfit on slices of the same batch first so
    # agreement is measured at PEAKED logits (tools/agreement_common.py)
    from tools.agreement_common import maybe_overfit

    params, weight_state = maybe_overfit(model, params, batch)
    print(f"weights: {weight_state}")
    dev_batch = jax.device_put(batch)

    def run(compact: bool, pallas: bool):
        set_compact_serving(compact)
        set_use_pallas(pallas)

        @jax.jit
        def step(params, batch, seed):
            out = model.apply(
                {"params": params}, batch, train=False,
                rngs={"gumbel": jax.random.key(seed)},
            )
            return (
                out["pos_scores"].astype(jnp.float32),
                out["ground_frame"].astype(jnp.int32),
            )

        s, f = step(params, dev_batch, jnp.int32(7))
        set_compact_serving(False)
        set_use_pallas(True)
        return np.asarray(s), np.asarray(f)

    if MODEL == "t2s_wo_sg":
        # host-side completeness check (ADVICE r2): wo_sg's compact gather
        # list holds the first frame_topk*ocr_frame_num true slots of the
        # frame-expansion mask.  Completeness relies on the dataset
        # invariant that temporal ids are unique per grid frame — each
        # ground id then matches at most ocr_frame_num slots.  A violating
        # input would silently truncate kept rows and diverge beyond the
        # documented -1e4 deviation, so assert it on the probe batch.
        tid = np.asarray(batch["temporal_id"]).reshape(BATCH, 64, -1)
        per_frame = tid[..., 0]
        uniq = np.array([
            len(np.unique(row[row > 0])) == (row > 0).sum()
            for row in per_frame
        ])
        assert uniq.all(), (
            "temporal ids are not unique per grid frame on this batch — "
            "wo_sg compact gather lists may truncate kept OCR rows"
        )

    s_full, f_full = run(compact=False, pallas=True)
    s_comp, f_comp = run(compact=True, pallas=True)

    t_full, t_comp = s_full.argmax(-1), s_comp.argmax(-1)
    tok_agree = float((t_full == t_comp).mean())
    frame_agree = float((f_full == f_comp).mean())
    n_diff = int((t_full != t_comp).any(axis=1).sum())
    print(f"token agreement: {tok_agree:.6f}")
    print(f"grounding frame agreement: {frame_agree:.6f}")
    print(f"videos with any differing token: {n_diff}/{t_full.shape[0]}")

    if KERNEL_CHECK:
        s_xla, _ = run(compact=True, pallas=False)
        t_xla = s_xla.argmax(-1)
        # bf16-kernel vs XLA numeric noise can flip near-tied grounding
        # top-k picks, changing the kept set between the two runs — gap
        # stats are only meaningful where BOTH runs kept the slot (or on
        # the fixed vocab, which has no kept set)
        nv = num_final - 960
        kept_both = (s_comp[..., nv:] > -1e4 + 1) & (s_xla[..., nv:] > -1e4 + 1)
        kept_agree = float(
            ((s_comp[..., nv:] > -1e4 + 1) == (s_xla[..., nv:] > -1e4 + 1))
            .mean()
        )
        gap_fixed = float(np.abs(s_comp[..., :nv] - s_xla[..., :nv]).max())
        gap_kept = float(
            np.abs((s_comp[..., nv:] - s_xla[..., nv:])[kept_both]).max()
        )
        print(
            "kernel parity @ compact geometry: "
            f"token agreement {float((t_comp == t_xla).mean()):.6f}, "
            f"kept-set agreement {kept_agree:.6f}, "
            f"max|gap| fixed-vocab {gap_fixed:.4f} / kept-OCR {gap_kept:.4f}"
        )


if __name__ == "__main__":
    main()
