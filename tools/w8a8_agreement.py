"""Greedy-decode token agreement: bf16 fused blocks vs W8A8 int8 blocks.

Runs the serving decode on the same synthetic batch under both modes and
reports the fraction of identical predicted tokens (argmax over the
fixed+OCR score vector, per decode step) and identical grounding frames.
Evidence for/against defaulting w8a8 on; real-checkpoint validation still
required for production claims (no released weights in this image).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "576"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/vitxtgqa_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.models.common import set_kv_cache_int8
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.ops.attention import set_use_pallas, set_w8a8
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    set_use_pallas(True)
    set_kv_cache_int8(True)

    cfg = build_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "t2s_abinet.yml")
    ).model_attributes.t2s
    num_final = 5050 + 960
    model = T2S(config=cfg, num_final_outputs=num_final, bos_idx=2,
                compute_dtype=jnp.bfloat16, inference_only=True)
    batch = synthetic_batch(batch=BATCH, num_final_outputs=num_final, seed=0)
    for key in ("video_feat", "mid_img_feat", "context_feature_0",
                "context_feature_1", "ocr_bbox_coordinates"):
        batch[key] = batch[key].astype(jnp.bfloat16)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    params = jax.jit(lambda r, b: model.init(r, b, train=True))(rngs, batch)[
        "params"
    ]
    from tools.agreement_common import maybe_overfit

    params, weight_state = maybe_overfit(model, params, batch)
    print(f"weights: {weight_state}")
    dev_batch = jax.device_put(batch)

    def make_step(w8a8: bool):
        set_w8a8(w8a8)

        @jax.jit
        def step(params, batch, seed):
            out = model.apply(
                {"params": params}, batch, train=False,
                rngs={"gumbel": jax.random.key(seed)},
            )
            return (
                jnp.argmax(out["pos_scores"], axis=-1).astype(jnp.int32),
                out["ground_frame"].astype(jnp.int32),
            )

        return step

    toks = {}
    frames = {}
    for name, flag in (("bf16", False), ("w8a8", True)):
        step = make_step(flag)
        t, f = step(params, dev_batch, jnp.int32(7))
        toks[name] = np.asarray(t)
        frames[name] = np.asarray(f)
        print(f"{name}: tokens {toks[name].shape} frames {frames[name].shape}",
              flush=True)
    set_w8a8(False)

    tok_agree = float((toks["bf16"] == toks["w8a8"]).mean())
    frame_agree = float((frames["bf16"] == frames["w8a8"]).mean())
    n_diff_rows = int(
        (toks["bf16"] != toks["w8a8"]).any(axis=tuple(range(1, toks["bf16"].ndim))).sum()
    )
    print(f"token agreement: {tok_agree:.6f}")
    print(f"grounding frame agreement: {frame_agree:.6f}")
    print(f"videos with any differing token: {n_diff_rows}/{toks['bf16'].shape[0]}")


if __name__ == "__main__":
    main()
