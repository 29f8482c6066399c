"""Same-process A/B: compact-serving decode epilogue, post-scan scatter
vs legacy in-scan scatter (models/base.set_compact_postscan).

The post-scan form keeps copy scores compact inside the decode scan (the
greedy argmax runs in compact space and maps the winning slot through the
gather list) and runs ONE [B, S, full_n] scatter after the scan instead of
12 per-step fill+scatter+concat passes — the round-4 VERDICT's "compact
fused epilogue" candidate, realised as an XLA-level restructure (the
Pallas fused epilogue only engages at the batch<=2 fused-decode bucket,
not at the compact throughput point).

Arms interleave in one process (tunnel throughput varies ±10% between
sessions; only same-process A/Bs are decision-grade) with a FRESH jit per
arm — tracing both arms through one function object would silently reuse
the first trace (the round-2 lowering-comparison trap).

Env knobs: BENCH_BATCH (default 576), BENCH_ITERS (default 5),
AB_ARMS (default "1,0,0,1" — both orders).  Requires the TPU chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("BENCH_BATCH", "576"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
ARMS = os.environ.get("AB_ARMS", "1,0,0,1").split(",")


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/vitxtgqa_jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.models.base import set_compact_postscan
    from vitxtgqa_tpu.models.common import (
        set_compact_serving,
        set_kv_cache_int8,
    )
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.ops.attention import set_use_pallas
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    set_use_pallas(True)
    set_kv_cache_int8(True)
    set_compact_serving(True)

    cfg = build_config(
        os.path.join(REPO, "configs", "t2s_abinet.yml")
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
    params = jax.jit(lambda r, b: model.init(r, b, train=True))(
        rngs, batch
    )["params"]
    dev_batch = jax.device_put(batch)

    def make_step():
        @jax.jit
        def eval_step(params, batch, seed):
            out = model.apply(
                {"params": params}, batch, train=False,
                rngs={"gumbel": jax.random.key(seed)},
            )
            digest = out["pos_scores"].astype(jnp.float32).sum() + out[
                "ground_frame"
            ].sum().astype(jnp.float32)
            return digest, jnp.argmax(out["pos_scores"], axis=-1)

        return eval_step

    try:
        tokens = {}
        for arm_i, arm in enumerate(ARMS):
            set_compact_postscan(arm == "1")
            step = make_step()
            t_c0 = time.perf_counter()
            d, tok = step(params, dev_batch, jnp.int32(0))
            _ = float(d)
            first_call_s = round(time.perf_counter() - t_c0, 2)
            tokens.setdefault(arm, jax.device_get(tok))
            for w in range(3):
                d, _tok = step(params, dev_batch, jnp.int32(0))
                _ = float(d)
            blocks = []
            for blk in range(2):
                t0 = time.perf_counter()
                last = None
                for i in range(ITERS):
                    last, _tok = step(params, dev_batch, jnp.int32(0))
                _ = float(last)
                dt = time.perf_counter() - t0
                blocks.append(round(BATCH * ITERS / dt, 2))
            print(json.dumps({
                "metric": "compact_serving_throughput",
                "arm": "postscan" if arm == "1" else "inscan",
                "order": arm_i,
                "value": max(blocks),
                "unit": "videos/sec/chip",
                "batch": BATCH,
                "blocks": blocks,
                "first_call_s": first_call_s,
            }), flush=True)
            del step
            jax.clear_caches()
        # token-exactness gate across arms (same gumbel seed both arms)
        import numpy as np

        if "1" in tokens and "0" in tokens:
            agree = float(np.mean(tokens["1"] == tokens["0"]))
            print(json.dumps({"metric": "token_agreement_postscan_vs_inscan",
                              "value": agree}), flush=True)
            assert agree == 1.0, agree
    finally:
        set_compact_postscan(True)
        set_compact_serving(False)


if __name__ == "__main__":
    main()
