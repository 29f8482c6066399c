"""Same-process hardware A/B: per-layer decode kernels vs the single-kernel
fused decode step (ops/pallas_decode_step, round-3 VERDICT #6).

For each batch size: trace the serving step with set_fused_decode flipped
between traces, check greedy-token agreement once, then interleave fenced
single calls (small batches are latency-bound — the fence IS part of the
serving story there) AND a chained block fenced once (the saturated-
serving number).  Tunnel drift makes separate processes untrustworthy.

Usage: python tools/ab_fused_decode.py
Env: AB_BATCHES (default "1,8,48,576"), AB_REPS (default 12).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = [int(b) for b in os.environ.get("AB_BATCHES", "1,8,48,576").split(",")]
REPS = int(os.environ.get("AB_REPS", "12"))
CHAIN = int(os.environ.get("AB_CHAIN", "5"))


def _pct(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, max(0, int(round(q * (len(xs) - 1)))))]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/vitxtgqa_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.models.common import (
        set_fused_decode,
        set_fused_decode_max_batch,
        set_kv_cache_int8,
    )

    # the A/B must measure the fused path at EVERY batch — lift the
    # production batch cap for this process
    set_fused_decode_max_batch(1 << 30)
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.ops.attention import set_use_pallas
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

    # fence-floor calibration
    trivial = jax.jit(lambda x: x * 2.0 + 1.0)
    z = jnp.float32(3.0)
    float(trivial(z))
    floor = _pct(
        [
            (lambda t0: (float(trivial(z)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            ) * 1e3
            for _ in range(15)
        ],
        0.5,
    )
    print(f"fence floor ~{floor:.1f} ms", flush=True)

    for bs in BATCHES:
        batch = synthetic_batch(batch=bs, num_final_outputs=num_final, seed=0)
        for key in ("video_feat", "mid_img_feat", "context_feature_0",
                    "context_feature_1", "ocr_bbox_coordinates"):
            batch[key] = batch[key].astype(jnp.bfloat16)
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "gumbel": jax.random.key(2)}
        params = jax.jit(lambda r, b: model.init(r, b, train=True))(
            rngs, batch
        )["params"]
        dev_batch = jax.device_put(batch)

        def make(fused: bool):
            set_fused_decode(fused)

            @jax.jit
            def step(params, batch, seed):
                out = model.apply(
                    {"params": params}, batch, train=False,
                    rngs={"gumbel": jax.random.key(seed)},
                )
                return (
                    out["pos_scores"].astype(jnp.float32).sum()
                    + out["ground_frame"].sum().astype(jnp.float32)
                )

            @jax.jit
            def tokens(params, batch, seed):
                out = model.apply(
                    {"params": params}, batch, train=False,
                    rngs={"gumbel": jax.random.key(seed)},
                )
                return jnp.argmax(out["pos_scores"], axis=-1)

            t0 = time.perf_counter()
            for attempt in range(3):
                try:
                    float(step(params, dev_batch, jnp.int32(0)))
                    break
                except Exception as e:
                    if "UNAVAILABLE" not in str(e) or attempt == 2:
                        raise
                    print(f"retry compile: {str(e)[:100]}", flush=True)
                    time.sleep(60)
            print(f"batch {bs} fused={fused}: compile+first "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            for w in range(1, 4):
                float(step(params, dev_batch, jnp.int32(w)))
            return step, tokens

        step_base, tok_base = make(False)
        step_fused, tok_fused = make(True)
        set_fused_decode(True)

        tb = np.asarray(tok_base(params, dev_batch, jnp.int32(42)))
        tf = np.asarray(tok_fused(params, dev_batch, jnp.int32(42)))
        agree = float((tb == tf).mean())
        print(f"batch {bs}: token agreement {agree:.6f} "
              f"({int((tb != tf).any(axis=1).sum())}/{bs} videos differ)",
              flush=True)

        lat = {"base": [], "fused": []}
        for i in range(REPS):
            for name, step in (("base", step_base), ("fused", step_fused)):
                t0 = time.perf_counter()
                float(step(params, dev_batch, jnp.int32(100 + i)))
                lat[name].append((time.perf_counter() - t0) * 1e3)
        chain = {"base": [], "fused": []}
        for rep in range(3):
            for name, step in (("base", step_base), ("fused", step_fused)):
                t0 = time.perf_counter()
                last = None
                for i in range(CHAIN):
                    last = step(params, dev_batch, jnp.int32(500 + rep * 9 + i))
                _ = float(last)
                chain[name].append(time.perf_counter() - t0)
        for name in ("base", "fused"):
            p50 = _pct(lat[name], 0.5)
            best_chain = min(chain[name])
            print(
                f"batch {bs} {name}: p50 {p50:.2f} ms "
                f"(device ~{p50 - floor:.2f}), chained "
                f"{bs * CHAIN / best_chain:.1f} videos/s "
                f"({best_chain:.3f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
