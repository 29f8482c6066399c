"""Headline benchmark: T2S eval throughput (videos/sec/chip).

Measures the flagship serving path — full T2S grounded-QA inference (modality
encoders + QTV + grounding + KV-cached 12-step greedy pointer decode) at
production dims (20+64+960 tokens, 768 hidden, batch 192, bfloat16) on the
available accelerator.  Serving runs the single pos variant (predictions are
bit-identical to the reference's triple contrastive pass — tested);
BENCH_FULL_EVAL=1 measures the 3-variant validation path.

vs_baseline compares against an estimated reference throughput of 15
videos/sec on one A100: the reference re-runs the full 1056-token MMT
12 steps x 3 variants per batch (reference: pythia/models/t2s.py:315-354),
~2 TFLOP/video, and eager PyTorch TF32 on A100 sustains roughly 30 TFLOP/s
on this shape mix.  The repo publishes no measured numbers (BASELINE.md), so
this constant is the documented analytic stand-in until the released
checkpoints are re-run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_A100_VIDEOS_PER_SEC = 15.0
# 576 is the measured sweet spot on one v5e with the fused kernel set
# (906 videos/s vs 890 at 384; 768 failed to compile in-session); main()
# halves the batch on OOM
BATCH = int(os.environ.get("BENCH_BATCH", "576"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
# default ON: the flash kernel (in-VMEM mask construction, resident K/V)
# measured 361 videos/s vs 75 on the XLA fused path in the same session
# (4.8x); main() falls back to the XLA path if Mosaic compilation fails
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
# serving path by default (pos variant only — identical predictions, tested);
# BENCH_FULL_EVAL=1 measures the 3-variant validation path instead
FULL_EVAL = os.environ.get("BENCH_FULL_EVAL", "0") == "1"


def _run_once(batch_size: int):
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the tunnelled-TPU compile is minutes-slow;
    # cache hits bring reruns down to seconds
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/vitxtgqa_jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    if USE_PALLAS:
        from vitxtgqa_tpu.ops.attention import set_use_pallas

        set_use_pallas(True)
    # A/B knob for the decode-step kernel alone (rides the pallas gate)
    from vitxtgqa_tpu.ops.attention import set_decode_pallas

    set_decode_pallas(os.environ.get("BENCH_DECODE_KERNEL", "1") == "1")
    # int8 decode KV cache (default on — the recommended serving config):
    # halves decode-loop HBM reads; 942 vs 906 videos/s at batch 576.
    # BENCH_KV_INT8=0 for the exact-bf16 cache (parity runs).
    from vitxtgqa_tpu.models.common import set_kv_cache_int8

    set_kv_cache_int8(os.environ.get("BENCH_KV_INT8", "1") == "1")

    cfg = build_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs", "t2s_abinet.yml")
    ).model_attributes.t2s

    num_final = 5050 + 960
    model = T2S(
        config=cfg, num_final_outputs=num_final, bos_idx=2,
        compute_dtype=jnp.bfloat16, inference_only=not FULL_EVAL,
    )
    batch = synthetic_batch(batch=batch_size, num_final_outputs=num_final, seed=0)

    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=True)
    )(rngs, batch)
    params = variables["params"]

    @jax.jit
    def eval_step(params, batch, seed):
        out = model.apply(
            {"params": params}, batch, train=False,
            rngs={"gumbel": jax.random.key(seed)},
        )
        # scalar digest over every output: timing below forces its D2H, so
        # the device must have finished the whole step (block_until_ready on
        # the experimental tunnel backend is not trusted as a fence)
        digest = out["pos_scores"].astype(jnp.float32).sum() + out[
            "ground_frame"
        ].sum().astype(jnp.float32)
        return digest

    dev_batch = jax.device_put(batch)

    # warmup/compile — several calls: beyond the compile itself, the first
    # ~5 executions of a fresh process measure 10-15% slow on the tunnel
    # backend (allocator/DMA warm-up); timing starts at steady state
    digest = float(eval_step(params, dev_batch, jnp.int32(0)))
    for w in range(1, 5):
        digest = float(eval_step(params, dev_batch, jnp.int32(w)))

    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        float(eval_step(params, dev_batch, jnp.int32(99)))
        jax.profiler.stop_trace()

    t0 = time.perf_counter()
    seed = jnp.int32(1)
    for _ in range(ITERS):
        # chain each call on the previous digest so steps serialize
        d = eval_step(params, dev_batch, seed)
        seed = (d.astype(jnp.int32) % 13) + seed
    _ = float(seed)  # D2H: everything above has completed
    dt = time.perf_counter() - t0

    return batch_size * ITERS / dt


def main():
    global USE_PALLAS
    batch_size = BATCH
    videos_per_sec = None
    last_error = None
    for _ in range(3):
        try:
            videos_per_sec = _run_once(batch_size)
            break
        except Exception as e:  # OOM or kernel failure: degrade gracefully
            last_error = e
            msg = str(e)
            if (
                ("RESOURCE_EXHAUSTED" in msg or "remote_compile" in msg
                 or "INTERNAL" in msg)
                and batch_size > 4
            ):
                batch_size //= 2
                continue
            if USE_PALLAS:
                USE_PALLAS = False
                from vitxtgqa_tpu.ops.attention import set_use_pallas

                set_use_pallas(False)
                continue
            raise
    if videos_per_sec is None:
        raise last_error
    print(json.dumps({
        "metric": "t2s_eval_throughput",
        "value": round(videos_per_sec, 2),
        "unit": "videos/sec/chip",
        "vs_baseline": round(videos_per_sec / REFERENCE_A100_VIDEOS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
