"""Headline benchmark: T2S eval throughput (videos/sec/chip).

Measures the flagship serving path — full T2S grounded-QA inference (modality
encoders + QTV + grounding + triple-variant KV-cached 12-step greedy decode)
at production dims (20+64+960 tokens, 768 hidden, batch 48, bfloat16 compute)
on the available accelerator.

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
BATCH = int(os.environ.get("BENCH_BATCH", "48"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    cfg = build_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "configs", "t2s_abinet.yml")
    ).model_attributes.t2s

    num_final = 5050 + 960
    model = T2S(
        config=cfg, num_final_outputs=num_final, bos_idx=2,
        compute_dtype=jnp.bfloat16,
    )
    batch = synthetic_batch(batch=BATCH, num_final_outputs=num_final, seed=0)

    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    params = variables["params"]

    @jax.jit
    def eval_step(params, batch, key):
        return model.apply(
            {"params": params}, batch, train=False, rngs={"gumbel": key}
        )

    dev_batch = jax.device_put(batch)
    key = jax.random.key(3)

    # warmup/compile
    out = eval_step(params, dev_batch, key)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = eval_step(params, dev_batch, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    videos_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "t2s_eval_throughput",
        "value": round(videos_per_sec, 2),
        "unit": "videos/sec/chip",
        "vs_baseline": round(videos_per_sec / REFERENCE_A100_VIDEOS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
