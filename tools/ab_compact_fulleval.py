"""Same-process hardware A/B: full 3-variant eval path, compact off vs on.

Round-3 full-eval compaction (VERDICT #9): with tpu.compact_serving the
pos variant decodes at the 384-row compact geometry and the teacher-forced
neg pass runs compact too (static bottom-k counts); only the ref variant
keeps the full 1152-row joint sequence.  This measures what that buys on
the 3-variant validation path (exact path baseline: 488-492 videos/s @
batch 576, BENCH_LOCAL_r03.json axis_full_eval).

One process, both eval steps traced with the trace-time flag flipped in
between, interleaved chained blocks fenced once each (tunnel drift makes
separate processes untrustworthy at <10%).  The digest consumes ref, pos
AND neg scores — the ref/neg pass is separable from pos_scores and XLA
dead-code-eliminates any output the digest doesn't reach.

Usage: python tools/ab_compact_fulleval.py   (BENCH_BATCH to override)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "576"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def main():
    import jax
    import jax.numpy as jnp

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

    set_use_pallas(True)
    set_kv_cache_int8(True)

    cfg = build_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "t2s_abinet.yml")
    ).model_attributes.t2s
    num_final = 5050 + 960
    # inference_only=False: the full ref/pos/neg validation path
    model = T2S(config=cfg, num_final_outputs=num_final, bos_idx=2,
                compute_dtype=jnp.bfloat16, inference_only=False)
    batch = synthetic_batch(batch=BATCH, num_final_outputs=num_final, seed=0)
    for key in ("video_feat", "mid_img_feat", "context_feature_0",
                "context_feature_1", "ocr_bbox_coordinates"):
        batch[key] = batch[key].astype(jnp.bfloat16)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(rngs, batch)
    params = variables["params"]
    dev_batch = jax.device_put(batch)

    def make_step(compact: bool):
        set_compact_serving(compact)  # trace-time flag, captured by the jit

        @jax.jit
        def eval_step(params, batch, seed):
            out = model.apply(
                {"params": params}, batch, train=False,
                rngs={"gumbel": jax.random.key(seed)},
            )
            digest = out["pos_scores"].astype(jnp.float32).sum() + out[
                "ground_frame"
            ].sum().astype(jnp.float32)
            for key in ("ref_scores", "neg_scores"):
                digest = digest + out[key].astype(jnp.float32).sum()
            return digest

        t0 = time.perf_counter()
        d = None
        for attempt in range(3):  # remote-compile helper drops connections
            try:
                d = float(eval_step(params, dev_batch, jnp.int32(0)))
                break
            except Exception as e:
                if "UNAVAILABLE" not in str(e) or attempt == 2:
                    raise
                print(f"retrying compile after: {str(e)[:120]}", flush=True)
                time.sleep(60)
        print(f"compact={compact}: compile+first {time.perf_counter()-t0:.1f}s "
              f"digest {d:.1f}", flush=True)
        for w in range(1, 4):
            float(eval_step(params, dev_batch, jnp.int32(w)))
        return eval_step

    step_full = make_step(False)
    step_compact = make_step(True)
    set_compact_serving(False)  # leave the global as it was

    times = {"full": [], "compact": []}
    for rep in range(4):
        for name, step in (("full", step_full), ("compact", step_compact)):
            t0 = time.perf_counter()
            last = None
            for i in range(ITERS):
                last = step(params, dev_batch, jnp.int32(1000 + rep * 50 + i))
            _ = float(last)  # single D2H fence bounds the chained block
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"rep{rep} {name}: {BATCH*ITERS/dt:.1f} videos/s "
                  f"({dt:.3f}s)", flush=True)
    for name, ts in times.items():
        best = BATCH * ITERS / min(ts)
        print(f"{name}: best {best:.1f} videos/s  blocks "
              f"{['%.3f' % t for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
