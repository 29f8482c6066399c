"""Serving cold-start: per-bucket first-call latency, cold vs warm
persistent compile cache.

The serving engine (vitxtgqa_tpu/serving/engine.py) compiles one
executable per batch bucket; production start-up cost is the sum of those
first calls.  The JAX persistent compilation cache turns recompiles into
disk loads, so the interesting table is per-bucket first-call latency
with a COLD cache (fresh dir — true first deployment) and a WARM cache
(second process against the same dir — every later restart).

Usage:
  python tools/bench_coldstart.py --orchestrate   # runs both arms as
      subprocesses against a fresh cache dir; prints one JSON line with
      {"cold": {...}, "warm": {...}} and writes COLDSTART.json
  python tools/bench_coldstart.py                 # one arm in-process
      (cache dir from JAX_COMPILATION_CACHE_DIR)

Env knobs: BENCH_BUCKETS (default "8,48,192,576" — the engine's default
ladder), BENCH_PALLAS / BENCH_KV_INT8 as in bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUCKETS = [
    int(b) for b in os.environ.get("BENCH_BUCKETS", "8,48,192,576").split(",")
]
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
KV_INT8 = os.environ.get("BENCH_KV_INT8", "1") == "1"


def _run_arm(cache, label):
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=cache)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    wall = round(time.perf_counter() - t0, 1)
    if proc.returncode != 0:
        print(proc.stdout[-2000:] + proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"{label} arm failed")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    print(f"{label}: {line}", file=sys.stderr, flush=True)
    return {**json.loads(line), "process_wall_s": wall}


def _median(vals):
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def orchestrate():
    """Cold arm once (the true first-deployment compile), then
    BENCH_WARM_RUNS (default 3) warm processes against the now-populated
    cache with per-bucket MEDIANS — a single tunnel-contention stall (the
    round-4 artifact recorded one 96 s outlier on a 3-5 s disk load)
    can no longer invert the warm<cold headline the artifact certifies."""
    cache = tempfile.mkdtemp(prefix="coldstart_cache_")
    out = {"cold": _run_arm(cache, "cold")}
    n_warm = int(os.environ.get("BENCH_WARM_RUNS", "3"))
    runs = [_run_arm(cache, f"warm{i}") for i in range(n_warm)]
    warm = {
        "init_s": round(_median([r["init_s"] for r in runs]), 2),
        "per_bucket": {
            str(b): {
                k: round(_median(
                    [r["per_bucket"][str(b)][k] for r in runs]), 4)
                for k in ("first_call_s", "steady_call_s")
            }
            for b in BUCKETS
        },
        "runs": runs,
    }
    warm["total_warmup_s"] = round(
        warm["init_s"]
        + sum(v["first_call_s"] for v in warm["per_bucket"].values()), 2
    )
    out["warm"] = warm
    result = {
        "metric": "serving_coldstart",
        "unit": "s",
        "buckets": BUCKETS,
        "pallas": USE_PALLAS,
        "kv_int8": KV_INT8,
        "warm_runs": n_warm,
        "cold": out["cold"],
        "warm": out["warm"],
    }
    with open(os.path.join(REPO, "COLDSTART.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


def one_arm():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.models.common import set_kv_cache_int8
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.ops.attention import set_use_pallas
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    set_use_pallas(USE_PALLAS)
    set_kv_cache_int8(KV_INT8)

    t_start = time.perf_counter()
    cfg = build_config(
        os.path.join(REPO, "configs", "t2s_abinet.yml")
    ).model_attributes.t2s
    num_final = 5050 + 960
    model = T2S(config=cfg, num_final_outputs=num_final, bos_idx=2,
                compute_dtype=jnp.bfloat16, inference_only=True)
    batch0 = synthetic_batch(batch=BUCKETS[0], num_final_outputs=num_final,
                             seed=0)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    params = jax.jit(lambda r, b: model.init(r, b, train=True))(
        rngs, batch0
    )["params"]
    init_s = round(time.perf_counter() - t_start, 2)

    @jax.jit
    def step(params, batch, seed):
        out = model.apply(
            {"params": params}, batch, train=False,
            rngs={"gumbel": jax.random.key(seed)},
        )
        return out["pos_scores"].astype(jnp.float32).sum() + out[
            "ground_frame"
        ].sum().astype(jnp.float32)

    per_bucket = {}
    for b in BUCKETS:
        batch = synthetic_batch(batch=b, num_final_outputs=num_final, seed=0)
        for key in ("video_feat", "mid_img_feat", "context_feature_0",
                    "context_feature_1", "ocr_bbox_coordinates"):
            batch[key] = batch[key].astype(jnp.bfloat16)
        dev = jax.device_put(batch)
        t0 = time.perf_counter()
        float(step(params, dev, jnp.int32(0)))
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(step(params, dev, jnp.int32(1)))
        steady = time.perf_counter() - t0
        per_bucket[str(b)] = {
            "first_call_s": round(first, 2),
            "steady_call_s": round(steady, 4),
        }
        print(f"bucket {b}: {per_bucket[str(b)]}", file=sys.stderr,
              flush=True)

    print(json.dumps({
        "init_s": init_s,
        "per_bucket": per_bucket,
        "total_warmup_s": round(
            init_s + sum(v["first_call_s"] for v in per_bucket.values()), 2
        ),
    }))


if __name__ == "__main__":
    if "--orchestrate" in sys.argv:
        orchestrate()
    else:
        one_arm()
