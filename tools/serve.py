"""Serving-engine demo: dynamic-batching T2S inference on synthetic requests.

Stands up vitxtgqa_tpu.serving.engine.ServingEngine around the production
T2S serving model, fires SERVE_REQUESTS requests from SERVE_CLIENTS
threads at SERVE_RPS per client, and prints one JSON line with latency
percentiles and the group-size histogram — the request-level counterpart
of bench.py's saturated-throughput number.

Env knobs: SERVE_BUCKETS (default "8,48"), SERVE_WAIT_MS (default 5),
SERVE_CLIENTS (default 8), SERVE_REQUESTS (default 96 total),
SERVE_RPS (per-client, default 50), BENCH_PALLAS / BENCH_KV_INT8 /
BENCH_COMPACT as in bench.py.

CAVEAT on this image: the TPU sits behind a remote tunnel, so every
group pays an RPC + tens-of-MB feature H2D per step call — the demo's
absolute latencies (p50 ~850 ms) measure the tunnel, not the engine
(the same batch-48 step with a resident batch is ~57 ms wall,
tools/bench_latency.py).  On a locally attached chip H2D rides PCIe/
links at GB/s and the batching window dominates as intended.  The
engine-vs-direct overhead question is settled by tools/bench_engine.py
(ENGINE_CERT.json, round 5): with identical per-step H2D work the
engine is FASTER than a direct loop on every production arm (-2% to
-31%) — its dispatch thread overlaps group n+1's H2D with group n's
compute.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = [int(b) for b in os.environ.get("SERVE_BUCKETS", "8,48").split(",")]
WAIT_MS = float(os.environ.get("SERVE_WAIT_MS", "5"))
CLIENTS = int(os.environ.get("SERVE_CLIENTS", "8"))
REQUESTS = int(os.environ.get("SERVE_REQUESTS", "96"))
RPS = float(os.environ.get("SERVE_RPS", "50"))


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
    from vitxtgqa_tpu.serving.engine import ServingEngine
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    set_use_pallas(os.environ.get("BENCH_PALLAS", "1") == "1")
    set_kv_cache_int8(os.environ.get("BENCH_KV_INT8", "1") == "1")
    set_compact_serving(os.environ.get("BENCH_COMPACT", "0") == "1")

    cfg = build_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "t2s_abinet.yml")
    ).model_attributes.t2s
    num_final = 5050 + 960
    model = T2S(config=cfg, num_final_outputs=num_final, bos_idx=2,
                compute_dtype=jnp.bfloat16, inference_only=True)
    pool = synthetic_batch(batch=16, num_final_outputs=num_final, seed=0)
    for key in ("video_feat", "mid_img_feat", "context_feature_0",
                "context_feature_1", "ocr_bbox_coordinates"):
        pool[key] = np.asarray(pool[key]).astype(jnp.bfloat16)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    t0 = time.time()
    params = jax.jit(lambda r, b: model.init(r, b, train=True))(rngs, pool)[
        "params"
    ]
    samples = [{k: np.asarray(v)[i] for k, v in pool.items()} for i in range(16)]

    engine = ServingEngine(model, params, buckets=BUCKETS, max_wait_ms=WAIT_MS)
    engine.warmup(samples[0])
    warm_s = time.time() - t0

    latencies = []
    lock = threading.Lock()
    per_client = REQUESTS // CLIENTS

    def client(ci: int):
        rng = np.random.default_rng(ci)
        for _ in range(per_client):
            s = samples[rng.integers(0, len(samples))]
            t = time.monotonic()
            engine.submit(s).result(timeout=600)
            dt = (time.monotonic() - t) * 1000
            with lock:
                latencies.append(dt)
            time.sleep(max(0.0, rng.exponential(1.0 / RPS)))

    t1 = time.time()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t1
    engine.stop()

    lat = np.sort(np.asarray(latencies))
    print(json.dumps({
        "metric": "t2s_serving_engine_demo",
        "requests": len(lat),
        "clients": CLIENTS,
        "buckets": BUCKETS,
        "wait_ms": WAIT_MS,
        "warmup_s": round(warm_s, 2),
        "throughput_rps": round(len(lat) / wall, 2),
        "latency_ms": {
            "p50": round(float(lat[len(lat) // 2]), 2),
            "p90": round(float(lat[int(len(lat) * 0.9)]), 2),
            "p99": round(float(lat[min(len(lat) - 1, int(len(lat) * 0.99))]), 2),
        },
        "groups": engine._group_counter,
    }))


if __name__ == "__main__":
    main()
