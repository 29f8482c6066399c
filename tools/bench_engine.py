"""ServingEngine on-chip certification: engine-dispatched throughput vs
direct jit apply, same session, same host->device work (VERDICT round-4
Weak #5 — the engine's grouping/padding/pipelining overhead had only been
tested on CPU; bench.py's headline calls the model directly).

Both arms do the SAME per-step work so the delta isolates the engine:

  * reduced device-side outputs (argmax answer tokens + grounding ids),
    so D2H is ~KBs per group — fetching raw [B, 12, 6010] scores over
    the remote-TPU tunnel would measure the tunnel, not the engine (the
    tools/serve.py lesson);
  * the DIRECT arm re-stacks B host samples and ships them per step —
    the engine can't reuse a resident device batch, so neither arm does;
    the absolute numbers therefore sit below bench.py's resident-batch
    headline (H2D per step is real serving work), and the deliverable is
    the overhead ratio, which the tunnel taxes equally in both arms;
  * the ENGINE arm sustains submission (all samples queued up front) so
    groups fill whole buckets; the group-size histogram in the artifact
    verifies no fragmented dispatches inflated the overhead.

Runs the production flag combos the engine actually serves: exact
(bf16 + int8 KV + flash/decode kernels + fused-decode-under-cap) and
compact (tpu.compact_serving).  Writes ENGINE_CERT.json.

Env knobs: ENGINE_BUCKETS (default "48,576"), ENGINE_ITERS (default 4),
ENGINE_MODES (default "exact,compact"), BENCH_PALLAS / BENCH_KV_INT8
as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUCKETS = [int(b) for b in os.environ.get("ENGINE_BUCKETS", "48,576").split(",")]
ITERS = int(os.environ.get("ENGINE_ITERS", "4"))
MODES = os.environ.get("ENGINE_MODES", "exact,compact").split(",")
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
KV_INT8 = os.environ.get("BENCH_KV_INT8", "1") == "1"


class ReducedModel:
    """Model shim returning production serving outputs (answer token ids +
    grounding) reduced on device — the engine and the direct arm both ship
    KBs, not the raw score tensors, per group."""

    def __init__(self, model):
        self._model = model

    def apply(self, variables, batch, train=False, rngs=None):
        import jax.numpy as jnp

        out = self._model.apply(variables, batch, train=train, rngs=rngs)
        return {
            "tokens": jnp.argmax(out["pos_scores"], axis=-1).astype(jnp.int32),
            "ground_frame": out["ground_frame"],
            "ground_box": out["ground_box"],
        }


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/vitxtgqa_jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
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

    set_use_pallas(USE_PALLAS)
    set_kv_cache_int8(KV_INT8)

    cfg = build_config(
        os.path.join(REPO, "configs", "t2s_abinet.yml")
    ).model_attributes.t2s
    num_final = 5050 + 960
    model = T2S(config=cfg, num_final_outputs=num_final, bos_idx=2,
                compute_dtype=jnp.bfloat16, inference_only=True)
    reduced = ReducedModel(model)

    max_b = max(BUCKETS)
    pool_batch = synthetic_batch(batch=max_b, num_final_outputs=num_final,
                                 seed=0)
    for key in ("video_feat", "mid_img_feat", "context_feature_0",
                "context_feature_1", "ocr_bbox_coordinates"):
        pool_batch[key] = np.asarray(pool_batch[key]).astype(jnp.bfloat16)
    pool = [
        {k: np.asarray(v[i]) for k, v in pool_batch.items()}
        for i in range(max_b)
    ]

    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    small = {k: v[:2] for k, v in pool_batch.items()}
    params = jax.jit(lambda r, b: model.init(r, b, train=True))(
        rngs, small
    )["params"]

    mode_flags = {"exact": False, "compact": True}
    result = {"metric": "engine_overhead", "iters": ITERS,
              "pallas": USE_PALLAS, "kv_int8": KV_INT8, "arms": {}}
    for mode in MODES:
        set_compact_serving(mode_flags[mode])
        base_key = jax.random.key(0)

        def direct_step(params, batch, gid):
            return reduced.apply(
                {"params": params}, batch, train=False,
                rngs={"gumbel": jax.random.fold_in(base_key, gid)},
            )

        jit_direct = jax.jit(direct_step)
        for b in BUCKETS:
            samples = pool[:b]

            def stack(n_pad=0):
                return {
                    key: np.stack([s[key] for s in samples]
                                  + [samples[0][key]] * n_pad)
                    for key in samples[0]
                }

            # warm-up/compile both arms' executables (same jaxpr geometry)
            warm = stack()
            jax.block_until_ready(jit_direct(params, warm, np.int32(-1)))
            for w in range(2):
                jax.block_until_ready(jit_direct(params, warm, np.int32(w)))

            # ---- direct arm: stack + ship + step per iteration ----
            t0 = time.perf_counter()
            outs = []
            for i in range(ITERS):
                outs.append(jit_direct(params, stack(), np.int32(100 + i)))
            toks = jax.device_get([o["tokens"] for o in outs])
            direct_s = time.perf_counter() - t0
            direct_vps = b * ITERS / direct_s

            # ---- engine arm: sustained submission through the engine ----
            group_sizes = []
            eng = ServingEngine(reduced, params, buckets=(b,),
                                max_wait_ms=2000.0)
            # warm the engine's own executable (distinct jit object)
            eng.warmup(samples[0])
            orig_collect = eng._collect_group

            def counting_collect():
                g = orig_collect()
                if g:
                    group_sizes.append(len(g))
                return g

            eng._collect_group = counting_collect
            try:
                t0 = time.perf_counter()
                futs = [eng.submit(s) for _ in range(ITERS) for s in samples]
                rows = [f.result(timeout=600) for f in futs]
                engine_s = time.perf_counter() - t0
            finally:
                eng.stop()
            engine_vps = b * ITERS / engine_s
            # correctness spot-check: engine rows match the direct arm's
            # first group tokens (same gumbel group id 0 vs direct id 100:
            # compare shapes + dtype only; value parity is covered by the
            # CPU engine tests)
            assert rows[0]["tokens"].shape == toks[0][0].shape

            arm = {
                "direct_videos_per_sec": round(direct_vps, 2),
                "engine_videos_per_sec": round(engine_vps, 2),
                "overhead_pct": round(
                    100.0 * (direct_vps - engine_vps) / direct_vps, 2),
                "direct_s": round(direct_s, 3),
                "engine_s": round(engine_s, 3),
                "group_sizes": group_sizes,
                "full_groups": all(g == b for g in group_sizes),
            }
            result["arms"][f"{mode}_b{b}"] = arm
            print(f"{mode} bucket {b}: {arm}", file=sys.stderr, flush=True)
    set_compact_serving(False)

    with open(os.path.join(REPO, "ENGINE_CERT.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
