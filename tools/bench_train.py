"""Training-throughput microbench: T2S full train step (fwd+bwd+adam).

Production dims (batch from BENCH_BATCH, default 48 = the reference's
training batch, configs/t2s_abinet.yml:135), bf16 compute, variant-scan over
the 3 contrastive passes, optional remat.  Prints one JSON line per remat
mode.

Env knobs: BENCH_BATCH, BENCH_ITERS, BENCH_PALLAS (default 1 — attention
dropout runs on the in-kernel PRNG), BENCH_REMAT — a remat mode ("1"/"full",
"dots", "0"/"none") or a comma list for a same-process A/B (e.g.
"1,dots"; interleaving within one process is the only trustworthy
comparison on the tunnel backend — the first few executions of a fresh
process read 10-15% slow).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "48"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
REMAT_MODES = os.environ.get("BENCH_REMAT", "1").split(",")
# BENCH_FUSED_GRADS: "1"/"0" or a comma list for a same-process A/B of the
# dense_mm custom-VJP bias-grad-as-dot (models/common.set_fused_grads)
FUSED_GRADS_MODES = os.environ.get("BENCH_FUSED_GRADS", "0").split(",")
# BENCH_FUSED_BLOCK_BWD: "1"/"0" or a comma list — single-kernel block
# backward (models/common.set_fused_block_bwd, ops/pallas_block_bwd.py)
BLOCK_BWD_MODES = os.environ.get("BENCH_FUSED_BLOCK_BWD", "0").split(",")
# BENCH_FUSED_BLOCK_FWD: "1"/"0" or a comma list — Pallas recompute
# forward for the block fwd rule (ops/pallas_block_bwd.set_block_
# recompute_fwd; only meaningful with fused_block_bwd on)
BLOCK_FWD_MODES = os.environ.get("BENCH_FUSED_BLOCK_FWD", "0").split(",")
# BENCH_KERNEL_DROPOUT: "1"/"0" or a comma list — in-kernel PRNG dropout
# masks for the fused block (ops/pallas_block_bwd.set_kernel_dropout;
# only meaningful with fused_block_bwd on)
KERNEL_DROPOUT_MODES = os.environ.get("BENCH_KERNEL_DROPOUT", "0").split(",")
# BENCH_COMPACT_TRAIN: "1"/"0" or a comma list — experimental compact
# training (models/common.set_compact_train; pos/neg variants on the
# grounding-kept rows, documented estimator deviation)
COMPACT_TRAIN_MODES = os.environ.get("BENCH_COMPACT_TRAIN", "0").split(",")
# BENCH_VARIANT_SCAN=0 folds the 3 contrastive variants into one 3B batch
# instead of scanning them sequentially — ~3x the peak activations, but at
# small batches the fold's better chip utilisation can win
VARIANT_SCAN = os.environ.get("BENCH_VARIANT_SCAN", "1") == "1"


def main():
    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/vitxtgqa_jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.losses import Losses
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.models.common import (
        set_compact_train,
        set_fused_block_bwd,
        set_fused_grads,
        set_remat,
    )
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    if USE_PALLAS:
        from vitxtgqa_tpu.ops.attention import set_use_pallas

        set_use_pallas(True)

    cfg = build_config(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs", "t2s_abinet.yml")
    ).model_attributes.t2s

    num_final = 5050 + 960
    model = T2S(
        config=cfg, num_final_outputs=num_final, bos_idx=2,
        compute_dtype=jnp.bfloat16, train_variant_scan=VARIANT_SCAN,
    )
    batch = synthetic_batch(batch=BATCH, num_final_outputs=num_final, seed=0)

    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(rngs, batch)
    params0 = variables["params"]

    tx = optax.chain(optax.clip_by_global_norm(0.25), optax.adam(1e-4))
    losses = Losses([
        {"type": "pos_bce_loss", "weight": 1.0},
        {"type": "InfoNCE", "weight": 1000},
    ])
    dev_batch = jax.device_put(batch)

    def make_step():
        # fresh jit per remat mode: set_remat is read at trace time
        @jax.jit
        def train_step(params, opt_state, tensors, rng):
            k_d, k_g = jax.random.split(rng)

            def loss_fn(p):
                out = model.apply(
                    {"params": p}, tensors, train=True,
                    rngs={"dropout": k_d, "gumbel": k_g},
                )
                total, _ = losses.total(tensors, out)
                return total

            total, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, total

        return train_step

    # modes run sequentially in ONE process (holding two compiled programs
    # plus two param/opt states resident OOMs the chip); same-process
    # sequential with per-mode warm-up is the next-most-trustworthy A/B
    from vitxtgqa_tpu.ops.pallas_block_bwd import set_block_recompute_fwd

    from vitxtgqa_tpu.ops.pallas_block_bwd import set_kernel_dropout

    mode_list = [
        (m, fg, bb, bf, kd, ct)
        for m in REMAT_MODES
        for fg in FUSED_GRADS_MODES
        for bb in BLOCK_BWD_MODES
        for bf in BLOCK_FWD_MODES
        for kd in KERNEL_DROPOUT_MODES
        for ct in COMPACT_TRAIN_MODES
    ]
    for mode, fg, bb, bf, kd, ct in mode_list:
        set_remat("dots" if mode == "dots" else mode)
        set_fused_grads(fg == "1")
        set_fused_block_bwd(bb == "1")
        set_block_recompute_fwd(bf == "1")
        set_kernel_dropout(kd == "1")
        set_compact_train(ct == "1")
        step = make_step()
        params = params0
        opt_state = tx.init(params)
        rng = jax.random.key(7)
        record = {"remat": mode, "fused_grads": fg == "1",
                  "fused_block_bwd": bb == "1",
                  "fused_block_fwd": bf == "1",
                  "kernel_dropout": kd == "1",
                  "compact_train": ct == "1"}
        try:
            t_c0 = time.perf_counter()
            params, opt_state, total = step(params, opt_state, dev_batch, rng)
            _ = float(total)
            record["first_call_s"] = round(time.perf_counter() - t_c0, 2)
            for w in range(3):  # tunnel warm-up (first execs read slow)
                params, opt_state, total = step(
                    params, opt_state, dev_batch, jax.random.fold_in(rng, w)
                )
                _ = float(total)
            blocks = []
            for block in range(2):
                # chained block fenced once: steps serialize through the
                # params dependence; the tunnel's per-call D2H fence floor
                # (~31 ms) would otherwise tax batch-48 steps ~6%
                t0 = time.perf_counter()
                for i in range(ITERS):
                    params, opt_state, total = step(
                        params, opt_state, dev_batch,
                        jax.random.fold_in(jax.random.key(100 + block), i),
                    )
                _ = float(total)  # single D2H fence bounds the block
                dt = time.perf_counter() - t0
                blocks.append({
                    "videos_per_sec": round(BATCH * ITERS / dt, 2),
                    "block_s": round(dt, 4),
                })
            print(json.dumps({
                "metric": "t2s_train_throughput",
                "value": max(b["videos_per_sec"] for b in blocks),
                "unit": "videos/sec/chip",
                "pallas": USE_PALLAS,
                "batch": BATCH,
                "variant_scan": VARIANT_SCAN,
                "blocks": blocks,
                **record,
            }))
        except Exception as e:  # OOM etc: report, keep the other modes
            record["error"] = f"{type(e).__name__}: {e}"[:300]
            print(json.dumps({"metric": "t2s_train_throughput",
                              "batch": BATCH, **record}))
        finally:
            del step, params, opt_state
            step_cache_clear = getattr(jax, "clear_caches", None)
            if step_cache_clear:
                step_cache_clear()


if __name__ == "__main__":
    main()
