"""Trajectory probe for EXPERIMENTAL compact training
(models/common.set_compact_train, round-3 verdict stretch #8).

Trains the full-dims T2S twice from the SAME init with the SAME rng
streams — once with the exact 3-variant estimator, once with the
compact pos/neg estimator — on slices of one synthetic production-shape
batch (the agreement_common overfit protocol), then compares:

  * the loss trajectories (recorded every LOG steps, identical data);
  * each arm's final training loss (does compact still optimise?);
  * EXACT-mode eval token + grounding agreement between the two trained
    models on the full batch (do the trajectories land on the same
    behaviour?).

Run on the TPU chip.  Env: CT_STEPS (default 300), CT_TRAIN_BATCH (48),
CT_EVAL_BATCH (288), CT_LOG (50).

One JSON line at the end; paste the numbers into BASELINE.md next to the
compact-train throughput A/B.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("CT_STEPS", "300"))
TRAIN_BATCH = int(os.environ.get("CT_TRAIN_BATCH", "48"))
EVAL_BATCH = int(os.environ.get("CT_EVAL_BATCH", "288"))
LOG = int(os.environ.get("CT_LOG", "50"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/vitxtgqa_jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.losses import info_nce, pos_bce_loss
    from vitxtgqa_tpu.models.common import (
        set_compact_train,
        set_kv_cache_int8,
        set_remat,
    )
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.ops.attention import set_use_pallas
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    set_use_pallas(True)
    set_kv_cache_int8(True)
    set_remat("attn")

    cfg = build_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "t2s_abinet.yml")
    ).model_attributes.t2s
    num_final = 5050 + 960
    model = T2S(config=cfg, num_final_outputs=num_final, bos_idx=2,
                compute_dtype=jnp.bfloat16, train_variant_scan=True)
    batch = synthetic_batch(batch=EVAL_BATCH, num_final_outputs=num_final,
                            seed=0)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(rngs, batch)
    params0 = variables["params"]

    sliced = {k: v[:TRAIN_BATCH] for k, v in batch.items()}
    dev_train = jax.device_put(sliced)
    dev_eval = jax.device_put(batch)
    tx = optax.adam(1e-4)

    def loss_fn(p, b, step):
        out = model.apply(
            {"params": p}, b, train=True,
            rngs={"dropout": jax.random.fold_in(jax.random.key(11), step),
                  "gumbel": jax.random.fold_in(jax.random.key(12), step)},
        )
        return pos_bce_loss(b, out) + 1000.0 * info_nce(b, out)

    def run_arm(compact: bool):
        set_compact_train(compact)

        @jax.jit
        def train_step(p, o, b, step):
            loss, grads = jax.value_and_grad(loss_fn)(p, b, step)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        p = params0
        o = jax.jit(tx.init)(p)
        curve = []
        t0 = time.perf_counter()
        for s in range(STEPS):
            p, o, loss = train_step(p, o, dev_train, jnp.int32(s))
            if s % LOG == 0 or s == STEPS - 1:
                curve.append((s, round(float(loss), 4)))
                print(f"{'compact' if compact else 'full':8s} "
                      f"step {s}: {float(loss):.4f}", file=sys.stderr,
                      flush=True)
        wall = time.perf_counter() - t0
        set_compact_train(False)
        return p, curve, wall

    p_full, curve_full, wall_full = run_arm(False)
    p_comp, curve_comp, wall_comp = run_arm(True)

    # exact-mode eval agreement between the two trained models
    @jax.jit
    def eval_tokens(p, b):
        out = model.apply(
            {"params": p}, b, train=False,
            rngs={"gumbel": jax.random.key(77)},
        )
        return (jnp.argmax(out["pos_scores"], -1), out["ground_frame"])

    tok_f, gf_f = jax.device_get(eval_tokens(p_full, dev_eval))
    tok_c, gf_c = jax.device_get(eval_tokens(p_comp, dev_eval))
    token_agree = float((tok_f == tok_c).mean())
    frame_agree = float(
        (np.sort(gf_f, -1) == np.sort(gf_c, -1)).mean()
    )
    videos_differ = int((tok_f != tok_c).any(-1).sum())

    print(json.dumps({
        "metric": "compact_train_trajectory",
        "steps": STEPS,
        "train_batch": TRAIN_BATCH,
        "eval_batch": EVAL_BATCH,
        "loss_curve_full": curve_full,
        "loss_curve_compact": curve_comp,
        "final_loss_full": curve_full[-1][1],
        "final_loss_compact": curve_comp[-1][1],
        "token_agreement": round(token_agree, 6),
        "grounding_frame_agreement": round(frame_agree, 6),
        "videos_differ": videos_differ,
        "wall_s_full": round(wall_full, 1),
        "wall_s_compact": round(wall_comp, 1),
    }))


if __name__ == "__main__":
    main()
