"""Trajectory probe for EXPERIMENTAL compact training
(models/common.set_compact_train, round-3 verdict stretch #8).

Trains the full-dims T2S twice from the SAME init with the SAME rng
streams — once with the exact 3-variant estimator, once with the
compact pos/neg estimator — on slices of one synthetic production-shape
batch (the agreement_common overfit protocol), then compares:

  * the loss trajectories (recorded every LOG steps, identical data);
  * each arm's final training loss (does compact still optimise?);
  * EXACT-mode eval token + grounding agreement between the trained
    models, reported separately on the TRAIN slice (memorised rows —
    both arms should land on the targets) and the HELD-OUT rows
    (arbitrary on synthetic data), and CONTROLLED by a third arm: the
    full estimator trained with a different rng stream.  The comparison
    that matters is full-vs-compact against the full-vs-full' noise
    floor — any estimator perturbation diverges overfit trajectories on
    held-out noise, so the raw agreement number alone is meaningless.

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
# "stopgrad" (default) or "live" — gradient through the ref fill
FILL = os.environ.get("CT_FILL", "stopgrad")


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

    def loss_fn_seeded(p, b, step, base_d, base_g):
        out = model.apply(
            {"params": p}, b, train=True,
            rngs={"dropout": jax.random.fold_in(jax.random.key(base_d), step),
                  "gumbel": jax.random.fold_in(jax.random.key(base_g), step)},
        )
        return pos_bce_loss(b, out) + 1000.0 * info_nce(b, out)

    def run_arm(name, compact, base_d: int = 11, base_g: int = 12):
        set_compact_train(compact)

        @jax.jit
        def train_step(p, o, b, step):
            loss, grads = jax.value_and_grad(
                lambda p_, b_, s_: loss_fn_seeded(p_, b_, s_, base_d, base_g)
            )(p, b, step)
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
                print(f"{name:8s} step {s}: {float(loss):.4f}",
                      file=sys.stderr, flush=True)
        wall = time.perf_counter() - t0
        set_compact_train(False)
        return p, curve, wall

    p_full, curve_full, wall_full = run_arm("full", False)
    # control arm: same estimator, different rng stream — the trajectory
    # noise floor for all agreement numbers below
    p_ctrl, curve_ctrl, wall_ctrl = run_arm("full_b", False, 21, 22)
    compact_mode = "live" if FILL == "live" else True
    p_comp, curve_comp, wall_comp = run_arm("compact", compact_mode)

    @jax.jit
    def eval_tokens(p, b):
        out = model.apply(
            {"params": p}, b, train=False,
            rngs={"gumbel": jax.random.key(77)},
        )
        return (jnp.argmax(out["pos_scores"], -1), out["ground_frame"])

    tok = {}
    gf = {}
    for name, p in (("full", p_full), ("full_b", p_ctrl),
                    ("compact", p_comp)):
        t, g = jax.device_get(eval_tokens(p, dev_eval))
        tok[name], gf[name] = np.asarray(t), np.asarray(g)

    def agree(a, b):
        rows = {
            "train_rows": slice(0, TRAIN_BATCH),
            "heldout_rows": slice(TRAIN_BATCH, None),
        }
        out = {}
        for part, sl in rows.items():
            out[part] = {
                "token": round(float((tok[a][sl] == tok[b][sl]).mean()), 6),
                "frame": round(float(
                    (np.sort(gf[a][sl], -1) == np.sort(gf[b][sl], -1)).mean()
                ), 6),
            }
        return out

    print(json.dumps({
        "metric": "compact_train_trajectory",
        "fill": FILL,
        "steps": STEPS,
        "train_batch": TRAIN_BATCH,
        "eval_batch": EVAL_BATCH,
        "loss_curve_full": curve_full,
        "loss_curve_full_ctrl": curve_ctrl,
        "loss_curve_compact": curve_comp,
        "final_loss_full": curve_full[-1][1],
        "final_loss_full_ctrl": curve_ctrl[-1][1],
        "final_loss_compact": curve_comp[-1][1],
        "agreement_full_vs_ctrl": agree("full", "full_b"),
        "agreement_full_vs_compact": agree("full", "compact"),
        "wall_s_full": round(wall_full, 1),
        "wall_s_full_ctrl": round(wall_ctrl, 1),
        "wall_s_compact": round(wall_comp, 1),
    }))


if __name__ == "__main__":
    main()
