"""Estimator-preservation probe for in-kernel PRNG dropout
(ops/pallas_block_bwd seed mode, tpu.kernel_dropout) — the
compact_train_check control-arm protocol.

Kernel dropout replaces the threefry-drawn block masks with an in-kernel
PRNG stream: the masks keep the exact Bernoulli(keep) distribution but
come from a DIFFERENT stream, so trained weights will diverge on
held-out noise exactly like a dropout-seed change does.  Three arms from
the same init on the same data (TPU chip, production fused-block config):

  * mask   — threefry masks, dropout stream A
  * mask_b — threefry masks, dropout stream B (the CONTROL: the
             agreement noise floor for any stream change)
  * kd     — in-kernel PRNG masks (stream A's seeds drive the kernel
             PRNG, but the bit-stream is the kernel's own)

PASS = kd-vs-mask token/grounding agreement is indistinguishable from
mask-vs-mask_b (both are pure stream perturbations), and final train
losses match.  Raw agreement numbers without the control are
meaningless on overfit probes (round-4 lesson).

Run on the TPU chip.  Env: KD_STEPS (default 300), KD_TRAIN_BATCH (48),
KD_EVAL_BATCH (288), KD_LOG (50).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("KD_STEPS", "300"))
TRAIN_BATCH = int(os.environ.get("KD_TRAIN_BATCH", "48"))
EVAL_BATCH = int(os.environ.get("KD_EVAL_BATCH", "288"))
LOG = int(os.environ.get("KD_LOG", "50"))


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
        set_fused_block_bwd,
        set_kv_cache_int8,
        set_remat,
    )
    from vitxtgqa_tpu.models.t2s import T2S
    from vitxtgqa_tpu.ops.attention import set_use_pallas
    from vitxtgqa_tpu.ops.pallas_block_bwd import (
        set_block_recompute_fwd,
        set_kernel_dropout,
    )
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch

    set_use_pallas(True)
    set_kv_cache_int8(True)
    set_remat("attn")
    set_fused_block_bwd(True)
    set_block_recompute_fwd(True)

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

    def run_arm(name, kernel_dropout, base_d: int = 11, base_g: int = 12):
        set_kernel_dropout(kernel_dropout)

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
        set_kernel_dropout(False)
        return p, curve, wall

    p_mask, curve_mask, wall_mask = run_arm("mask", False)
    p_ctrl, curve_ctrl, wall_ctrl = run_arm("mask_b", False, 21, 22)
    p_kd, curve_kd, wall_kd = run_arm("kd", True)

    @jax.jit
    def eval_tokens(p, b):
        out = model.apply(
            {"params": p}, b, train=False,
            rngs={"gumbel": jax.random.key(77)},
        )
        return (jnp.argmax(out["pos_scores"], -1), out["ground_frame"])

    tok = {}
    gf = {}
    for name, p in (("mask", p_mask), ("mask_b", p_ctrl), ("kd", p_kd)):
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
        "metric": "kernel_dropout_trajectory",
        "steps": STEPS,
        "train_batch": TRAIN_BATCH,
        "eval_batch": EVAL_BATCH,
        "loss_curve_mask": curve_mask,
        "loss_curve_mask_ctrl": curve_ctrl,
        "loss_curve_kd": curve_kd,
        "final_loss_mask": curve_mask[-1][1],
        "final_loss_mask_ctrl": curve_ctrl[-1][1],
        "final_loss_kd": curve_kd[-1][1],
        "agreement_mask_vs_ctrl": agree("mask", "mask_b"),
        "agreement_mask_vs_kd": agree("mask", "kd"),
        "wall_s_mask": round(wall_mask, 1),
        "wall_s_mask_ctrl": round(wall_ctrl, 1),
        "wall_s_kd": round(wall_kd, 1),
    }))


if __name__ == "__main__":
    main()
