"""Shared bits for the serving-mode agreement probes.

`overfit_params` addresses the "agreement at random weights" asterisk
(BASELINE.md): random-init logits are near-uniform noise, so token-level
agreement numbers say little about trained behaviour.  Training the model
for a few hundred Adam steps on (slices of) the same synthetic
production-shape batch concentrates the logit mass the way a converged
checkpoint does — decoded tokens become confident answer sequences — and
the compact/W8A8 deviations can then be measured against peaked
distributions.  Production shapes are kept on purpose (the e2e fixtures
use a tiny answer vocab and a different num_final, which would change the
geometry the probes characterise).
"""

from __future__ import annotations

import os
import time


def overfit_params(model, params, batch, steps: int, train_batch: int = 48,
                   lr: float = 1e-4):
    """Run `steps` Adam steps of the real training loss (pos_bce +
    1000*InfoNCE, or bce-only if the model emits no contrastive variants)
    on slices of `batch`; returns the trained params."""
    import jax
    import jax.numpy as jnp
    import optax

    from vitxtgqa_tpu.losses import info_nce, pos_bce_loss
    from vitxtgqa_tpu.models.common import set_remat

    n = int(batch["text"].shape[0])
    train_batch = min(train_batch, n)
    sliced = {k: v[:train_batch] for k, v in batch.items()}
    dev_batch = jax.device_put(sliced)

    tx = optax.adam(lr)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, b, step):
        out = model.apply(
            {"params": p}, b, train=True,
            rngs={"dropout": jax.random.fold_in(jax.random.key(11), step),
                  "gumbel": jax.random.fold_in(jax.random.key(12), step)},
        )
        loss = pos_bce_loss(b, out)
        if "ref_scores" in out:
            loss = loss + 1000.0 * info_nce(b, out)
        return loss

    @jax.jit
    def train_step(p, o, b, step):
        loss, grads = jax.value_and_grad(loss_fn)(p, b, step)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    set_remat("attn")
    t0 = time.perf_counter()
    loss0 = lossN = None
    try:
        for i in range(steps):
            params, opt_state, loss = train_step(
                params, opt_state, dev_batch, i
            )
            if i == 0:
                loss0 = float(loss)
            if i % 50 == 0 or i == steps - 1:
                lossN = float(loss)
                print(f"  overfit step {i}: loss {lossN:.3f}", flush=True)
    finally:
        set_remat(False)
    print(
        f"overfit {steps} steps in {time.perf_counter() - t0:.0f}s: "
        f"loss {loss0:.3f} -> {lossN:.3f}", flush=True,
    )
    return params


def maybe_overfit(model, params, batch):
    steps = int(os.environ.get("AGREEMENT_TRAIN_STEPS", "0"))
    if steps <= 0:
        return params, "random-init"
    params = overfit_params(model, params, batch, steps)
    return params, f"overfit-{steps}-steps"
