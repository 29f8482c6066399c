"""Optimizer construction: Adam + warmup/step-decay schedule + per-module
learning-rate scaling.

Reference semantics: `lr_lambda_update` (pythia/utils/general.py:20-29) is a
multiplicative factor: linear warmup from `warmup_factor` over
`warmup_iterations`, then `lr_ratio ** (#steps passed)`; `clip_gradients`
clips the global grad norm before the step (general.py:32-53); models return
parameter groups with scaled lr (t2s.py:356-376: text_bert 0.1x, mmt 1.0x).

In optax: chain(clip_by_global_norm, adam(schedule), per-module update
scaling).  Scaling the post-Adam update by s is exactly lr*s because Adam's
direction is lr-independent.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import optax


def lr_multiplier_schedule(
    use_warmup: bool,
    warmup_factor: float,
    warmup_iterations: int,
    lr_steps: Sequence[int],
    lr_ratio: float,
) -> Callable[[int], float]:
    """Reference lr_lambda_update as an optax-compatible schedule of
    multiplicative factors."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step)
        if use_warmup and warmup_iterations > 0:
            alpha = jnp.minimum(step, warmup_iterations) / float(warmup_iterations)
            warm = warmup_factor * (1.0 - alpha) + alpha
        else:
            warm = 1.0
        decay_pow = sum((step >= s).astype("float32") for s in lr_steps) if lr_steps else 0.0
        decayed = lr_ratio ** decay_pow
        return jnp.where(
            jnp.asarray(use_warmup and warmup_iterations > 0)
            & (step < warmup_iterations),
            warm,
            decayed,
        )

    return schedule


def scale_by_module_lr(scales: Dict[str, float]) -> optax.GradientTransformation:
    """Multiply updates of top-level param subtrees by per-module factors
    (reference lr groups: t2s.py:356-376)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale_tree(path_scale, tree):
            return jax.tree_util.tree_map(lambda u: u * path_scale, tree)

        new = dict(updates)
        for key, s in scales.items():
            if key in new and s != 1.0:
                new[key] = scale_tree(s, new[key])
        return type(updates)(new) if not isinstance(updates, dict) else new, state

    return optax.GradientTransformation(init_fn, update_fn)


def module_lr_scales(model_config: Any) -> Dict[str, float]:
    """Map top-level flax param keys to lr scales from model config."""
    scales = {}
    text_scale = getattr(model_config, "lr_scale_text_bert", None)
    if text_scale is not None:
        scales["text_bert"] = float(text_scale)
    mmt_scale = getattr(model_config, "lr_scale_mmt", None)
    if mmt_scale is not None and float(mmt_scale) != 1.0:
        scales["mmt"] = float(mmt_scale)
    return scales


def build_optimizer(
    optimizer_attributes: Any,
    training_parameters: Any,
    model_config: Any = None,
) -> optax.GradientTransformation:
    params = optimizer_attributes.params if hasattr(optimizer_attributes, "params") else {}
    base_lr = float(params.get("lr", 1e-4))
    eps = float(params.get("eps", 1e-8))
    wd = float(params.get("weight_decay", 0.0) or 0.0)
    tp = training_parameters

    mult = lr_multiplier_schedule(
        use_warmup=bool(getattr(tp, "use_warmup", False)),
        warmup_factor=float(getattr(tp, "warmup_factor", 0.2)),
        warmup_iterations=int(getattr(tp, "warmup_iterations", 1000)),
        lr_steps=list(getattr(tp, "lr_steps", []) or [])
        if getattr(tp, "lr_scheduler", False)
        else [],
        lr_ratio=float(getattr(tp, "lr_ratio", 0.1)),
    )
    schedule = lambda step: base_lr * mult(step)

    chain = []
    if getattr(tp, "clip_gradients", False):
        max_norm = getattr(tp, "max_grad_l2_norm", None)
        if max_norm:
            chain.append(optax.clip_by_global_norm(float(max_norm)))
    if wd > 0:
        chain.append(optax.adamw(schedule, eps=eps, weight_decay=wd))
    else:
        chain.append(optax.adam(schedule, eps=eps))
    if model_config is not None:
        scales = module_lr_scales(model_config)
        if scales:
            chain.append(scale_by_module_lr(scales))
    return optax.chain(*chain), schedule
