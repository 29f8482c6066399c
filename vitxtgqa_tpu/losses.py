"""Loss registry (reference: pythia/modules/losses.py:41-385).

Pure jnp functions with the reference semantics:
  * pos_bce_loss — masked BCE-with-logits over the 12-step score matrix,
    normalised by the active-step count (losses.py:323-343)
  * InfoNCE — cosine(ref,pos) vs cosine(ref,neg) logits / tau=0.1, CE to
    index 0 (losses.py:346-385)
  * bce_loss — same as pos_bce_loss on "scores" (losses.py:300-320)

`Losses` aggregates config-declared entries with weights into
{"<type>/<dataset>/<name>": value} like the reference PythiaLoss wrapper
(losses.py:112-173).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from vitxtgqa_tpu.core.registry import registry


def _bce_with_logits(scores, targets):
    """Numerically stable binary cross entropy with logits."""
    return jnp.maximum(scores, 0) - scores * targets + jnp.log1p(
        jnp.exp(-jnp.abs(scores))
    )


def _masked_bce(scores, targets, loss_mask):
    losses = _bce_with_logits(scores.astype(jnp.float32), targets)
    losses = losses * loss_mask[..., None]
    count = jnp.maximum(loss_mask.sum(), 1.0)
    return losses.sum() / count


@registry.register_loss("pos_bce_loss")
def pos_bce_loss(batch, model_output, **_):
    return _masked_bce(
        model_output["pos_scores"], batch["targets"], batch["train_loss_mask"]
    )


@registry.register_loss("bce_loss")
def bce_loss(batch, model_output, **_):
    return _masked_bce(
        model_output["scores"], batch["targets"], batch["train_loss_mask"]
    )


def _cosine(a, b, eps=1e-8):
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


@registry.register_loss("InfoNCE")
def info_nce(batch, model_output, temperature: float = 0.1, **_):
    q = model_output["ref_scores"].astype(jnp.float32)
    pos = model_output["pos_scores"].astype(jnp.float32)
    neg = model_output["neg_scores"].astype(jnp.float32)

    def flat_norm(x):
        x = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
        )  # F.normalize over last dim first (reference: losses.py:367)
        return x.reshape(x.shape[0], -1)

    qf, pf, nf = flat_norm(q), flat_norm(pos), flat_norm(neg)
    logits = jnp.stack([_cosine(qf, pf), _cosine(qf, nf)], axis=1) / temperature
    logprobs = jax.nn.log_softmax(logits, axis=1)
    return -logprobs[:, 0].mean()


@registry.register_loss("logit_bce")
def logit_bce(batch, model_output, **_):
    """BCE-with-logits scaled by the target width — the loss the legacy
    image-VQA models train with (MMF heritage `LogitBinaryCrossEntropy`;
    this fork's losses.py dropped the class but its dataset defaults and
    models still assume logits-space scores, models/pythia.py:277-278)."""
    scores = model_output["scores"].astype(jnp.float32)
    targets = batch["targets"].astype(jnp.float32)
    return _bce_with_logits(scores, targets).mean() * targets.shape[1]


@registry.register_loss("bce")
def bce(batch, model_output, **_):
    """Plain BCE on probability scores, scaled by the target width.

    Reference: losses.py:176-197 (`binary_cross_entropy` on probabilities,
    mean reduction, multiplied by ``targets.size(1)``).
    """
    scores = model_output["scores"].astype(jnp.float32)
    targets = batch["targets"].astype(jnp.float32)
    eps = 1e-12
    losses = -(targets * jnp.log(jnp.maximum(scores, eps))
               + (1.0 - targets) * jnp.log(jnp.maximum(1.0 - scores, eps)))
    return losses.mean() * targets.shape[1]


def _kl_div(log_x, y):
    """sum_j y * (log y - log_x) with 0*log0 := 0 (reference: losses.py:199-207)."""
    log_y = jnp.where(y == 0, 0.0, jnp.log(jnp.where(y == 0, 1.0, y)))
    return jnp.sum(y * (log_y - log_x), axis=1, keepdims=True)


@registry.register_loss("bce_kl_combined")
def bce_kl_combined(batch, model_output, weight_softmax: float = 1.0, **_):
    """weight_softmax * KL(target_norm || softmax(pred)) + width-scaled BCE.

    Reference: losses.py:270-297 (`CombinedLoss`): targets normalised to a
    distribution (zero-sum rows get 1e-6 denominators), KL against
    log_softmax over dim 1 averaged per-sample, plus BCE-with-logits mean
    times the target width.
    """
    pred = model_output["scores"].astype(jnp.float32)
    target = batch["targets"].astype(jnp.float32)

    tar_sum = jnp.sum(target, axis=1, keepdims=True)
    tar_sum = jnp.where(tar_sum == 0, 1.0e-06, tar_sum)
    tar = target / tar_sum

    res = jax.nn.log_softmax(pred, axis=1)
    loss1 = jnp.sum(_kl_div(res, tar)) / pred.shape[0]

    loss2 = _bce_with_logits(pred, target).mean() * target.shape[1]
    return weight_softmax * loss1 + loss2


@registry.register_loss("multi")
def multi(batch, model_output, params: List[Any] = (), **_):
    """Weighted sum of sub-losses (reference: losses.py:210-266).

    Each entry of ``params`` is a loss config dict ({type, weight, params});
    the sub-loss values are combined into one scalar.
    """
    total = 0.0
    for sub in params:
        name = sub["type"] if isinstance(sub, dict) else sub.type
        weight = (sub.get("weight", 1.0) if isinstance(sub, dict)
                  else getattr(sub, "weight", 1.0))
        sub_params = (sub.get("params", {}) if isinstance(sub, dict)
                      else getattr(sub, "params", {})) or {}
        if not isinstance(sub_params, dict):
            sub_params = dict(sub_params)
        fn = registry._get_class("loss", name)
        total = total + float(weight or 1.0) * fn(batch, model_output, **sub_params)
    return total


class Losses:
    """Config-driven weighted loss collection."""

    def __init__(self, loss_configs: List[Any], dataset_name: str = "vtextgqa"):
        self.entries = []
        for lc in loss_configs:
            name = lc["type"] if isinstance(lc, dict) else lc.type
            weight = float(
                (lc.get("weight", 1.0) if isinstance(lc, dict) else getattr(lc, "weight", 1.0))
                or 1.0
            )
            params = (lc.get("params", {}) if isinstance(lc, dict)
                      else getattr(lc, "params", {})) or {}
            if not isinstance(params, dict):
                try:
                    params = dict(params)
                except TypeError:
                    params = {"params": list(params)}
            fn = registry._get_class("loss", name)
            if params:
                import functools

                fn = functools.partial(fn, **params)
            self.entries.append((name, weight, fn))
        self.dataset_name = dataset_name

    def __call__(self, batch, model_output) -> Dict[str, jax.Array]:
        out = {}
        for name, weight, fn in self.entries:
            out[f"{self.dataset_name}/{name}"] = weight * fn(batch, model_output)
        return out

    def total(self, batch, model_output) -> jax.Array:
        vals = self(batch, model_output)
        return sum(vals.values()), vals
