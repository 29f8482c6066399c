"""Gumbel-softmax and static-shape hard top-k utilities.

jit-safe replacements for the reference's torch idioms: F.gumbel_softmax
with hard straight-through (reference: spatio_temporal_grounding.py:41,89)
and scatter/nonzero-built top-k masks with data-dependent shapes
(reference: spatio_temporal_grounding.py:52-65,102-117) — re-expressed as
jax.lax.top_k + one-hot sums so every shape is static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(rng, logits, tau: float = 1.0, axis: int = -1, hard: bool = True):
    """Straight-through Gumbel-softmax (forward one-hot, soft gradients)."""
    g = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis, keepdims=True)
    y_hard = jnp.zeros_like(y_soft)
    y_hard = jnp.put_along_axis(y_hard, index, 1.0, axis=axis, inplace=False)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def topk_mask(scores, k: int, largest: bool = True, axis: int = -1):
    """0/1 mask of the k best entries along `axis` (ties broken by index)."""
    s = scores if largest else -scores
    if axis != -1 and axis != s.ndim - 1:
        s = jnp.moveaxis(s, axis, -1)
    _, idx = jax.lax.top_k(s, k)
    mask = jnp.sum(
        jax.nn.one_hot(idx, s.shape[-1], dtype=scores.dtype), axis=-2
    )
    if axis != -1 and axis != scores.ndim - 1:
        mask = jnp.moveaxis(mask, -1, axis)
    return jnp.minimum(mask, 1.0)


def topk_indices_sorted(scores, k: int, largest: bool = True):
    """Indices of the k best entries, returned in ascending index order.

    Matches the reference's scatter-mask-then-nonzero pattern
    (spatio_temporal_grounding.py:52-65): nonzero enumerates ascending.
    """
    s = scores if largest else -scores
    _, idx = jax.lax.top_k(s, k)
    return jnp.sort(idx, axis=-1)
