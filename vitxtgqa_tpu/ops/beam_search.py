"""Jit-able beam-search decoding over a cached step function.

(reference: pythia/utils/text_utils.py:190-295 ships an eager BeamSearch —
unused by the videoqa path; this is the static-shape lax.scan counterpart
usable with the KV-cached decode harness.)

The step function contract matches JointQAModel's cached decode step:
  step_fn(tokens [B], state, t) -> (logits [B, V], state)
State must be a pytree of arrays with leading batch dim B = batch * beams
(the harness tiles its caches accordingly).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

NEG = -1e9


def beam_search(
    step_fn: Callable,
    init_state: Any,
    batch: int,
    num_beams: int,
    bos_id: int,
    eos_id: int,
    max_len: int,
    length_penalty: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens [batch, num_beams, max_len] sorted best-first,
    scores [batch, num_beams])."""

    bb = batch * num_beams

    def body(carry, t):
        tokens, scores, finished, state = carry
        cur = jax.lax.dynamic_index_in_dim(tokens, t, axis=2, keepdims=False)
        logits, state = step_fn(cur.reshape(bb), state, t)
        v = logits.shape[-1]
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logprobs = logprobs.reshape(batch, num_beams, v)

        # finished beams only extend with EOS at no cost
        pad_row = jnp.full((v,), NEG).at[eos_id].set(0.0)
        logprobs = jnp.where(finished[:, :, None], pad_row[None, None, :], logprobs)

        cand = scores[:, :, None] + logprobs  # [batch, beams, V]
        flat = cand.reshape(batch, num_beams * v)
        top_scores, top_idx = jax.lax.top_k(flat, num_beams)
        beam_idx = top_idx // v  # which parent beam
        tok_idx = top_idx % v

        # reorder histories by parent beam and append the new token
        tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, tok_idx.astype(tokens.dtype), t + 1, axis=2
        )
        finished = jnp.take_along_axis(finished, beam_idx, axis=1) | (
            tok_idx == eos_id
        )
        # reorder cached state along the folded (batch*beams) dim
        gather = (
            jnp.arange(batch)[:, None] * num_beams + beam_idx
        ).reshape(bb)
        state = jax.tree_util.tree_map(lambda x: x[gather], state)
        return (tokens, top_scores, finished, state), None

    tokens0 = jnp.full((batch, num_beams, max_len + 1), bos_id, jnp.int32)
    # only beam 0 starts alive so the first expansion is unbiased
    scores0 = jnp.where(
        jnp.arange(num_beams)[None, :] == 0, 0.0, NEG
    ).repeat(batch, axis=0).reshape(batch, num_beams)
    finished0 = jnp.zeros((batch, num_beams), bool)

    (tokens, scores, finished, _), _ = jax.lax.scan(
        body, (tokens0, scores0, finished0, init_state), jnp.arange(max_len)
    )
    if length_penalty:
        lengths = (tokens[:, :, 1:] != eos_id).sum(-1) + 1
        scores = scores / lengths.astype(jnp.float32) ** length_penalty
        order = jnp.argsort(-scores, axis=1)
        tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
        scores = jnp.take_along_axis(scores, order, axis=1)
    return tokens[:, :, 1:], scores
