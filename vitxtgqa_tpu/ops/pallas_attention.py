"""Fused attention kernel (Pallas/Mosaic TPU).

Computes softmax(q k^T / sqrt(d) + bias) v per (batch, head, q-block)
without materialising the [B, H, L, L] score tensor in HBM — the score
block lives in VMEM only.  At the framework's sequence length (1056 joint
tokens) full k/v rows for one head fit comfortably in VMEM, so the kernel
is a single-pass row-softmax rather than an online-softmax flash loop.

Supported bias shapes (broadcast over heads):
  [B, 1, 1, L]  key-validity bias (encode path, ops/masks.self_attention_bias)
  [B, 1, L, L]  full prefix-LM bias (train path, ops/masks.prefix_lm_bias)

The wrapper pads L up to a lane-aligned multiple and neutralises padded keys
with -1e9 bias; padded query rows are sliced away.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, bias_rows):
    q = q_ref[0, 0]  # [BQ, D]
    k = k_ref[0, 0]  # [L, D]
    v = v_ref[0, 0]  # [L, D]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, L]
    bias = bias_ref[0, 0]  # [bias_rows, L]
    scores = scores + bias.astype(jnp.float32)  # broadcasts when bias_rows==1
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    weights = jnp.exp(scores)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def fused_attention(q, k, v, bias=None, block_q: int = 128,
                    interpret: bool = False):
    """q [B,H,Lq,D], k/v [B,H,Lk,D], bias [B,1,1,Lk] | [B,1,Lq,Lk] | None."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / (d ** 0.5)

    lq_p = _round_up(lq, block_q)
    lk_p = _round_up(lk, _LANE)
    d_p = _round_up(d, _LANE)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, d_p - d)))

    if bias is None:
        bias = jnp.zeros((b, 1, 1, lk), q.dtype)
    per_row = bias.shape[2] != 1
    # neutralise padded keys
    bias = jnp.pad(
        bias.astype(jnp.float32),
        ((0, 0), (0, 0), (0, lq_p - bias.shape[2] if per_row else 0),
         (0, lk_p - lk)),
        constant_values=-1e9,
    )
    bias_rows = block_q if per_row else 1

    grid = (b, h, lq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, bias_rows=bias_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_p), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, lk_p, d_p), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, lk_p, d_p), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec(
                (1, 1, bias_rows, lk_p),
                (lambda bi, hi, qi: (bi, 0, qi, 0))
                if per_row
                else (lambda bi, hi, qi: (bi, 0, 0, 0)),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_p), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, d_p), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bias)
    return out[:, :, :lq, :d]
