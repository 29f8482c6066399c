"""Fused attention kernels (Pallas/Mosaic TPU).

Two entry points:

``flash_attention(q, k, v, key_mask, dec_len)`` — the production kernel.
  Computes softmax(q k^T / sqrt(d) + bias) v per (batch, head, q-block)
  with the *bias computed inside the kernel* from a compact [B, L] key-
  validity vector plus a static trailing-causal block length (the joint
  prefix-LM + decoder structure of ops/masks.prefix_lm_bias).  Nothing
  [L, L]-shaped ever touches HBM: scores, mask, and probabilities live in
  VMEM only.  K/V for one (batch, head) are fetched once and stay resident
  across the q-block loop (grid iterates q fastest with a constant K/V
  index map).

``fused_attention(q, k, v, bias)`` — the earlier bias-tensor variant, kept
  for comparison/benchmarks; it streams a [B,1,{1,L},L] bias from HBM.

Performance notes (v5e, B=4, H=12, L=1044, D=64, bf16):
  * XLA's fused lowering (jax.nn.dot_product_attention): 6.4 ms/call
  * fused_attention (bias tensor, D padded, per-q-block K/V): 79 ms/call
  * flash_attention: see bench (BENCH_PALLAS=1) — removes the two known
    bottlenecks of fused_attention: the 12x re-streamed [L, L] bias rows
    and the tiny per-step grid work.

Reference behaviour being replaced: eager [B, H, L, L] score tensors with
additive -10000 masks (reference: pythia/models/t2s.py:600-633).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# flash kernel: in-VMEM mask construction
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale,
                  block_q, l_total, dec_len):
    """One (b, h, q-block) step; K/V blocks cover the full key range."""
    q = q_ref[0, 0]  # [BQ, Dp]
    k = k_ref[0, 0]  # [Lp, Dp]
    v = v_ref[0, 0]  # [Lp, Dp]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, Lp] fp32

    bq, lp = scores.shape
    key_ok = mask_ref[0, 0:1, :] > 0  # [1, Lp] valid encoder keys
    if dec_len > 0:
        l_enc = l_total - dec_len
        qi = pl.program_id(2)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, lp), 0) + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, lp), 1)
        dec_k = jnp.logical_and(cols >= l_enc, cols < l_total)
        causal = jnp.logical_and(
            jnp.logical_and(dec_k, rows >= l_enc), cols - l_enc <= rows - l_enc
        )
        allowed = jnp.logical_or(key_ok, causal)
    else:
        allowed = jnp.broadcast_to(key_ok, (bq, lp))

    scores = jnp.where(allowed, scores, _NEG)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    weights = jnp.exp(scores)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dec_len", "block_q", "interpret")
)
def flash_attention(q, k, v, key_mask, dec_len: int = 0, block_q: int = 0,
                    interpret: bool = False):
    """q/k/v [B,H,L,D]; key_mask [B,L] (1 = valid encoder key, decoder and
    padding slots 0); dec_len = static trailing causal block length.

    Semantics match mha(q, k, v, prefix_lm_bias(enc_mask, dec_len)) where
    key_mask = [enc_mask, zeros(dec_len)] — see ops/masks.MaskSpec.

    Differentiable: the backward pass recomputes scores/probabilities with
    XLA einsums (standard softmax-attention gradients) — the forward stays
    on the Pallas kernel.
    """
    return _flash_vjp(dec_len, block_q, interpret, q, k, v, key_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash_vjp(dec_len, block_q, interpret, q, k, v, key_mask):
    return _flash_impl(q, k, v, key_mask, dec_len, block_q, interpret)


def _allowed_mask(key_mask, dec_len: int):
    """[B, L] key validity + static causal block -> [B, 1, L, L] bool."""
    b, l = key_mask.shape
    allowed = (key_mask > 0)[:, None, None, :]
    if dec_len > 0:
        l_enc = l - dec_len
        rows = jnp.arange(l)[:, None]
        cols = jnp.arange(l)[None, :]
        causal = (cols >= l_enc) & (rows >= l_enc) & (cols <= rows)
        allowed = allowed | causal[None, None]
    return allowed


def _flash_fwd(dec_len, block_q, interpret, q, k, v, key_mask):
    out = _flash_impl(q, k, v, key_mask, dec_len, block_q, interpret)
    return out, (q, k, v, key_mask)


def _flash_bwd(dec_len, block_q, interpret, res, g):
    q, k, v, key_mask = res
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(_allowed_mask(key_mask, dec_len), scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)

    g32 = g.astype(jnp.float32)
    dv = jnp.einsum(
        "bhqk,bhqd->bhkd", probs, g32, preferred_element_type=jnp.float32
    )
    dp = jnp.einsum(
        "bhqd,bhkd->bhqk", g32, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jnp.einsum(
        "bhqk,bhkd->bhqd", ds, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jnp.einsum(
        "bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        jnp.zeros_like(key_mask),
    )


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)


def _flash_impl(q, k, v, key_mask, dec_len: int = 0, block_q: int = 0,
                interpret: bool = False):
    b, h, l, d = q.shape
    scale = 1.0 / (d ** 0.5)

    l_p = _round_up(l, _LANE)
    d_p = _round_up(d, _LANE)
    if block_q <= 0:
        # full-sequence q-blocks measured fastest at the framework's 1056
        # joint tokens (fp32 scores 5.3MB in VMEM); cap to bound VMEM for
        # longer sequences
        block_q = min(l_p, 1280)
    block_q = min(block_q, l_p)
    lq_p = _round_up(l_p, block_q)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - l), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, l_p - l), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, l_p - l), (0, d_p - d)))
    # [B, 1, Lp]: a (1, 1, Lp) block's sublane dim equals the array dim,
    # which Mosaic accepts (a (1, Lp) block on [B, Lp] does not)
    maskp = jnp.pad(
        key_mask.astype(jnp.float32), ((0, 0), (0, l_p - l))
    )[:, None, :]

    grid = (b, h, lq_p // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_q=block_q, l_total=l,
            dec_len=dec_len,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_p), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, l_p, d_p), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, l_p, d_p), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, l_p), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_p), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, d_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * l_p * d_p,
            bytes_accessed=(
                b * h * (2 * lq_p * d_p + 2 * l_p * d_p) * q.dtype.itemsize
            ),
            transcendentals=b * h * lq_p * l_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    return out[:, :, :l, :d]


# ---------------------------------------------------------------------------
# legacy bias-tensor kernel (kept for comparison)
# ---------------------------------------------------------------------------


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
