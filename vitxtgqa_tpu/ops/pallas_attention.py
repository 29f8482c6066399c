"""Fused attention kernels (Pallas/Mosaic TPU).

Two entry points:

``flash_attention(q, k, v, key_mask, dec_len, dropout_rate, dropout_seed)``
  — the production kernel.  Computes softmax(q k^T / sqrt(d) + bias) v per
  (batch, head, q-block) with the *bias computed inside the kernel* from a
  compact [B, L] key-validity vector plus a static trailing-causal block
  length (the joint prefix-LM + decoder structure of
  ops/masks.prefix_lm_bias).  Nothing [L, L]-shaped ever touches HBM:
  scores, mask, probabilities, and the dropout pattern live in VMEM only.
  K/V for one (batch, head) are fetched once and stay resident across the
  q-block loop (grid iterates q fastest with a constant K/V index map).

  Attention-probs dropout runs on the in-kernel TPU PRNG, seeded
  deterministically per (batch, head, q-block); the backward kernel re-seeds
  identically and regenerates the same pattern, so no [L, L] mask is ever
  stored.  The PRNG stream differs from jax.random's (documented deviation —
  dropout is stochastic regularisation either way; the reference uses torch's
  stream, reference: pythia/models/t2s.py:548-633 BertSelfAttention dropout).

  Differentiable via jax.custom_vjp: the backward is a second Pallas kernel
  (recompute scores -> softmax backward -> dq/dk/dv, with dk/dv accumulated
  across q-blocks in resident output blocks).

``fused_attention(q, k, v, bias)`` — the earlier bias-tensor variant, kept
  for comparison/benchmarks; it streams a [B,1,{1,L},L] bias from HBM.

Performance notes (v5e, H=12, L~1056, D=64, bf16, same-session A/B):
  * flash vs XLA fused lowering: 15-27x per-call (e.g. 3.2ms vs 86ms at
    B=4 prefix-LM), 4.8x whole-model serving (361 vs 75 videos/s).
  * the older fused_attention measured 12x *slower* than XLA — its [L, L]
    bias rows re-streamed per head and per-q-block K/V refetch dominated.

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
# flash kernel: in-VMEM mask construction (+ optional in-kernel dropout)
# ---------------------------------------------------------------------------


def _allowed(bq, lp, qi, block_q, l_total, dec_len, key_ok, row_offset=0):
    """[BQ, Lp] bool attention-permission matrix for this q-block.

    row_offset (dynamic scalar) maps local q rows to global sequence
    positions when the caller holds a sequence-parallel query shard."""
    if dec_len > 0:
        l_enc = l_total - dec_len
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (bq, lp), 0)
            + qi * block_q + row_offset
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, lp), 1)
        dec_k = jnp.logical_and(cols >= l_enc, cols < l_total)
        causal = jnp.logical_and(
            jnp.logical_and(dec_k, rows >= l_enc), cols - l_enc <= rows - l_enc
        )
        return jnp.logical_or(key_ok, causal)
    return jnp.broadcast_to(key_ok, (bq, lp))


def _block_uid():
    """One int32 identifying this (b, h, q-block) grid step (Mosaic's
    prng_seed accepts at most 2 seed values)."""
    return (
        pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    ) * pl.num_programs(2) + pl.program_id(2)


def _dropout_keep(shape, rate):
    """Regenerable keep-mask from the current PRNG stream (seed first!)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return bits >= threshold  # P(keep) = 1 - rate


def _flash_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale,
                  block_q, l_total, dec_len, rate):
    """One (b, h, q-block) step; K/V blocks cover the full key range.
    seed_ref [2] SMEM: [dropout seed, global row offset of q row 0]."""
    q = q_ref[0, 0]  # [BQ, Dp]
    k = k_ref[0, 0]  # [Lp, Dp]
    v = v_ref[0, 0]  # [Lp, Dp]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, Lp] fp32

    bq, lp = scores.shape
    key_ok = mask_ref[0, 0:1, :] > 0  # [1, Lp] valid encoder keys
    allowed = _allowed(bq, lp, pl.program_id(2), block_q, l_total, dec_len,
                       key_ok, seed_ref[1])

    scores = jnp.where(allowed, scores, _NEG)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    weights = jnp.exp(scores)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], _block_uid())
        keep = _dropout_keep(weights.shape, rate)
        weights = jnp.where(keep, weights / (1.0 - rate), 0.0)
    o_ref[0, 0] = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _flash_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref,
                      dq_ref, dk_ref, dv_ref, *, scale, block_q, l_total,
                      dec_len, rate):
    """Backward for one (b, h, q-block); dk/dv accumulate across q-blocks
    in their resident output blocks (index map constant over qi)."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    q = q_ref[0, 0]  # [BQ, Dp]
    k = k_ref[0, 0]  # [Lp, Dp]
    v = v_ref[0, 0]  # [Lp, Dp]
    g = g_ref[0, 0].astype(jnp.float32)  # [BQ, Dp]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    bq, lp = scores.shape
    key_ok = mask_ref[0, 0:1, :] > 0
    allowed = _allowed(bq, lp, qi, block_q, l_total, dec_len, key_ok,
                       seed_ref[1])
    scores = jnp.where(allowed, scores, _NEG)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [BQ, Lp] fp32

    if rate > 0.0:
        # identical seeding to the forward kernel -> identical pattern
        pltpu.prng_seed(seed_ref[0], _block_uid())
        keep = _dropout_keep(p.shape, rate)
        inv = 1.0 / (1.0 - rate)
        p_dropped = jnp.where(keep, p * inv, 0.0)
    else:
        keep = None
        p_dropped = p

    # dV += P_d^T g
    dv_ref[0, 0] += jax.lax.dot_general(
        p_dropped, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP_d = g V^T ; dP = dP_d * keep/(1-rate)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, Lp]
    if rate > 0.0:
        dp = jnp.where(keep, dp * inv, 0.0)
    # softmax backward: dS = P * (dP - rowsum(dP * P))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # dQ = dS K * scale
    dq_ref[0, 0] = (jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dq_ref.dtype)
    # dK += dS^T Q * scale
    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale


def _even_block_q(l_p: int) -> int:
    """Largest evenly-dividing q-block for the dropout/backward kernels
    (they hold ~4 [BQ, Lp] fp32 buffers, so blocks are bounded): at the
    framework's 1152 tokens, 576 measured 16.8ms fwd+bwd vs 21.2 for the
    non-dividing 512 (q-row padding to 1536)."""
    for cand in (576, 512, 384, 256, 128):
        if l_p % cand == 0:
            return cand
    return 384


def _pick_block_q(l_p: int, block_q: int) -> int:
    if block_q <= 0:
        # full-sequence q-blocks measured fastest at the framework's 1056
        # joint tokens (fp32 scores 5.3MB in VMEM); cap to bound VMEM for
        # longer sequences
        block_q = min(l_p, 1280)
    return min(block_q, l_p)


def _pad_inputs(q, k, v, key_mask, block_q, pad_d: bool = False):
    """Pads q rows and key rows independently: a sequence-parallel caller
    holds an L/sp query shard against the full gathered key range."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    l_p = _round_up(lk, _LANE)
    # Mosaic accepts a block whose last dim equals the full array dim, so
    # head_dim stays unpadded by default: padding Q/K/V/O 64->128 costs an
    # HBM round-trip of every operand and measured 16.5x slower end-to-end
    # (43.9ms vs 2.7ms at B=16, L=1056) than letting Mosaic handle the
    # sub-lane-width registers internally; outputs are bit-identical
    d_p = _round_up(d, _LANE) if pad_d else d
    block_q = _pick_block_q(_round_up(lq, _LANE), block_q)
    lq_p = _round_up(lq, block_q)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, l_p - lk), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, l_p - lk), (0, d_p - d)))
    # [B, 1, Lp]: a (1, 1, Lp) block's sublane dim equals the array dim,
    # which Mosaic accepts (a (1, Lp) block on [B, Lp] does not)
    maskp = jnp.pad(
        key_mask.astype(jnp.float32), ((0, 0), (0, l_p - lk))
    )[:, None, :]
    return qp, kp, vp, maskp, block_q, l_p, lq_p, d_p


@functools.partial(
    jax.jit,
    static_argnames=("dec_len", "block_q", "interpret", "dropout_rate",
                     "pad_d"),
)
def flash_attention(q, k, v, key_mask, dec_len: int = 0, block_q: int = 0,
                    interpret: bool = False, dropout_rate: float = 0.0,
                    dropout_seed=None, pad_d: bool = False,
                    row_offset=None):
    """q [B,H,Lq,D], k/v [B,H,L,D]; key_mask [B,L] (1 = valid encoder key,
    decoder and padding slots 0); dec_len = static trailing causal block
    length.

    Semantics match mha(q, k, v, prefix_lm_bias(enc_mask, dec_len)) where
    key_mask = [enc_mask, zeros(dec_len)] — see ops/masks.MaskSpec — plus
    optional attention-probs dropout (dropout_seed: int32 scalar).

    Sequence-parallel callers pass an Lq = L/sp query shard with
    row_offset = the shard's global position of q row 0 (dynamic scalar is
    fine — it rides into SMEM), so the in-kernel prefix-LM/causal mask is
    built against global row indices (parallel/sequence_parallel.py).

    Differentiable: the backward pass is a second Pallas kernel that
    recomputes probabilities (and the dropout pattern, from the same seed)
    in VMEM.
    """
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    if dropout_rate > 0.0 and block_q <= 0:
        # the dropout pattern is seeded per (b, h, q-block): forward and
        # backward must use identical blocking, and the backward holds ~4
        # [BQ, Lp] fp32 buffers -> pick the backward-sized default for both
        block_q = _even_block_q(_round_up(q.shape[2], _LANE))
    smem = jnp.stack([
        jnp.asarray(dropout_seed, jnp.int32).reshape(()),
        jnp.asarray(row_offset, jnp.int32).reshape(()),
    ])
    return _flash_vjp(
        dec_len, block_q, interpret, float(dropout_rate), pad_d, q, k, v,
        key_mask, smem,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash_vjp(dec_len, block_q, interpret, rate, pad_d, q, k, v, key_mask,
               seed):
    return _flash_impl(q, k, v, key_mask, seed, dec_len, block_q, interpret,
                       rate, pad_d)


def _flash_fwd(dec_len, block_q, interpret, rate, pad_d, q, k, v, key_mask,
               seed):
    out = _flash_impl(q, k, v, key_mask, seed, dec_len, block_q, interpret,
                      rate, pad_d)
    return out, (q, k, v, key_mask, seed)


def _flash_bwd(dec_len, block_q, interpret, rate, pad_d, res, g):
    q, k, v, key_mask, seed = res
    dq, dk, dv = _flash_bwd_impl(
        q, k, v, key_mask, seed, g, dec_len, block_q, interpret, rate, pad_d
    )
    return dq, dk, dv, jnp.zeros_like(key_mask), jnp.zeros_like(seed)


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)


def _flash_impl(q, k, v, key_mask, seed, dec_len: int = 0, block_q: int = 0,
                interpret: bool = False, rate: float = 0.0,
                pad_d: bool = True):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    qp, kp, vp, maskp, block_q, l_p, lq_p, d_p = _pad_inputs(
        q, k, v, key_mask, block_q, pad_d
    )

    grid = (b, h, lq_p // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_q=block_q, l_total=lk,
            dec_len=dec_len, rate=rate,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
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
    )(seed, qp, kp, vp, maskp)
    return out[:, :, :lq, :d]


def _flash_bwd_impl(q, k, v, key_mask, seed, g, dec_len: int, block_q: int,
                    interpret: bool, rate: float, pad_d: bool = True):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    # smaller default q-blocks: the backward holds ~4 [BQ, Lp] fp32 buffers
    if block_q <= 0:
        block_q = _even_block_q(_round_up(lq, _LANE))
    qp, kp, vp, maskp, block_q, l_p, lq_p, d_p = _pad_inputs(
        q, k, v, key_mask, block_q, pad_d
    )
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, lq_p - lq), (0, d_p - d)))

    grid = (b, h, lq_p // block_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_kernel, scale=scale, block_q=block_q, l_total=lk,
            dec_len=dec_len, rate=rate,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec((1, 1, block_q, d_p), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, l_p, d_p), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, l_p, d_p), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, l_p), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, block_q, d_p), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_p), lambda bi, hi, qi: (bi, hi, qi, 0)),
            # dk/dv: resident accumulator blocks, constant index over qi
            pl.BlockSpec((1, 1, l_p, d_p), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, l_p, d_p), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((b, h, l_p, d_p), jnp.float32),
            jax.ShapeDtypeStruct((b, h, l_p, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * lq_p * l_p * d_p,
            bytes_accessed=(
                b * h * (4 * lq_p * d_p + 6 * l_p * d_p) * q.dtype.itemsize
            ),
            transcendentals=b * h * lq_p * l_p,
        ),
        interpret=interpret,
    )(seed, qp, kp, vp, maskp, gp)
    return (
        dq[:, :, :lq, :d],
        dk[:, :, :lk, :d].astype(k.dtype),
        dv[:, :, :lk, :d].astype(v.dtype),
    )


# ---------------------------------------------------------------------------
# merged-head flash kernel: full-sequence attention on [B, L, H*D] operands
# ---------------------------------------------------------------------------


def _flash_merged_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                         scale, block_q, l_total, dec_len, num_heads,
                         head_dim, rate):
    """One (batch, q-block) step; all heads resident in merged layout.

    q [1, BQ, H*D]; k/v [1, Lp, H*D]; mask [1, 1, Lp].  Heads are sliced
    from the 768-lane minor dim in VMEM, so the HBM operands keep the raw
    projection layout — no split_heads/merge_heads transposes (profiled at
    ~12ms per layer at batch 384) and no XLA layout-conversion copies
    around the pallas_call.

    Dropout (rate > 0) runs on the in-kernel PRNG, seeded once per
    (b, q-block) with heads drawing sequentially from the stream — the
    backward kernel re-seeds identically and walks heads in the same
    order, regenerating the exact pattern.
    """
    q = q_ref[0]  # [BQ, H*D]
    k = k_ref[0]  # [Lp, H*D]
    v = v_ref[0]
    bq = q.shape[0]
    lp = k.shape[0]
    key_ok = mask_ref[0, 0:1, :] > 0
    allowed = _allowed(bq, lp, pl.program_id(1), block_q, l_total, dec_len,
                       key_ok)
    if rate > 0.0:
        pltpu.prng_seed(
            seed_ref[0], pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        )
    o_ref[0] = _merged_heads_attend(
        q, k, v, allowed, scale, num_heads, head_dim, rate
    ).astype(o_ref.dtype)


def _merged_heads_attend(q, k, v, allowed, scale, num_heads, hd, rate):
    """Per-head softmax(QK^T)V over merged-layout VMEM tiles ([R, H*D])."""
    outs = []
    for h in range(num_heads):
        scores = jax.lax.dot_general(
            q[:, h * hd : (h + 1) * hd], k[:, h * hd : (h + 1) * hd],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale  # [BQ, Lp] fp32
        scores = jnp.where(allowed, scores, _NEG)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        w = jnp.exp(scores)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _dropout_keep(w.shape, rate)
            w = jnp.where(keep, w / (1.0 - rate), 0.0)
        outs.append(
            jax.lax.dot_general(
                w.astype(v.dtype), v[:, h * hd : (h + 1) * hd],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(outs, axis=1)


def _flash_merged_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref,
                             dq_ref, dk_ref, dv_ref, *, scale, block_q,
                             l_total, dec_len, num_heads, head_dim, rate):
    """Merged-layout backward for one (b, q-block); dk/dv accumulate
    across q-blocks in resident [Lp, H*D] fp32 output blocks.  Heads walk
    the PRNG stream in forward order so the dropout pattern regenerates
    exactly."""
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]  # [BQ, H*D]
    k = k_ref[0]  # [Lp, H*D]
    v = v_ref[0]
    g = g_ref[0]  # [BQ, H*D]
    bq = q.shape[0]
    lp = k.shape[0]
    key_ok = mask_ref[0, 0:1, :] > 0
    allowed = _allowed(bq, lp, qi, block_q, l_total, dec_len, key_ok)
    if rate > 0.0:
        pltpu.prng_seed(
            seed_ref[0], pl.program_id(0) * pl.num_programs(1) + qi
        )
        inv = 1.0 / (1.0 - rate)
    hd = head_dim
    dqs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        q_h = q[:, sl]
        k_h = k[:, sl]
        v_h = v[:, sl]
        g_h = g[:, sl].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.where(allowed, scores, _NEG)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [BQ, Lp]
        if rate > 0.0:
            keep = _dropout_keep(p.shape, rate)
            p_dropped = jnp.where(keep, p * inv, 0.0)
        else:
            keep = None
            p_dropped = p
        # dV_h += P_d^T g_h
        dv_ref[0, :, sl] += jax.lax.dot_general(
            p_dropped, g_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g_h, v_h.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dqs.append(
            jax.lax.dot_general(
                ds, k_h.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        )
        dk_ref[0, :, sl] += jax.lax.dot_general(
            ds, q_h.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dec_len", "num_heads", "block_q", "interpret",
                     "dropout_rate"),
)
def flash_attention_merged(q, k, v, key_mask, dec_len: int, num_heads: int,
                           block_q: int = 0, interpret: bool = False,
                           dropout_rate: float = 0.0, dropout_seed=None):
    """Merged-head full-sequence flash attention.

    q/k/v [B, L, H*D] raw projections; key_mask/dec_len as in
    flash_attention.  Semantics match merge_heads(flash_attention(
    split_heads(q), split_heads(k), split_heads(v), key_mask, dec_len))
    plus optional in-kernel attention-probs dropout (its PRNG stream is
    per (b, q-block) with heads drawn sequentially — a different but
    equivalent stream to the split kernel's).

    Differentiable: the backward is a merged-layout Pallas kernel too
    (resident [Lp, H*D] dk/dv accumulators), so neither direction pays
    split/merge_heads transposes.
    """
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    if dropout_rate > 0.0 and block_q <= 0:
        # fwd and bwd must share blocking for pattern regeneration
        block_q = _even_block_q(_round_up(q.shape[1], _LANE))
    return _flash_merged_vjp(
        dec_len, num_heads, block_q, interpret, float(dropout_rate),
        q, k, v, key_mask,
        jnp.asarray(dropout_seed, jnp.int32).reshape(1),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash_merged_vjp(dec_len, num_heads, block_q, interpret, rate, q, k, v,
                      key_mask, seed):
    return _flash_merged_impl(q, k, v, key_mask, seed, dec_len, num_heads,
                              block_q, interpret, rate)


def _flash_merged_fwd(dec_len, num_heads, block_q, interpret, rate, q, k, v,
                      key_mask, seed):
    out = _flash_merged_impl(q, k, v, key_mask, seed, dec_len, num_heads,
                             block_q, interpret, rate)
    return out, (q, k, v, key_mask, seed)


def _flash_merged_bwd(dec_len, num_heads, block_q, interpret, rate, res, g):
    q, k, v, key_mask, seed = res
    dq, dk, dv = _flash_merged_bwd_impl(
        q, k, v, key_mask, seed, g, dec_len, num_heads, block_q, interpret,
        rate,
    )
    return dq, dk, dv, jnp.zeros_like(key_mask), jnp.zeros_like(seed)


_flash_merged_vjp.defvjp(_flash_merged_fwd, _flash_merged_bwd)


def _merged_geometry(q, k, v, key_mask, num_heads, block_q):
    b, l, hd_total = q.shape
    d = hd_total // num_heads
    l_p = _round_up(l, _LANE)
    if block_q <= 0 and l_p % 384 == 0:
        # an even 384-row split measured fastest at the framework's 1152
        # tokens (25.4ms vs 27.4 full-block; non-dividing blocks lose more
        # to q-padding than they gain: 512 -> 37ms via the 1536 pad)
        block_q = 384
    block_q = _pick_block_q(l_p, block_q)
    lq_p = _round_up(l_p, block_q)
    if lq_p != l:
        q = jnp.pad(q, ((0, 0), (0, lq_p - l), (0, 0)))
    if l_p != l:
        k = jnp.pad(k, ((0, 0), (0, l_p - l), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, l_p - l), (0, 0)))
    maskp = jnp.pad(
        key_mask.astype(jnp.float32), ((0, 0), (0, l_p - l))
    )[:, None, :]
    return q, k, v, maskp, block_q, l_p, lq_p, d


def _flash_merged_impl(q, k, v, key_mask, seed, dec_len: int, num_heads: int,
                       block_q: int = 0, interpret: bool = False,
                       rate: float = 0.0):
    b, l, hd_total = q.shape
    d = hd_total // num_heads
    scale = 1.0 / (d ** 0.5)
    q, k, v, maskp, block_q, l_p, lq_p, d = _merged_geometry(
        q, k, v, key_mask, num_heads, block_q
    )

    grid = (b, lq_p // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_merged_kernel, scale=scale, block_q=block_q, l_total=l,
            dec_len=dec_len, num_heads=num_heads, head_dim=d, rate=rate,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec((1, block_q, hd_total), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, l_p, hd_total), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, l_p, hd_total), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, l_p), lambda bi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hd_total), lambda bi, qi: (bi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, lq_p, hd_total), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * lq_p * l_p * hd_total,
            bytes_accessed=(
                b * (2 * lq_p + 2 * l_p) * hd_total * q.dtype.itemsize
            ),
            transcendentals=b * num_heads * lq_p * l_p,
        ),
        interpret=interpret,
    )(seed, q, k, v, maskp)
    return out[:, :l, :]


def _flash_merged_q8_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, k8_ref,
                            ks_ref, v8_ref, vs_ref, *, scale, block_q,
                            l_total, dec_len, num_heads, head_dim):
    """_flash_merged_kernel (eval, no dropout) that additionally emits the
    int8 per-token-scaled decode cache from the K/V tiles it already holds
    in VMEM.  The K/V block is batch-resident (same block every q-block
    iteration), so quantization runs once at qi == 0 — the separate
    quantize_cache pass otherwise re-reads the whole bf16 cache from HBM
    (7.7 GB / ~13 ms per serving step at batch 576)."""
    q = q_ref[0]
    k = k_ref[0]  # [Lp, H*D]
    v = v_ref[0]
    bq = q.shape[0]
    lp = k.shape[0]
    key_ok = mask_ref[0, 0:1, :] > 0
    allowed = _allowed(bq, lp, pl.program_id(1), block_q, l_total, dec_len,
                       key_ok)

    @pl.when(pl.program_id(1) == 0)
    def _emit():
        # bit-matches ops.attention.quantize_kv: amax in the input dtype,
        # f32 scale, round + clip to ±127
        for x, x8_ref, xs_ref in ((k, k8_ref, ks_ref), (v, v8_ref, vs_ref)):
            s = jnp.maximum(
                jnp.max(jnp.abs(x), axis=-1).astype(jnp.float32), 1e-6
            ) / 127.0  # [Lp]
            x8_ref[0] = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s[:, None]), -127, 127
            ).astype(jnp.int8)
            xs_ref[0] = s[None, :]

    o_ref[0] = _merged_heads_attend(
        q, k, v, allowed, scale, num_heads, head_dim, 0.0
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dec_len", "num_heads", "block_q", "interpret")
)
def flash_attention_merged_q8(q, k, v, key_mask, dec_len: int,
                              num_heads: int, block_q: int = 0,
                              interpret: bool = False):
    """flash_attention_merged (eval path) fused with int8 cache emission.

    Returns (out [B, L, H*D], (k8, ks), (v8, vs)) where the quantized
    pairs follow ops.attention.quantize_kv's layout ([B, L, H*D] int8 +
    [B, L] f32 per-token scales) computed over the SAME padded cache rows
    the decode loop will read.  Serving-only: not differentiable.

    Measured NEGATIVE on the v5e (same-process A/B at [576, 1152, 768]):
    75.6 ms vs 73.7 ms for flash_attention_merged + a separate XLA
    quantize_kv pass — the three extra output streams cost the kernel
    more pipelining/VMEM headroom than the saved HBM re-read gains, so
    the default decode path keeps the separate quantize_cache pass.
    Kept as a working alternative (bit-exact, tested in interpret mode)
    for geometries with more decode steps per encode."""
    b, l, hd_total = q.shape
    d = hd_total // num_heads
    scale = 1.0 / (d ** 0.5)
    q, k, v, maskp, block_q, l_p, lq_p, d = _merged_geometry(
        q, k, v, key_mask, num_heads, block_q
    )
    grid = (b, lq_p // block_q)
    kv_spec = pl.BlockSpec((1, l_p, hd_total), lambda bi, qi: (bi, 0, 0))
    sc_spec = pl.BlockSpec((1, 1, l_p), lambda bi, qi: (bi, 0, 0))
    out, k8, ks, v8, vs = pl.pallas_call(
        functools.partial(
            _flash_merged_q8_kernel, scale=scale, block_q=block_q,
            l_total=l, dec_len=dec_len, num_heads=num_heads, head_dim=d,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd_total), lambda bi, qi: (bi, qi, 0)),
            kv_spec,
            kv_spec,
            sc_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd_total), lambda bi, qi: (bi, qi, 0)),
            kv_spec,
            sc_spec,
            kv_spec,
            sc_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq_p, hd_total), q.dtype),
            jax.ShapeDtypeStruct((b, l_p, hd_total), jnp.int8),
            jax.ShapeDtypeStruct((b, 1, l_p), jnp.float32),
            jax.ShapeDtypeStruct((b, l_p, hd_total), jnp.int8),
            jax.ShapeDtypeStruct((b, 1, l_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * lq_p * l_p * hd_total,
            bytes_accessed=(
                b * (2 * lq_p + 3 * l_p) * hd_total * q.dtype.itemsize
            ),
            transcendentals=b * num_heads * lq_p * l_p,
        ),
        interpret=interpret,
    )(q, k, v, maskp)
    return (
        out[:, :l, :],
        (k8[:, :l, :], ks[:, 0, :l]),
        (v8[:, :l, :], vs[:, 0, :l]),
    )


def _flash_merged_bwd_impl(q, k, v, key_mask, seed, g, dec_len: int,
                           num_heads: int, block_q: int = 0,
                           interpret: bool = False, rate: float = 0.0):
    b, l, hd_total = q.shape
    d = hd_total // num_heads
    scale = 1.0 / (d ** 0.5)
    if block_q <= 0:
        block_q = _even_block_q(_round_up(l, _LANE))
    q, k, v, maskp, block_q, l_p, lq_p, d = _merged_geometry(
        q, k, v, key_mask, num_heads, block_q
    )
    gp = jnp.pad(g, ((0, 0), (0, lq_p - l), (0, 0)))

    grid = (b, lq_p // block_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_merged_bwd_kernel, scale=scale, block_q=block_q,
            l_total=l, dec_len=dec_len, num_heads=num_heads, head_dim=d,
            rate=rate,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec((1, block_q, hd_total), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, l_p, hd_total), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, l_p, hd_total), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, l_p), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, block_q, hd_total), lambda bi, qi: (bi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd_total), lambda bi, qi: (bi, qi, 0)),
            # dk/dv: resident accumulator blocks, constant index over qi
            pl.BlockSpec((1, l_p, hd_total), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, l_p, hd_total), lambda bi, qi: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq_p, hd_total), q.dtype),
            jax.ShapeDtypeStruct((b, l_p, hd_total), jnp.float32),
            jax.ShapeDtypeStruct((b, l_p, hd_total), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * lq_p * l_p * hd_total,
            bytes_accessed=(
                b * (4 * lq_p + 6 * l_p) * hd_total * q.dtype.itemsize
            ),
            transcendentals=b * num_heads * lq_p * l_p,
        ),
        interpret=interpret,
    )(seed, q, k, v, maskp, gp)
    return (
        dq[:, :l, :],
        dk[:, :l, :].astype(k.dtype),
        dv[:, :l, :].astype(v.dtype),
    )


# ---------------------------------------------------------------------------
# decode-step kernel: q_len == 1 attention over the unified KV cache
# ---------------------------------------------------------------------------


def _decode_kernel(step_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale,
                   write_offset, num_heads, head_dim):
    """One batch row per grid step; all heads resident in merged layout.

    q [1, 1, H*D]; k/v [1, Lp, H*D] (the full cache row, heads merged in
    the minor dim — 768 lanes, so HBM stores it unpadded and XLA hands it
    to the kernel without a layout-conversion copy; the per-head [.., 64]
    layout measured 4.08GB of temp copies at full-eval dims); mask
    [1, 1, Lp]; step scalar in SMEM.  Per-head scores stack into one
    [H, Lp] tile so the masked softmax vectorises over the sublane dim.
    """
    step = step_ref[0]
    key_ok = mask_ref[0, 0:1, :] > 0  # [1, Lp]
    cols = jax.lax.broadcasted_iota(jnp.int32, key_ok.shape, 1)
    dec_ok = jnp.logical_and(cols >= write_offset,
                             cols <= write_offset + step)
    allowed = jnp.logical_or(key_ok, dec_ok)  # [1, Lp]

    q = q_ref[0]  # [1, H*D]
    k = k_ref[0]  # [Lp, H*D]
    v = v_ref[0]
    hd = head_dim
    scores = jnp.concatenate(
        [
            jax.lax.dot_general(
                q[:, h * hd : (h + 1) * hd], k[:, h * hd : (h + 1) * hd],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(num_heads)
        ],
        axis=0,
    ) * scale  # [H, Lp] fp32
    scores = jnp.where(allowed, scores, _NEG)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    o_ref[0] = jnp.concatenate(
        [
            jax.lax.dot_general(
                w[h : h + 1].astype(v.dtype), v[:, h * hd : (h + 1) * hd],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(num_heads)
        ],
        axis=1,
    ).astype(o_ref.dtype)  # [1, H*D]


@functools.partial(
    jax.jit, static_argnames=("write_offset", "num_heads", "interpret")
)
def decode_attention(q, k, v, key_mask, step, write_offset: int,
                     num_heads: int, interpret: bool = False):
    """Single-query-token attention over the unified decode cache.

    Merged-head layout: q [B, 1, H*D]; k/v [B, L, H*D] (raw key/value
    projections, pre-split_heads); key_mask [B, L] (1 = valid encoder key;
    decoder and padding slots 0); step: scalar int32 decoder position;
    write_offset: static index of decoder slot 0.  Semantics match
    merge_heads(mha(split_heads(q), split_heads(k), split_heads(v),
    DecodeStepSpec(key_mask, step, write_offset).to_bias())).

    Eval-only (no VJP): the greedy decode scan never differentiates.
    """
    b, _, hd_total = q.shape
    d = hd_total // num_heads
    l = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    l_p = _round_up(l, _LANE)
    if l_p != l:
        k = jnp.pad(k, ((0, 0), (0, l_p - l), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, l_p - l), (0, 0)))
    maskp = jnp.pad(
        key_mask.astype(jnp.float32), ((0, 0), (0, l_p - l))
    )[:, None, :]
    step_arr = jnp.asarray(step, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, scale=scale, write_offset=write_offset,
            num_heads=num_heads, head_dim=d,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # step [1]
            pl.BlockSpec((1, 1, hd_total), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, l_p, hd_total), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, l_p, hd_total), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, l_p), lambda bi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, hd_total), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, hd_total), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * l_p * hd_total,
            bytes_accessed=b * 2 * l_p * hd_total * k.dtype.itemsize,
            transcendentals=b * num_heads * l_p,
        ),
        interpret=interpret,
    )(step_arr, q, k, v, maskp)
    return out


# ---------------------------------------------------------------------------
# int8 decode-step kernel: quantized unified KV cache (halves cache reads)
# ---------------------------------------------------------------------------


def _decode_int8_kernel(step_ref, q_ref, k8_ref, ks_ref, v8_ref, vs_ref,
                        mask_ref, o_ref, *, scale, write_offset, num_heads,
                        head_dim):
    """Like _decode_kernel, but K/V arrive int8 with per-token scales
    [1, Lp].  The scales fold into the [H, Lp] score/weight tiles (one
    broadcast multiply each) — no per-element dequant cost beyond the
    int8->bf16 convert of the tiles."""
    step = step_ref[0]
    key_ok = mask_ref[0, 0:1, :] > 0
    cols = jax.lax.broadcasted_iota(jnp.int32, key_ok.shape, 1)
    dec_ok = jnp.logical_and(cols >= write_offset,
                             cols <= write_offset + step)
    allowed = jnp.logical_or(key_ok, dec_ok)

    q = q_ref[0]  # [1, H*D]
    kf = k8_ref[0].astype(q.dtype)  # [Lp, H*D] (int8 values exact in bf16)
    vf = v8_ref[0].astype(q.dtype)
    ks = ks_ref[0]  # [1, Lp] f32 per-token scale
    vs = vs_ref[0]
    hd = head_dim
    scores = jnp.concatenate(
        [
            jax.lax.dot_general(
                q[:, h * hd : (h + 1) * hd], kf[:, h * hd : (h + 1) * hd],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(num_heads)
        ],
        axis=0,
    ) * (ks * scale)  # [H, Lp] fp32, dequant folded in (row broadcast)
    scores = jnp.where(allowed, scores, _NEG)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores)
    w = (w / jnp.sum(w, axis=-1, keepdims=True)) * vs  # V dequant folded
    o_ref[0] = jnp.concatenate(
        [
            jax.lax.dot_general(
                w[h : h + 1].astype(vf.dtype), vf[:, h * hd : (h + 1) * hd],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for h in range(num_heads)
        ],
        axis=1,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("write_offset", "num_heads", "interpret")
)
def decode_attention_int8(q, k8, ks, v8, vs, key_mask, step,
                          write_offset: int, num_heads: int,
                          interpret: bool = False):
    """decode_attention over an int8-quantized cache.

    k8/v8 [B, L, H*D] int8; ks/vs [B, L] f32 per-token scales (see
    ops.attention.quantize_kv).  Semantics match decode_attention on the
    dequantized cache; quantization error is bounded by the int8 step of
    the token's max-magnitude channel.
    """
    b, _, hd_total = q.shape
    d = hd_total // num_heads
    l = k8.shape[1]
    scale = 1.0 / (d ** 0.5)
    l_p = _round_up(l, _LANE)
    if l_p != l:
        k8 = jnp.pad(k8, ((0, 0), (0, l_p - l), (0, 0)))
        v8 = jnp.pad(v8, ((0, 0), (0, l_p - l), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, l_p - l)))
        vs = jnp.pad(vs, ((0, 0), (0, l_p - l)))
    ks = ks[:, None, :]  # [B, 1, Lp] — same block geometry as the mask
    vs = vs[:, None, :]
    maskp = jnp.pad(
        key_mask.astype(jnp.float32), ((0, 0), (0, l_p - l))
    )[:, None, :]
    step_arr = jnp.asarray(step, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(
            _decode_int8_kernel, scale=scale, write_offset=write_offset,
            num_heads=num_heads, head_dim=d,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # step [1]
            pl.BlockSpec((1, 1, hd_total), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, l_p, hd_total), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, l_p), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, l_p, hd_total), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, l_p), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, l_p), lambda bi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, hd_total), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, hd_total), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * l_p * hd_total,
            bytes_accessed=b * 2 * l_p * hd_total,
            transcendentals=b * num_heads * l_p,
        ),
        interpret=interpret,
    )(step_arr, q, k8, ks, v8, vs, maskp)
    return out


def _ptr_scores_int8_kernel(q_ref, k8_ref, ks_ref, mask_ref, o_ref, *,
                            scale):
    q = q_ref[...]  # [BT, 1, D]
    kf = k8_ref[...].astype(q.dtype)  # [BT, Np, D] (int8 exact in bf16)
    s = jax.lax.dot_general(
        q, kf, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [BT, 1, Np]
    # dequant scale and 1/sqrt(d) fold into one row-broadcast multiply;
    # the raw 0/1 mask then ADDS (the reference OcrPtrNet quirk — valid
    # slots get +1, not a -1e4 fill; reference: t2s.py:636-670)
    o_ref[...] = s * (ks_ref[...] * scale) + mask_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def ptr_scores_int8(q, k8, ks, mask, interpret: bool = False,
                    batch_tile: int = 8):
    """OcrPtrNet decode-step scores over int8 per-token-scaled keys.

    q [B, 1, D] query projection; k8 [B, N, D] int8 keys with scales
    ks [B, N] f32 (ops.attention.quantize_kv layout); mask [B, N] raw 0/1
    OCR-slot mask, ADDED to the scores.  Returns [B, 1, N] f32 — the same
    contraction as OcrPtrNet.scores_from_keys on the dequantized keys
    ((q . k8) * s == q . (k8 * s) exactly, modulo f32 summation order).

    Exists because the decode scan re-reads the [B, 960, 768] key tensor
    every step: bf16 keys cost 10.2 GB over 12 steps at batch 576
    (13.5 ms, bandwidth-roofline); int8 halves that.

    Measured NEGATIVE on the v5e as a [B]-grid matvec (same-process A/B,
    12 steps at the dims above): 39.7 ms vs 34.3 ms for the bf16 einsum
    path — 576 tiny single-row programs lose more to per-program overhead
    than the halved key bytes gain.  This version tiles ``batch_tile``
    rows per program (batched dot_general in-kernel; 72 programs at batch
    576 / tile 8, ~5.9 MB of int8 keys per block) to amortise that
    overhead; the decode harness keeps bf16 ptr keys until a same-process
    A/B on hardware shows the tiled form winning."""
    b, s_len, d = q.shape
    n = k8.shape[1]
    n_p = _round_up(n, _LANE)
    scale = 1.0 / (d ** 0.5)
    bt = max(1, min(batch_tile, b))
    b_p = _round_up(b, bt)
    if n_p != n:
        k8 = jnp.pad(k8, ((0, 0), (0, n_p - n), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, n_p - n)))
        mask = jnp.pad(mask, ((0, 0), (0, n_p - n)))
    ks = ks[:, None, :]  # [B, 1, Np]
    maskp = mask.astype(jnp.float32)[:, None, :]
    if b_p != b:
        q = jnp.pad(q, ((0, b_p - b), (0, 0), (0, 0)))
        k8 = jnp.pad(k8, ((0, b_p - b), (0, 0), (0, 0)))
        ks = jnp.pad(ks, ((0, b_p - b), (0, 0), (0, 0)))
        maskp = jnp.pad(maskp, ((0, b_p - b), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ptr_scores_int8_kernel, scale=scale),
        grid=(b_p // bt,),
        in_specs=[
            pl.BlockSpec((bt, s_len, d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((bt, n_p, d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((bt, 1, n_p), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((bt, 1, n_p), lambda bi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, s_len, n_p), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_p, s_len, n_p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_p * n_p * d,
            bytes_accessed=b_p * n_p * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, k8, ks, maskp)
    return out[:b, :, :n]


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
