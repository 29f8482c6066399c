"""Fused post-attention-block BACKWARD kernel (Pallas/Mosaic TPU).

``block_train`` is the *training-mode* post-attention block — the exact
expression of ``TransformerLayer._finish``'s XLA path (attn_out projection,
hidden dropout, residual+LN, FFN, hidden dropout, residual+LN; reference hot
loop: /root/reference/pythia/trainers/base_trainer.py:262-272 over the MMT of
/root/reference/pythia/models/t2s.py:548-633) — wrapped in a ``jax.custom_vjp``
whose FORWARD is the plain XLA graph (so selective remat and XLA's fwd fusion
behave exactly as before) and whose BACKWARD is ONE Pallas kernel per layer.

Why: the round-3 train roofline (BASELINE.md) attributes 54 ms/step at batch
48 to backward *reductions* — recomputed LN statistics, LN dscale/dbias, and
Dense bias grads, each a standalone XLA reduce fusion re-reading a [3B*L, D]
or [3B*L, M] cotangent from HBM — plus epilogue overhead that keeps the
backward dots at 66% of the MXU ideal.  The fused backward computes, in a
single pass over the cotangent with both weight matrices and all weight-grad
accumulators resident in VMEM:

    dctx, dWo, dbo      (attn_out projection backward)
    ds1, dg1            (attn LayerNorm scale/bias grads, stats from x1h)
    dW1, db1, dW2, db2  (FFN backward, gelu' recomputed from saved pre1)
    ds2, dg2            (ffn LayerNorm grads, stats from x2h)
    dx_q                (residual-path input grad)

so none of the reductions makes its own trip over HBM, and the weight-grad
dots accumulate in fp32 across row-block grid steps (slightly *better*
numerics than XLA's bf16 dW dots).

Residuals saved by the forward: (ctx, x1h, pre1, h, x2h [+ dropout
masks]) — all values the XLA forward materialises anyway; LN statistics
are recomputed in-kernel from x1h/x2h (a [R, 1] fp32 VPU reduce — the
forward-direction equivalent profiled at ~0.1 ms/step).  ``h`` (the
forward's exact bf16 gelu output) feeds the dW2 dot directly; only the
gelu DERIVATIVE recomputes, via the same Abramowitz-Stegun erf
approximation as ops.pallas_ffn (max abs err 1.5e-7, two orders below
bf16 resolution).  Saving h instead of recomputing it measured +3.5%
on the full train step (the in-kernel transcendentals were ~9 ms/step
— BASELINE.md v1-vs-v2 table).

Dropout has two modes:

  * mask mode (default): masks are drawn OUTSIDE the custom_vjp
    (jax.random.bernoulli, same semantics as flax ``nn.Dropout``:
    ``where(mask, x/keep, 0)``) and passed as int8 primal inputs, so
    forward and backward see bit-identical patterns and remat regenerates
    them deterministically — no in-kernel PRNG reproduction contract.
  * seed mode (``tpu.kernel_dropout``, round 5): the round-5 HLO dig found
    the mask threefry+convert pipelines cost ~30 ms/step at batch 48
    (they surface in the profile as "reshape"-attributed s8 converts
    under the layer._finish scopes).  In seed mode the caller passes ONE
    int32 seed per layer call and both kernels regenerate the keep-masks
    in-kernel from ``pltpu.prng_seed(seed, row-block id)`` — the same
    regeneration contract the flash-attention kernels already use
    (ops/pallas_attention._dropout_keep).  The fwd rule, the primal
    (which IS the DCE'd fwd rule), the remat recompute, and the backward
    all draw the identical stream, so masks agree bit-for-bit without
    ever being materialised in HBM.  Keep-probability quantisation is
    1/2^32 (threshold compare on raw u32 bits — statistically exact).

Opt-in via ``training_parameters.tpu.fused_block_bwd``
(models.common.set_fused_block_bwd); measured A/B lives in
tools/bench_train.py (BENCH_FUSED_BLOCK_BWD / BENCH_KERNEL_DROPOUT).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vitxtgqa_tpu.ops.pallas_ffn import _erf

_LANE = 128
# the backward holds ~4 [R, M] fp32 intermediates (M=3072 -> 3.1MB each at
# 256 rows) next to the resident fp32 dW1/dW2 accumulators (9.4MB each);
# 256 vs 512 measured within noise on the v5e (block-bwd probe), 256 keeps
# VMEM headroom.  VITXTGQA_BLOCK_BWD_R overrides for probing — read at
# CALL time (it becomes a static jit arg), so probes that set the env
# after import still take effect.
_DEFAULT_BLOCK_R = 256


def _block_r() -> int:
    return int(os.environ.get("VITXTGQA_BLOCK_BWD_R", _DEFAULT_BLOCK_R))

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _phi_cdf(x):
    return 0.5 * (1.0 + _erf(x * _INV_SQRT2))


def _gelu(x):
    return x * _phi_cdf(x)


def _gelu_grad(x):
    """d/dx gelu(x) = Phi(x) + x * phi(x)."""
    pdf = jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI
    return _phi_cdf(x) + x * pdf


def _ln_f32(u, scale, bias, eps):
    """LayerNorm with fp32 statistics (flax computes stats in fp32 too)."""
    uf = u.astype(jnp.float32)
    mu = jnp.mean(uf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(uf - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (uf - mu) * inv * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )


def _ln_stats(uf, eps):
    mu = jnp.mean(uf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(uf - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (uf - mu) * inv, inv  # xhat [R, D], inv [R, 1]


def _ln_bwd(g, xhat, inv, scale):
    """Input grad of y = xhat*scale + bias given cotangent g (fp32)."""
    dxh = g * scale
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return inv * (dxh - m1 - xhat * m2)


def block_train_reference(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2,
                          mask_a=None, mask_f=None, rate: float = 0.0,
                          eps: float = 1e-12):
    """The exact XLA expression of the training-mode post-attention block
    (TransformerLayer._finish non-fused path) with explicit dropout masks.
    This is both the forward of block_train and the VJP oracle for the
    backward kernel tests."""
    dt = x_q.dtype
    keep = 1.0 - rate
    attn = jnp.dot(ctx.astype(dt), wo.astype(dt)) + bo.astype(dt)
    if rate > 0.0:
        attn = jnp.where(mask_a != 0, attn / keep, jnp.zeros_like(attn))
    x1h = x_q + attn
    x = _ln_f32(x1h, s1, g1, eps).astype(dt)
    pre1 = jnp.dot(x, w1.astype(dt)) + b1.astype(dt)
    h = jax.nn.gelu(pre1, approximate=False)
    ffn = jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
    if rate > 0.0:
        ffn = jnp.where(mask_f != 0, ffn / keep, jnp.zeros_like(ffn))
    x2h = x + ffn
    return _ln_f32(x2h, s2, g2, eps).astype(dt)


def _forward_with_residuals(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2,
                            g2, mask_a, mask_f, rate, eps):
    dt = x_q.dtype
    keep = 1.0 - rate
    ctx = ctx.astype(dt)
    attn = jnp.dot(ctx, wo.astype(dt)) + bo.astype(dt)
    if rate > 0.0:
        attn = jnp.where(mask_a != 0, attn / keep, jnp.zeros_like(attn))
    x1h = x_q + attn
    x = _ln_f32(x1h, s1, g1, eps).astype(dt)
    pre1 = jnp.dot(x, w1.astype(dt)) + b1.astype(dt)
    h = jax.nn.gelu(pre1, approximate=False)
    ffn = jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
    if rate > 0.0:
        ffn = jnp.where(mask_f != 0, ffn / keep, jnp.zeros_like(ffn))
    x2h = x + ffn
    y = _ln_f32(x2h, s2, g2, eps).astype(dt)
    # h rides as a residual: the backward then reuses the forward's exact
    # bf16 gelu output for the dW2 operand instead of recomputing it with
    # the in-kernel A-S erf — bit-faithful AND it drops one of the two
    # transcendental passes over [R, M] (a full-step A/B with ALL
    # transcendentals stubbed out measured them at ~9 ms/step, ~1.6%)
    return y, (ctx, x1h, pre1, h, x2h)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# --------------------------------------------------------------------------
# Pallas forward for the RECOMPUTE phase (round-5: the round-4 HLO dig's
# ~28 ms/step convert_reduce surface).
#
# Under jax.checkpoint the custom_vjp PRIMAL function runs in the forward
# phase and the FWD RULE runs only inside the remat (recompute) eqn — a
# make_jaxpr probe confirms the fwd rule's residual production never
# appears in the primal section.  So routing the fwd rule through a Pallas
# kernel leaves the primal XLA forward (and its fusions) untouched while
# folding the recompute's LN/residual elementwise chains — profiled at
# ~3-4x their traffic ideal across 18 layer-calls/step — into the matmul
# passes.  The kernel reproduces the XLA rounding chain exactly where it
# matters (bf16 dot rounding before bias adds; LN stats in fp32; gelu from
# the bf16-rounded pre1 via the A-S erf, max abs err 1.5e-7).
#
# Opt-in: set_block_recompute_fwd (config tpu.fused_block_fwd); measured
# A/B in tools/bench_train.py (BENCH_FUSED_BLOCK_FWD).
# --------------------------------------------------------------------------

_RECOMPUTE_FWD = False


def set_block_recompute_fwd(enabled: bool) -> None:
    """Pallas forward for the remat recompute phase (trace-time flag)."""
    global _RECOMPUTE_FWD
    _RECOMPUTE_FWD = bool(enabled)


def block_recompute_fwd_enabled() -> bool:
    return _RECOMPUTE_FWD


_KERNEL_DROPOUT = False


def set_kernel_dropout(enabled: bool) -> None:
    """In-kernel PRNG dropout masks for the fused block (trace-time flag,
    config tpu.kernel_dropout).  Replaces the two materialised [R, D]
    masks per layer call with one int32 seed; the fwd and bwd kernels
    regenerate identical masks from (seed, row-block id) — see the module
    docstring.  Only meaningful with fused_block_bwd on; the caller
    (TransformerLayer._finish) additionally requires a TPU backend."""
    global _KERNEL_DROPOUT
    _KERNEL_DROPOUT = bool(enabled)


def kernel_dropout_enabled() -> bool:
    return _KERNEL_DROPOUT


def _draw_block_masks(seed_ref, shape, rate):
    """Seed-mode keep masks for one row block: seed once with (call seed,
    row-block id), then draw attn mask FIRST, ffn mask SECOND — the fwd
    and bwd kernels must keep this exact order so the streams agree."""
    from vitxtgqa_tpu.ops.pallas_attention import _dropout_keep

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    keep_a = _dropout_keep(shape, rate)
    keep_f = _dropout_keep(shape, rate)
    return keep_a, keep_f


def _fwd_kernel(*refs, rate, eps, has_dropout, seed_mode=False,
                emit_masks=False):
    rest = list(refs)
    seed_ref = rest.pop(0) if seed_mode else None
    (x_q_ref, ctx_ref, wo_ref, bo_ref, s1_ref, g1_ref, w1_ref,
     b1_ref, w2_ref, b2_ref, s2_ref, g2_ref) = rest[:12]
    rest = rest[12:]
    ma_ref = mf_ref = None
    if has_dropout and not seed_mode:
        ma_ref, mf_ref = rest[:2]
        rest = rest[2:]
    (y_ref, x1h_ref, pre1_ref, h_ref, x2h_ref) = rest[:5]
    rest = rest[5:]
    dt = y_ref.dtype
    keep = 1.0 - rate

    if seed_mode:
        keep_a, keep_f = _draw_block_masks(seed_ref, x_q_ref.shape, rate)
        if emit_masks:  # test hook: expose the drawn masks as outputs
            ma_out, mf_out = rest[:2]
            ma_out[...] = keep_a.astype(jnp.int8)
            mf_out[...] = keep_f.astype(jnp.int8)

    # attn_out projection: f32 MXU accumulate, round to dt, THEN bias —
    # the exact jnp.dot(ctx, wo) + bo rounding order of the XLA forward
    attn = jax.lax.dot_general(
        ctx_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + bo_ref[...].astype(dt)
    if has_dropout:
        keep_m = keep_a if seed_mode else (ma_ref[...] != 0)
        attn = jnp.where(keep_m, attn / keep, jnp.zeros_like(attn))
    x1h = x_q_ref[...] + attn
    x1h_ref[...] = x1h

    xhat1, _ = _ln_stats(x1h.astype(jnp.float32), eps)
    x = (
        xhat1 * s1_ref[...].astype(jnp.float32)
        + g1_ref[...].astype(jnp.float32)
    ).astype(dt)

    pre1 = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b1_ref[...].astype(dt)
    pre1_ref[...] = pre1
    # gelu from the dt-rounded pre1 (what the XLA forward feeds erf)
    h = (_gelu(pre1.astype(jnp.float32))).astype(dt)
    h_ref[...] = h

    ffn = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b2_ref[...].astype(dt)
    if has_dropout:
        keep_m = keep_f if seed_mode else (mf_ref[...] != 0)
        ffn = jnp.where(keep_m, ffn / keep, jnp.zeros_like(ffn))
    x2h = x + ffn
    x2h_ref[...] = x2h

    xhat2, _ = _ln_stats(x2h.astype(jnp.float32), eps)
    y_ref[...] = (
        xhat2 * s2_ref[...].astype(jnp.float32)
        + g2_ref[...].astype(jnp.float32)
    ).astype(dt)


@functools.partial(
    jax.jit,
    static_argnames=("rate", "eps", "interpret", "has_dropout", "block_r",
                     "seed_mode", "emit_masks"),
)
def _fwd_impl(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2, mask_a,
              mask_f, rate: float, eps: float, interpret: bool,
              has_dropout: bool, block_r: int, seed=None,
              seed_mode: bool = False, emit_masks: bool = False):
    dt = x_q.dtype
    d = x_q.shape[-1]
    m = w1.shape[-1]
    r = x_q.shape[0]
    rp = _round_up(r, block_r)
    pad = lambda a: jnp.pad(a, ((0, rp - r), (0, 0))) if rp != r else a
    row = lambda w: pl.BlockSpec((block_r, w), lambda i: (i, 0))
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    vec = lambda a: a.astype(jnp.float32)[None, :]
    in_specs = [
        row(d), row(d),
        full(d, d), full(1, d), full(1, d), full(1, d),
        full(d, m), full(1, m), full(m, d), full(1, d),
        full(1, d), full(1, d),
    ]
    inputs = [pad(x_q), pad(ctx.astype(dt)), wo.astype(dt),
              bo.astype(jnp.float32)[None, :], vec(s1), vec(g1),
              w1.astype(dt), b1.astype(jnp.float32)[None, :],
              w2.astype(dt), b2.astype(jnp.float32)[None, :],
              vec(s2), vec(g2)]
    if seed_mode:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = [jnp.asarray(seed, jnp.int32).reshape(1)] + inputs
    elif has_dropout:
        in_specs += [row(d), row(d)]
        inputs += [pad(mask_a), pad(mask_f)]
    out_specs = [row(d), row(d), row(m), row(m), row(d)]
    out_shape = [
        jax.ShapeDtypeStruct((rp, d), dt),   # y
        jax.ShapeDtypeStruct((rp, d), dt),   # x1h
        jax.ShapeDtypeStruct((rp, m), dt),   # pre1
        jax.ShapeDtypeStruct((rp, m), dt),   # h
        jax.ShapeDtypeStruct((rp, d), dt),   # x2h
    ]
    if emit_masks:
        out_specs += [row(d), row(d)]
        out_shape += [jax.ShapeDtypeStruct((rp, d), jnp.int8)] * 2
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, rate=rate, eps=eps, has_dropout=has_dropout,
            seed_mode=seed_mode, emit_masks=emit_masks,
        ),
        grid=(rp // block_r,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * (d * d + 2 * d * m),
            bytes_accessed=(
                rp * (4 * d + 2 * m) * 2 + (d * d + 2 * d * m) * 2
            ),
            transcendentals=rp * m,
        ),
        interpret=interpret,
    )(*inputs)
    y, x1h, pre1, h, x2h = outs[:5]
    if emit_masks:
        return (y[:r], x1h[:r], pre1[:r], h[:r], x2h[:r],
                outs[5][:r], outs[6][:r])
    return y[:r], x1h[:r], pre1[:r], h[:r], x2h[:r]


def _forward_residuals_dispatch(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2,
                                s2, g2, mask_a, mask_f, rate, eps,
                                interpret):
    """Fwd-rule body: Pallas recompute forward when enabled, XLA otherwise.

    Only ever traced inside the custom_vjp fwd rule — i.e. in the remat
    RECOMPUTE phase (or the primal of an un-remat'd grad), never in the
    plain primal forward."""
    d = x_q.shape[-1]
    m = w1.shape[-1]
    dt = x_q.dtype
    if _RECOMPUTE_FWD and block_bwd_kernel_ok(d, m):
        shape = x_q.shape
        flat = lambda a, w: a.reshape(-1, w)
        y, x1h, pre1, h, x2h = _fwd_impl(
            flat(x_q, d), flat(ctx, d), wo, bo, s1, g1, w1, b1, w2, b2,
            s2, g2,
            flat(mask_a, d) if mask_a is not None else None,
            flat(mask_f, d) if mask_f is not None else None,
            rate=rate, eps=eps, interpret=interpret,
            has_dropout=rate > 0.0, block_r=_block_r(),
        )
        unflat = lambda a, w: a.reshape(shape[:-1] + (w,))
        return unflat(y, d), (
            ctx.astype(dt), unflat(x1h, d), unflat(pre1, m),
            unflat(h, m), unflat(x2h, d),
        )
    return _forward_with_residuals(
        x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2, mask_a, mask_f,
        rate, eps,
    )


@functools.partial(
    jax.jit,
    static_argnames=("rate", "eps", "interpret", "has_dropout", "block_r",
                     "seed_mode"),
)
def _bwd_impl(g, ctx, x1h, pre1, h, x2h, wo, w1, w2, s1, g1, s2, mask_a,
              mask_f, rate: float, eps: float, interpret: bool,
              has_dropout: bool, block_r: int, seed=None,
              seed_mode: bool = False):
    dt = ctx.dtype
    d = ctx.shape[-1]
    m = pre1.shape[-1]
    r = ctx.shape[0]
    rp = _round_up(r, block_r)
    pad = lambda a: jnp.pad(a, ((0, rp - r), (0, 0))) if rp != r else a
    g2d = pad(g)
    ctx2 = pad(ctx)
    x1h2 = pad(x1h)
    pre12 = pad(pre1)
    h2 = pad(h)
    x2h2 = pad(x2h)
    row = lambda w: pl.BlockSpec((block_r, w), lambda i: (i, 0))
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    in_specs = [
        row(d), row(d), row(d), row(m), row(m), row(d),
        full(d, d), full(d, m), full(m, d),
        full(1, d), full(1, d), full(1, d),
    ]
    inputs = [g2d, ctx2, x1h2, pre12, h2, x2h2, wo.astype(dt), w1.astype(dt),
              w2.astype(dt), s1.astype(jnp.float32)[None, :],
              g1.astype(jnp.float32)[None, :],
              s2.astype(jnp.float32)[None, :]]
    if seed_mode:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = [jnp.asarray(seed, jnp.int32).reshape(1)] + inputs
    elif has_dropout:
        in_specs += [row(d), row(d)]
        inputs += [pad(mask_a), pad(mask_f)]
    f32 = jnp.float32
    out_specs = [
        row(d), row(d),              # dxq, dctx (streamed)
        full(d, d), full(1, d),      # dwo, dbo (accumulated)
        full(1, d), full(1, d),      # ds1, dg1
        full(d, m), full(1, m),      # dw1, db1
        full(m, d), full(1, d),      # dw2, db2
        full(1, d), full(1, d),      # ds2, dg2
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rp, d), dt),
        jax.ShapeDtypeStruct((rp, d), dt),
        jax.ShapeDtypeStruct((d, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
        jax.ShapeDtypeStruct((d, m), f32),
        jax.ShapeDtypeStruct((1, m), f32),
        jax.ShapeDtypeStruct((m, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
        jax.ShapeDtypeStruct((1, d), f32),
    ]
    outs = pl.pallas_call(
        functools.partial(
            _block_bwd_kernel, rate=rate, eps=eps, has_dropout=has_dropout,
            seed_mode=seed_mode,
        ),
        grid=(rp // block_r,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # 2 d^2 dots + 4 d*m dots per row
            flops=2 * rp * (2 * d * d + 4 * d * m),
            bytes_accessed=(
                rp * (5 * d + 2 * m) * 2 + (d * d + 2 * d * m) * 2
                + (d * d + 2 * d * m) * 4
            ),
            transcendentals=rp * m,
        ),
        interpret=interpret,
    )(*inputs)
    (dxq, dctx, dwo, dbo, ds1, dg1, dw1, db1, dw2, db2, ds2, dg2) = outs
    return (dxq[:r], dctx[:r], dwo, dbo[0], ds1[0], dg1[0], dw1, db1[0],
            dw2, db2[0], ds2[0], dg2[0])


def _block_bwd_kernel(*refs, rate, eps, has_dropout, seed_mode=False):
    """Single-pass block backward; weight-grad outputs accumulate across
    the sequential row-block grid (constant index maps)."""
    rest = list(refs)
    seed_ref = rest.pop(0) if seed_mode else None
    (g_ref, ctx_ref, x1h_ref, pre1_ref, h_ref, x2h_ref,
     wo_ref, w1_ref, w2_ref, s1_ref, g1_ref, s2_ref) = rest[:12]
    rest = rest[12:]
    ma_ref = mf_ref = None
    if has_dropout and not seed_mode:
        ma_ref, mf_ref = rest[:2]
        rest = rest[2:]
    (dxq_ref, dctx_ref, dwo_ref, dbo_ref, ds1_ref, dg1_ref, dw1_ref,
     db1_ref, dw2_ref, db2_ref, ds2_ref, dg2_ref) = rest

    if seed_mode:
        # regenerate the forward's masks: same (seed, row-block) seeding,
        # same a-then-f draw order as _fwd_kernel
        keep_a, keep_f = _draw_block_masks(seed_ref, g_ref.shape, rate)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        ds1_ref[...] = jnp.zeros_like(ds1_ref)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        ds2_ref[...] = jnp.zeros_like(ds2_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)

    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    gf = g_ref[...].astype(jnp.float32)  # [R, D]
    s1 = s1_ref[...].astype(jnp.float32)  # [1, D]
    g1 = g1_ref[...].astype(jnp.float32)
    s2 = s2_ref[...].astype(jnp.float32)
    dt = dctx_ref.dtype

    # ffn LayerNorm backward (stats recomputed from x2h)
    xhat2, inv2 = _ln_stats(x2h_ref[...].astype(jnp.float32), eps)
    ds2_ref[...] += jnp.sum(gf * xhat2, axis=0, keepdims=True)
    dg2_ref[...] += jnp.sum(gf, axis=0, keepdims=True)
    du2 = _ln_bwd(gf, xhat2, inv2, s2)  # [R, D] fp32

    # FFN backward: x2h = x + dropout(h @ w2 + b2)
    if has_dropout:
        mf = keep_f.astype(jnp.float32) if seed_mode \
            else mf_ref[...].astype(jnp.float32)
        dlin2 = du2 * mf * inv_keep
    else:
        dlin2 = du2
    db2_ref[...] += jnp.sum(dlin2, axis=0, keepdims=True)
    dlin2_b = dlin2.astype(dt)
    p1 = pre1_ref[...].astype(jnp.float32)  # [R, M]
    hb = h_ref[...]  # the forward's exact bf16 gelu output
    dw2_ref[...] += jax.lax.dot_general(  # h^T dlin2 -> [M, D]
        hb, dlin2_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = jax.lax.dot_general(  # dlin2 w2^T -> [R, M]
        dlin2_b, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpre = dh * _gelu_grad(p1)
    db1_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    dpre_b = dpre.astype(dt)

    # attn LayerNorm: recompute xhat1 and x (the FFN input, bf16-rounded
    # exactly as the forward emitted it)
    xhat1, inv1 = _ln_stats(x1h_ref[...].astype(jnp.float32), eps)
    xb = (xhat1 * s1 + g1).astype(dt)
    dw1_ref[...] += jax.lax.dot_general(  # x^T dpre -> [D, M]
        xb, dpre_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx = du2 + jax.lax.dot_general(  # dpre w1^T -> [R, D]
        dpre_b, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds1_ref[...] += jnp.sum(dx * xhat1, axis=0, keepdims=True)
    dg1_ref[...] += jnp.sum(dx, axis=0, keepdims=True)
    du1 = _ln_bwd(dx, xhat1, inv1, s1)  # [R, D]
    dxq_ref[...] = du1.astype(dxq_ref.dtype)

    # attn_out projection backward
    if has_dropout:
        ma = keep_a.astype(jnp.float32) if seed_mode \
            else ma_ref[...].astype(jnp.float32)
        dlin1 = du1 * ma * inv_keep
    else:
        dlin1 = du1
    dbo_ref[...] += jnp.sum(dlin1, axis=0, keepdims=True)
    dlin1_b = dlin1.astype(dt)
    dctx_ref[...] = jax.lax.dot_general(  # dlin1 wo^T -> [R, D]
        dlin1_b, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    dwo_ref[...] += jax.lax.dot_general(  # ctx^T dlin1 -> [D, D]
        ctx_ref[...], dlin1_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------------------
# custom_vjp wrappers (dropout and no-dropout variants share the impl)
# --------------------------------------------------------------------------


def block_train(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2,
                mask_a=None, mask_f=None, rate: float = 0.0,
                eps: float = 1e-12, interpret: bool = False,
                dropout_seed=None):
    """Training post-attention block: XLA forward, one-kernel backward.

    x_q/ctx [..., D]; wo [D, D]; w1 [D, M]; w2 [M, D]; LN params [D];
    mask_a/mask_f: dropout keep-masks of x_q's shape (bool/int; required
    iff rate > 0 and no ``dropout_seed``), drawn by the caller so
    fwd/bwd/remat agree.  ``dropout_seed`` (int32 scalar) selects seed
    mode instead: both kernels regenerate the masks in-kernel
    (tpu.kernel_dropout) — the primal forward then also runs the Pallas
    kernel, so it requires a TPU backend (or interpret=True)."""
    if rate > 0.0 and dropout_seed is not None:
        return _block_seed(
            rate, eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1, w2,
            b2, s2, g2, jnp.asarray(dropout_seed, jnp.int32),
        )
    if rate > 0.0:
        return _block_do(
            rate, eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1, w2,
            b2, s2, g2, mask_a.astype(jnp.int8), mask_f.astype(jnp.int8),
        )
    return _block_nodo(eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1,
                       w2, b2, s2, g2)


def _flatten(a, d):
    return a.reshape(-1, d)


def _bwd_common(rate, eps, interpret, res, g, mask_a, mask_f):
    (wdt, ctx, x1h, pre1, h, x2h) = res
    d = ctx.shape[-1]
    has_dropout = rate > 0.0
    outs = _bwd_impl(
        _flatten(g, d), _flatten(ctx, d), _flatten(x1h, d),
        _flatten(pre1, pre1.shape[-1]), _flatten(h, h.shape[-1]),
        _flatten(x2h, d),
        *wdt,
        _flatten(mask_a, d) if has_dropout else None,
        _flatten(mask_f, d) if has_dropout else None,
        rate=rate, eps=eps, interpret=interpret, has_dropout=has_dropout,
        block_r=_block_r(),
    )
    (dxq, dctx, dwo, dbo, ds1, dg1, dw1, db1, dw2, db2, ds2, dg2) = outs
    dxq = dxq.reshape(g.shape).astype(g.dtype)
    dctx = dctx.reshape(g.shape).astype(ctx.dtype)
    return (dxq, dctx, dwo, dbo, ds1, dg1, dw1, db1, dw2, db2, ds2, dg2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _block_do(rate, eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1, w2,
              b2, s2, g2, mask_a, mask_f):
    return block_train_reference(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2,
                                 s2, g2, mask_a, mask_f, rate, eps)


def _block_do_fwd(rate, eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1,
                  w2, b2, s2, g2, mask_a, mask_f):
    y, (ctxb, x1h, pre1, h, x2h) = _forward_residuals_dispatch(
        x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2, mask_a, mask_f,
        rate, eps, interpret,
    )
    wdt = (wo, w1, w2, s1, g1, s2)
    return y, ((wdt, ctxb, x1h, pre1, h, x2h), mask_a, mask_f)


def _block_do_bwd(rate, eps, interpret, res, g):
    core, mask_a, mask_f = res
    grads = _bwd_common(rate, eps, interpret, core, g, mask_a, mask_f)
    zero_mask = lambda m: np.zeros(m.shape, dtype=jax.dtypes.float0)
    return grads + (zero_mask(mask_a), zero_mask(mask_f))


_block_do.defvjp(_block_do_fwd, _block_do_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _block_nodo(eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2,
                s2, g2):
    return block_train_reference(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2,
                                 s2, g2, rate=0.0, eps=eps)


def _block_nodo_fwd(eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1, w2,
                    b2, s2, g2):
    y, (ctxb, x1h, pre1, h, x2h) = _forward_residuals_dispatch(
        x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2, None, None,
        0.0, eps, interpret,
    )
    wdt = (wo, w1, w2, s1, g1, s2)
    return y, (wdt, ctxb, x1h, pre1, h, x2h)


def _block_nodo_bwd(eps, interpret, res, g):
    return _bwd_common(0.0, eps, interpret, res, g, None, None)


_block_nodo.defvjp(_block_nodo_fwd, _block_nodo_bwd)


# ---- seed mode: in-kernel PRNG dropout (tpu.kernel_dropout) --------------


def _seed_fwd_parts(rate, eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1,
                    w2, b2, s2, g2, seed):
    d = x_q.shape[-1]
    m = w1.shape[-1]
    dt = x_q.dtype
    shape = x_q.shape
    flat = lambda a, w: a.reshape(-1, w)
    y, x1h, pre1, h, x2h = _fwd_impl(
        flat(x_q, d), flat(ctx, d), wo, bo, s1, g1, w1, b1, w2, b2, s2,
        g2, None, None, rate=rate, eps=eps, interpret=interpret,
        has_dropout=True, block_r=_block_r(), seed=seed, seed_mode=True,
    )
    unflat = lambda a, w: a.reshape(shape[:-1] + (w,))
    return unflat(y, d), (
        ctx.astype(dt), unflat(x1h, d), unflat(pre1, m), unflat(h, m),
        unflat(x2h, d),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _block_seed(rate, eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1,
                w2, b2, s2, g2, seed):
    # the primal IS the fwd-rule kernel with the residual outputs DCE'd —
    # primal, recompute and backward all draw the same in-kernel stream
    y, _ = _seed_fwd_parts(rate, eps, interpret, x_q, ctx, wo, bo, s1, g1,
                           w1, b1, w2, b2, s2, g2, seed)
    return y


def _block_seed_fwd(rate, eps, interpret, x_q, ctx, wo, bo, s1, g1, w1,
                    b1, w2, b2, s2, g2, seed):
    y, (ctxb, x1h, pre1, h, x2h) = _seed_fwd_parts(
        rate, eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2,
        s2, g2, seed,
    )
    wdt = (wo, w1, w2, s1, g1, s2)
    return y, ((wdt, ctxb, x1h, pre1, h, x2h), seed)


def _block_seed_bwd(rate, eps, interpret, res, g):
    (wdt, ctx, x1h, pre1, h, x2h), seed = res
    d = ctx.shape[-1]
    _flat = _flatten
    outs = _bwd_impl(
        _flat(g, d), _flat(ctx, d), _flat(x1h, d),
        _flat(pre1, pre1.shape[-1]), _flat(h, h.shape[-1]),
        _flat(x2h, d), *wdt, None, None,
        rate=rate, eps=eps, interpret=interpret, has_dropout=True,
        block_r=_block_r(), seed=seed, seed_mode=True,
    )
    (dxq, dctx, dwo, dbo, ds1, dg1, dw1, db1, dw2, db2, ds2, dg2) = outs
    dxq = dxq.reshape(g.shape).astype(g.dtype)
    dctx = dctx.reshape(g.shape).astype(ctx.dtype)
    return (dxq, dctx, dwo, dbo, ds1, dg1, dw1, db1, dw2, db2, ds2, dg2,
            np.zeros((), dtype=jax.dtypes.float0))


_block_seed.defvjp(_block_seed_fwd, _block_seed_bwd)


def block_bwd_kernel_ok(d: int, m: int) -> bool:
    return d % _LANE == 0 and m % _LANE == 0
