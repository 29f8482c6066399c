"""Fused transformer FFN kernel (Pallas/Mosaic TPU).

``fused_ffn(x, w1, b1, w2, b2)`` computes
``gelu(x @ w1 + b1) @ w2 + b2`` with the [rows, intermediate] activation
kept in VMEM: XLA's unfused chain writes the 3072-wide gelu activation to
HBM and reads it back (2.7GB each way at serving dims) — the fused kernel
holds one row-block of it on-chip with both weight matrices resident.
Measured 28.1ms vs 38.8ms per layer at [384*1152, 768->3072->768] bf16 on
v5e (1.38x, same session).

gelu uses the Abramowitz-Stegun 7.1.26 erf approximation (max abs error
1.5e-7 — two orders below bf16 resolution; Mosaic has no erf primitive).
The reference's BertIntermediate uses exact-erf gelu
(reference: pythia/models/t2s.py:548-633 via BertLayer); the deviation is
documented here and bounded well under the bf16 compute noise.

Differentiable via jax.custom_vjp: the backward recomputes through the
plain XLA reference expression (jax.vjp), so gradients are exactly the
unfused graph's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# measured fastest at serving dims (256/1024 within noise); intermediate
# block is [block_r, 3072] fp32 = 6.3MB VMEM
_BLOCK_R = 512


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
        + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(x):
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]  # [R, D]
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = _gelu(h).astype(x.dtype)  # [R, M] — never leaves VMEM
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def ffn_reference(x, w1, b1, w2, b2):
    """The unfused expression (and the VJP rule for the fused kernel)."""
    h = jax.nn.gelu(
        (jnp.dot(x, w1.astype(x.dtype)) + b1).astype(x.dtype),
        approximate=False,
    )
    return (jnp.dot(h, w2.astype(x.dtype)) + b2).astype(x.dtype)


def fused_ffn(x, w1, b1, w2, b2, interpret: bool = False):
    """x [..., D]; w1 [D, M]; b1 [M]; w2 [M, D2]; b2 [D2] -> [..., D2]."""
    return _ffn_vjp(interpret, x, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ffn_vjp(interpret, x, w1, b1, w2, b2):
    return _ffn_impl(x, w1, b1, w2, b2, interpret)


def _ffn_fwd(interpret, x, w1, b1, w2, b2):
    return _ffn_impl(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _ffn_bwd(interpret, res, g):
    _, vjp = jax.vjp(ffn_reference, *res)
    return vjp(g)


_ffn_vjp.defvjp(_ffn_fwd, _ffn_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ffn_impl(x, w1, b1, w2, b2, interpret: bool = False):
    orig_shape = x.shape
    d = orig_shape[-1]
    m = w1.shape[1]
    d2 = w2.shape[1]
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    x2 = x.reshape(-1, d)
    r = x2.shape[0]
    rp = (r + _BLOCK_R - 1) // _BLOCK_R * _BLOCK_R
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
    out = pl.pallas_call(
        _ffn_kernel,
        grid=(rp // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
            pl.BlockSpec((d, m), lambda i: (0, 0)),  # resident
            pl.BlockSpec((m,), lambda i: (0,)),
            pl.BlockSpec((m, d2), lambda i: (0, 0)),  # resident
            pl.BlockSpec((d2,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_R, d2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, d2), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * m * (d + d2),
            bytes_accessed=(
                rp * (d + d2) + m * (d + d2)
            ) * x.dtype.itemsize,
            transcendentals=rp * m,
        ),
        interpret=interpret,
    )(x2, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32))
    return out[:r].reshape(*orig_shape[:-1], d2)


def ffn_kernel_ok(d: int, m: int, rows: int) -> bool:
    """Shapes the fused kernel accepts profitably: lane-aligned dims and
    enough rows to amortise the resident weight DMA."""
    return d % _LANE == 0 and m % _LANE == 0 and rows >= 2048


# ---------------------------------------------------------------------------
# W8A8 int8 fused block: per-token activation scales x per-channel weight
# scales, int8xint8 MXU matmuls (2x bf16 peak on v5e)
# ---------------------------------------------------------------------------


def _quant_rows(x):
    """[R, D] -> (int8 [R, D], f32 scales [R, 1]); symmetric per-row.

    The amax reduce runs in the input dtype on purpose (same rationale as
    ops.attention.quantize_kv: a single-use f32 cast fuses into its
    consumer instead of materialising an f32 copy)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax.astype(jnp.float32), 1e-6) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_weight(w):
    """[D, M] -> (int8 [D, M], f32 per-output-channel scales [M])."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return q, scale


def _dot_w8a8(x, w8, w_scale):
    """Quantize x per row, int8 matmul, rescale: ~ x @ (w8 * w_scale)."""
    xq, xs = _quant_rows(x)
    acc = jax.lax.dot_general(
        xq, w8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * w_scale


# ---------------------------------------------------------------------------
# fused post-attention block: attn_out -> +residual -> LN -> FFN -> +res -> LN
# ---------------------------------------------------------------------------


def _ln(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mu) * inv * scale + bias


def _block_kernel(xq_ref, ctx_ref, wo_ref, bo_ref, s1_ref, g1_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, s2_ref, g2_ref, o_ref,
                  *, eps):
    xq = xq_ref[...].astype(jnp.float32)  # [R, D]
    attn = jax.lax.dot_general(
        ctx_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[...].astype(jnp.float32)
    x = _ln(xq + attn, s1_ref[...].astype(jnp.float32),
            g1_ref[...].astype(jnp.float32), eps)  # [R, D] fp32
    xb = x.astype(o_ref.dtype)
    h = jax.lax.dot_general(
        xb, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = _gelu(h).astype(o_ref.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    out = _ln(x + y, s2_ref[...].astype(jnp.float32),
              g2_ref[...].astype(jnp.float32), eps)
    o_ref[...] = out.astype(o_ref.dtype)


def block_reference(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2,
                    eps=1e-12):
    """Unfused expression of TransformerLayer._finish (eval: no dropout);
    also the VJP rule for the fused kernel."""
    dt = x_q.dtype
    attn = (jnp.dot(ctx, wo.astype(dt)) + bo).astype(dt)
    x = _ln((x_q + attn).astype(jnp.float32), s1, g1, eps).astype(dt)
    h = jax.nn.gelu(
        (jnp.dot(x, w1.astype(dt)) + b1).astype(dt), approximate=False
    )
    ffn = (jnp.dot(h, w2.astype(dt)) + b2).astype(dt)
    return _ln((x + ffn).astype(jnp.float32), s2, g2, eps).astype(dt)


def fused_block(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2,
                eps: float = 1e-12, interpret: bool = False):
    """x_q/ctx [..., D] (pre-attention input and attention context);
    full post-attention block in one kernel — the separate attn_out
    matmul, two LayerNorm op clusters, and the gelu intermediate HBM
    round-trips profiled at ~20ms/layer at batch 384 on top of the FFN."""
    return _block_vjp(eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1,
                      w2, b2, s2, g2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _block_vjp(eps, interpret, x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2,
               s2, g2):
    return _block_impl(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2,
                       eps, interpret)


def _block_fwd(eps, interpret, *args):
    return _block_impl(*args, eps, interpret), args


def _block_bwd(eps, interpret, res, g):
    _, vjp = jax.vjp(functools.partial(block_reference, eps=eps), *res)
    return vjp(g)


_block_vjp.defvjp(_block_fwd, _block_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _block_impl(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2,
                eps: float = 1e-12, interpret: bool = False):
    orig_shape = x_q.shape
    d = orig_shape[-1]
    m = w1.shape[1]
    dt = x_q.dtype
    x2 = x_q.reshape(-1, d)
    c2 = ctx.reshape(-1, d).astype(dt)
    r = x2.shape[0]
    rp = (r + _BLOCK_R - 1) // _BLOCK_R * _BLOCK_R
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
        c2 = jnp.pad(c2, ((0, rp - r), (0, 0)))
    f32 = lambda a: a.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_block_kernel, eps=eps),
        grid=(rp // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),  # resident
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, m), lambda i: (0, 0)),  # resident
            pl.BlockSpec((m,), lambda i: (0,)),
            pl.BlockSpec((m, d), lambda i: (0, 0)),  # resident
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, d), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * (d * d + 2 * d * m),
            bytes_accessed=(3 * rp * d + d * d + 2 * d * m) * 2,
            transcendentals=rp * m,
        ),
        interpret=interpret,
    )(x2, c2, wo.astype(dt), f32(bo), f32(s1), f32(g1), w1.astype(dt),
      f32(b1), w2.astype(dt), f32(b2), f32(s2), f32(g2))
    return out[:r].reshape(orig_shape)


_TANH_EPILOGUE = True


def set_tanh_epilogue(enabled: bool) -> None:
    """Trace-time A/B knob: route the T2S QTV joint residual through the
    fused_block_tanh kernel (True, default) or compute res + tanh(h) as a
    separate XLA elementwise pass after the plain fused_block (False).
    Set before the eval step is first compiled (jit caches key on input
    avals only, like set_use_pallas)."""
    global _TANH_EPILOGUE
    _TANH_EPILOGUE = bool(enabled)


def tanh_epilogue_enabled() -> bool:
    return _TANH_EPILOGUE


def _block_tanh_kernel(res_ref, xq_ref, ctx_ref, wo_ref, bo_ref, s1_ref,
                       g1_ref, w1_ref, b1_ref, w2_ref, b2_ref, s2_ref,
                       g2_ref, o_ref, *, eps):
    """_block_kernel with the QTV tanh-residual epilogue fused in:
    out = res + tanh(block(x_q, ctx)).  Saves the separate elementwise
    pass over the [B, L, D] joint buffer (read res + read h + write,
    ~10.8 ms at serving batch 576)."""
    xq = xq_ref[...].astype(jnp.float32)  # [R, D]
    attn = jax.lax.dot_general(
        ctx_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[...].astype(jnp.float32)
    x = _ln(xq + attn, s1_ref[...].astype(jnp.float32),
            g1_ref[...].astype(jnp.float32), eps)  # [R, D] fp32
    xb = x.astype(o_ref.dtype)
    h = jax.lax.dot_general(
        xb, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = _gelu(h).astype(o_ref.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    out = _ln(x + y, s2_ref[...].astype(jnp.float32),
              g2_ref[...].astype(jnp.float32), eps)
    # round to the output dtype BEFORE the tanh, exactly like the unfused
    # path (the layer emits bf16, then the model computes res + tanh(h))
    yb = out.astype(o_ref.dtype)
    t = jnp.tanh(yb.astype(jnp.float32))
    o_ref[...] = (res_ref[...].astype(jnp.float32) + t).astype(o_ref.dtype)


def block_tanh_reference(res, x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2,
                         s2, g2, eps=1e-12):
    """Unfused oracle: literally res + tanh(block_reference(...)), the
    model expression at models/t2s.py _apply_qtv."""
    h = block_reference(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2,
                        eps=eps)
    return res + jnp.tanh(h)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_block_tanh(res, x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2,
                     g2, eps: float = 1e-12, interpret: bool = False):
    """fused_block + `res + tanh(out)` epilogue (T2S QTV joint residual,
    models/t2s.py _apply_qtv).  Eval-only — no VJP is defined (the
    training path computes the residual in XLA where remat handles it)."""
    orig_shape = x_q.shape
    d = orig_shape[-1]
    m = w1.shape[1]
    dt = x_q.dtype
    x2 = x_q.reshape(-1, d)
    c2 = ctx.reshape(-1, d).astype(dt)
    r2 = res.reshape(-1, d).astype(dt)
    r = x2.shape[0]
    rp = (r + _BLOCK_R - 1) // _BLOCK_R * _BLOCK_R
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
        c2 = jnp.pad(c2, ((0, rp - r), (0, 0)))
        r2 = jnp.pad(r2, ((0, rp - r), (0, 0)))
    f32 = lambda a: a.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_block_tanh_kernel, eps=eps),
        grid=(rp // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),  # resident
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, m), lambda i: (0, 0)),  # resident
            pl.BlockSpec((m,), lambda i: (0,)),
            pl.BlockSpec((m, d), lambda i: (0, 0)),  # resident
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, d), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * (d * d + 2 * d * m),
            bytes_accessed=(4 * rp * d + d * d + 2 * d * m) * 2,
            transcendentals=rp * (m + d),
        ),
        interpret=interpret,
    )(r2, x2, c2, wo.astype(dt), f32(bo), f32(s1), f32(g1), w1.astype(dt),
      f32(b1), w2.astype(dt), f32(b2), f32(s2), f32(g2))
    return out[:r].reshape(orig_shape)


def _block_w8a8_kernel(xq_ref, ctx_ref, wo_ref, wos_ref, bo_ref, s1_ref,
                       g1_ref, w1_ref, w1s_ref, b1_ref, w2_ref, w2s_ref,
                       b2_ref, s2_ref, g2_ref, o_ref, *, eps):
    xq = xq_ref[...].astype(jnp.float32)  # [R, D]
    attn = _dot_w8a8(
        ctx_ref[...], wo_ref[...], wos_ref[...]
    ) + bo_ref[...].astype(jnp.float32)
    x = _ln(xq + attn, s1_ref[...].astype(jnp.float32),
            g1_ref[...].astype(jnp.float32), eps)  # [R, D] fp32
    h = _gelu(
        _dot_w8a8(x, w1_ref[...], w1s_ref[...])
        + b1_ref[...].astype(jnp.float32)
    )
    y = _dot_w8a8(h, w2_ref[...], w2s_ref[...]) + b2_ref[...].astype(
        jnp.float32
    )
    out = _ln(x + y, s2_ref[...].astype(jnp.float32),
              g2_ref[...].astype(jnp.float32), eps)
    o_ref[...] = out.astype(o_ref.dtype)


def block_w8a8_reference(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2,
                         eps=1e-12):
    """The exact quantized math of the W8A8 kernel in plain XLA (weight
    quantization included) — the numeric oracle for the kernel and the
    non-TPU fallback when w8a8 is forced on."""
    f32 = jnp.float32
    wo8, wos = quantize_weight(wo)
    w18, w1s = quantize_weight(w1)
    w28, w2s = quantize_weight(w2)
    shape = x_q.shape
    d = shape[-1]
    xq2 = x_q.reshape(-1, d).astype(f32)
    c2 = ctx.reshape(-1, d)
    attn = _dot_w8a8(c2, wo8, wos) + bo.astype(f32)
    x = _ln(xq2 + attn, s1.astype(f32), g1.astype(f32), eps)
    h = _gelu(_dot_w8a8(x, w18, w1s) + b1.astype(f32))
    y = _dot_w8a8(h, w28, w2s) + b2.astype(f32)
    out = _ln(x + y, s2.astype(f32), g2.astype(f32), eps)
    return out.astype(x_q.dtype).reshape(shape)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_block_w8a8(x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2,
                     eps: float = 1e-12, interpret: bool = False):
    """W8A8 variant of fused_block: all three matmuls run int8xint8 on the
    MXU (2x bf16 peak on v5e) with per-token activation scales quantized
    in-VMEM and per-output-channel weight scales folded into the f32
    epilogue.  Weight quantization happens here per call — [D, M]
    elementwise work, noise next to the [rows, M] matmuls it feeds.

    Eval-only and OPT-IN (training_parameters.tpu.w8a8 /
    ops.attention.set_w8a8): int8 activations add ~0.5-1% relative error
    per layer on top of bf16, which greedy decode tolerates on synthetic
    checks (see tests/test_w8a8.py) but which must be validated against
    real checkpoints before production use.  Quantized math is shared
    bit-for-bit with block_w8a8_reference."""
    orig_shape = x_q.shape
    d = orig_shape[-1]
    m = w1.shape[1]
    dt = x_q.dtype
    wo8, wos = quantize_weight(wo)
    w18, w1s = quantize_weight(w1)
    w28, w2s = quantize_weight(w2)
    x2 = x_q.reshape(-1, d)
    c2 = ctx.reshape(-1, d).astype(dt)
    r = x2.shape[0]
    rp = (r + _BLOCK_R - 1) // _BLOCK_R * _BLOCK_R
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
        c2 = jnp.pad(c2, ((0, rp - r), (0, 0)))
    f32 = lambda a: a.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_block_w8a8_kernel, eps=eps),
        grid=(rp // _BLOCK_R,),
        in_specs=[
            pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),  # resident int8
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, m), lambda i: (0, 0)),  # resident int8
            pl.BlockSpec((m,), lambda i: (0,)),
            pl.BlockSpec((m,), lambda i: (0,)),
            pl.BlockSpec((m, d), lambda i: (0, 0)),  # resident int8
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_R, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, d), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * (d * d + 2 * d * m),
            bytes_accessed=3 * rp * d * 2 + d * d + 2 * d * m,
            transcendentals=rp * m,
        ),
        interpret=interpret,
    )(x2, c2, wo8, f32(wos), f32(bo), f32(s1), f32(g1), w18, f32(w1s),
      f32(b1), w28, f32(w2s), f32(b2), f32(s2), f32(g2))
    return out[:r].reshape(orig_shape)
