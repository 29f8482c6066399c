"""Multi-head attention core, shared by every transformer in the framework.

Single implementation behind a stable signature so the jnp einsum path can be
swapped for the fused Pallas kernel (vitxtgqa_tpu/ops/pallas_attention.py)
without touching model code.  The reference instead instantiates HF
BertEncoder stacks per model file (reference: t2s.py:548-633 etc.).

All matmuls carry `preferred_element_type=float32` so bf16 activations
accumulate in fp32 on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Kernel-engagement floor on the key length.  Tuned on the v5e: at the
# framework's full joint length (1152) the flash kernel wins 15-27x; at
# the compact-serving length (384, batch 576) it still wins ~3x over the
# XLA fallback (which materialises [B, H, L, L] probs); far below that
# the XLA fused path is fine and kernel launch overhead dominates.
_PALLAS_MIN_KV = 256
_GLOBAL_USE_PALLAS = False
_GLOBAL_DECODE_PALLAS = True  # decode-step kernel rides the use_pallas gate
_SP = (None, "sp")  # (mesh, axis) for sequence-parallel attention


def set_use_pallas(enabled: bool) -> None:
    """Process-wide switch (config: training_parameters.tpu.use_pallas)."""
    global _GLOBAL_USE_PALLAS
    _GLOBAL_USE_PALLAS = bool(enabled)


def set_decode_pallas(enabled: bool) -> None:
    """A/B switch for the decode-step kernel alone (BENCH_DECODE_KERNEL);
    only takes effect when the pallas path is on at all."""
    global _GLOBAL_DECODE_PALLAS
    _GLOBAL_DECODE_PALLAS = bool(enabled)


def pallas_enabled(use_pallas: bool = False) -> bool:
    """True when the pallas kernel family is switched on (per-module flag
    or the process-wide set_use_pallas)."""
    return use_pallas or _GLOBAL_USE_PALLAS


_GLOBAL_W8A8 = False


def set_w8a8(enabled: bool) -> None:
    """Int8 W8A8 serving mode (config: training_parameters.tpu.w8a8,
    BENCH_W8A8): the fused post-attention block runs its three matmuls
    int8xint8 on the MXU (2x bf16 peak on v5e) with per-token activation
    scales and per-output-channel weight scales.  Eval-only; adds ~0.5-1%
    relative error per layer on top of bf16 — exact-parity runs must turn
    it off (same policy as the int8 KV cache), and production use should
    be validated against real checkpoints.  Measured on the v5e at batch
    576 (same-process interleaved A/B, tools/ab_w8a8.py): 1041 vs 956
    videos/s (+8.9%).  Trace-time flag: set BEFORE the eval step is first
    compiled (same caveat as set_kv_cache_int8)."""
    global _GLOBAL_W8A8
    _GLOBAL_W8A8 = bool(enabled)


def w8a8_enabled() -> bool:
    return _GLOBAL_W8A8


def _on_tpu() -> bool:
    """Mosaic kernels lower only on TPU backends (the axon tunnel proxies
    one); CPU/virtual-device runs silently use the XLA path instead."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def set_sequence_parallel(mesh, axis: str = "sp") -> None:
    """Route every full-sequence mha through the sp shard_map formulation
    (config: training_parameters.tpu.sequence_parallel).  Pass mesh=None to
    disable.  Sequences not divisible by the axis size fall through to the
    local path."""
    global _SP
    _SP = (mesh, axis)


def quantize_kv(x: jax.Array, num_heads: int = 0):
    """[B, L, H*D] -> (int8 [B, L, H*D], scales [B, L] f32).

    Symmetric per-token quantization for the int8 decode cache (config:
    training_parameters.tpu.kv_cache_int8 — halves the decode loop's HBM
    reads).  Per-token (not per-head) scales on purpose: a per-head
    reshape to [.., H, 64] puts a 64-wide dim minor, and XLA materialises
    3.57GB of layout-conversion temps per call at full-eval dims; the
    per-token lane-wise reduce stays in the native layout.  num_heads is
    accepted for signature stability and unused.

    The amax reduce runs in the input dtype so the f32 cast feeds ONLY
    the divide: single-use, it fuses into the cast+div+round+int8 kernel
    instead of materialising an f32 copy of the whole cache (profiled at
    13.5 ms of convert_element_type per serving step at batch 576).  A
    bf16 amax is within 0.4% of exact; dequantize uses the same scale so
    the roundtrip error stays bounded by the int8 step — the clip guards
    the ±0.4% overshoot."""
    amax = jnp.max(jnp.abs(x), axis=-1).astype(jnp.float32)  # [B, L]
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q8 = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q8, scale


def dequantize_kv(q8: jax.Array, scales: jax.Array, num_heads: int = 0,
                  dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_kv (the XLA-fallback path)."""
    return (q8.astype(jnp.float32) * scales[..., None]).astype(dtype)


def decode_mha(
    q_raw: jax.Array,  # [B, 1, H*D] raw query projection (pre-split)
    k_raw,  # [B, L, H*D] unified decode cache, or (int8, scales) tuple
    v_raw,  # [B, L, H*D] or (int8, scales)
    spec,  # masks.DecodeStepSpec (or additive bias for the fallback)
    num_heads: int,
    use_pallas: bool = False,
) -> jax.Array:
    """One cached decode step in merged-head layout; returns [B, 1, H*D].

    The merged minor dim (H*D lanes) is what keeps the Pallas path
    zero-copy: per-head [.., 64] operands forced XLA layout-conversion
    temps the size of the whole cache (4.08GB at full-eval dims).  On
    non-TPU backends (or with the kernel toggled off) the heads split on
    the fly and run the XLA path with identical semantics.  An int8 cache
    arrives as (values, scales) tuples (see quantize_kv).
    """
    from vitxtgqa_tpu.ops.masks import DecodeStepSpec

    quantized = isinstance(k_raw, tuple)
    cache_len = (k_raw[0] if quantized else k_raw).shape[1]
    pallas_ok = (
        isinstance(spec, DecodeStepSpec)
        and (use_pallas or _GLOBAL_USE_PALLAS)
        and _GLOBAL_DECODE_PALLAS
        # a quantized cache must ALWAYS take the kernel: the XLA fallback
        # dequantizes the whole cache every step AND the dequant read
        # keeps the int8 buffers live across the scan's cache update,
        # forcing a full-cache copy per step (profiled at 104+56 ms per
        # eval step at compact-serving dims before this bypass)
        and (quantized or cache_len >= _PALLAS_MIN_KV)
        and _on_tpu()
    )
    if pallas_ok:
        if quantized:
            from vitxtgqa_tpu.ops.pallas_attention import (
                decode_attention_int8,
            )

            return decode_attention_int8(
                q_raw, k_raw[0], k_raw[1], v_raw[0], v_raw[1],
                spec.key_mask, spec.step, spec.write_offset, num_heads,
            )
        from vitxtgqa_tpu.ops.pallas_attention import decode_attention

        return decode_attention(
            q_raw, k_raw, v_raw, spec.key_mask, spec.step,
            spec.write_offset, num_heads,
        )
    if quantized:
        k_raw = dequantize_kv(*k_raw, num_heads, dtype=q_raw.dtype)
        v_raw = dequantize_kv(*v_raw, num_heads, dtype=q_raw.dtype)
    bias = spec.to_bias() if isinstance(spec, DecodeStepSpec) else spec
    ctx = mha(
        split_heads(q_raw, num_heads),
        split_heads(k_raw, num_heads),
        split_heads(v_raw, num_heads),
        bias,
    )
    return merge_heads(ctx)


def mha_merged(
    q_raw: jax.Array,  # [B, L, H*D] raw query projection (pre-split)
    k_raw: jax.Array,  # [B, L, H*D]
    v_raw: jax.Array,  # [B, L, H*D]
    bias,  # masks.MaskSpec, or additive bias for the fallback
    num_heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Full-sequence attention in merged-head layout; returns [B, L, H*D].

    The zero-transpose fast path: with a MaskSpec, no dropout, and the
    Pallas gate on, operands go straight to flash_attention_merged (heads
    slice from lanes in VMEM — no split/merge_heads transposes, profiled
    at ~12ms per layer at batch 384).  Dropout, sequence-parallel, and
    non-TPU cases split heads on the fly and take the mha path with
    identical semantics.
    """
    from vitxtgqa_tpu.ops.masks import MaskSpec

    sp_active = (
        _SP[0] is not None
        and dropout_rate == 0.0
        and q_raw.shape[1] % _SP[0].shape[_SP[1]] == 0
    )
    if (
        isinstance(bias, MaskSpec)
        and not sp_active
        and (use_pallas or _GLOBAL_USE_PALLAS)
        and k_raw.shape[1] >= _PALLAS_MIN_KV
        and _on_tpu()
    ):
        from vitxtgqa_tpu.ops.pallas_attention import flash_attention_merged

        if dropout_rate > 0.0 and dropout_rng is not None:
            seed = jax.random.randint(
                dropout_rng, (), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32,
            )
            return flash_attention_merged(
                q_raw, k_raw, v_raw, bias.key_mask, bias.dec_len, num_heads,
                dropout_rate=dropout_rate, dropout_seed=seed,
            )
        return flash_attention_merged(
            q_raw, k_raw, v_raw, bias.key_mask, bias.dec_len, num_heads
        )
    ctx = mha(
        split_heads(q_raw, num_heads),
        split_heads(k_raw, num_heads),
        split_heads(v_raw, num_heads),
        bias,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        use_pallas=use_pallas,
    )
    return merge_heads(ctx)


def mha_merged_quantize(
    q_raw: jax.Array,  # [B, L, H*D]
    k_raw: jax.Array,
    v_raw: jax.Array,
    bias,  # masks.MaskSpec, or additive bias for the fallback
    num_heads: int,
    use_pallas: bool = False,
):
    """mha_merged (eval path, no dropout) fused with int8 cache emission.

    Returns (ctx, (k8, ks), (v8, vs)): the attention output plus the
    quantize_kv-layout int8 decode cache of this layer's K/V.  On the
    Pallas path the quantization happens inside the flash kernel from the
    K/V tiles already resident in VMEM; elsewhere it falls back to
    mha_merged + quantize_kv with identical (bit-exact) results.

    NOT the default: the fused emission measured 75.6 vs 73.7 ms per
    layer-call on the v5e (see flash_attention_merged_q8), so the decode
    harness runs the separate quantize_cache pass instead.
    """
    from vitxtgqa_tpu.ops.masks import MaskSpec

    sp_active = (
        _SP[0] is not None
        and q_raw.shape[1] % _SP[0].shape[_SP[1]] == 0
    )
    if (
        isinstance(bias, MaskSpec)
        and not sp_active
        and (use_pallas or _GLOBAL_USE_PALLAS)
        and k_raw.shape[1] >= _PALLAS_MIN_KV
        and _on_tpu()
    ):
        from vitxtgqa_tpu.ops.pallas_attention import (
            flash_attention_merged_q8,
        )

        return flash_attention_merged_q8(
            q_raw, k_raw, v_raw, bias.key_mask, bias.dec_len, num_heads
        )
    ctx = mha_merged(q_raw, k_raw, v_raw, bias, num_heads,
                     use_pallas=use_pallas)
    return ctx, quantize_kv(k_raw), quantize_kv(v_raw)


def mha(
    q: jax.Array,  # [B, H, Lq, Dh]
    k: jax.Array,  # [B, H, Lk, Dh]
    v: jax.Array,  # [B, H, Lk, Dh]
    bias=None,  # array broadcastable to [B, H, Lq, Lk], or a masks.MaskSpec
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Scaled dot-product attention; returns [B, H, Lq, Dh]."""
    from vitxtgqa_tpu.ops.masks import DecodeStepSpec, MaskSpec

    if isinstance(bias, DecodeStepSpec):
        # split-head callers get the XLA semantics; the zero-copy Pallas
        # decode path lives in decode_mha (merged-head layout)
        bias = bias.to_bias()

    if (
        _SP[0] is not None
        and dropout_rate == 0.0
        and q.shape[2] == k.shape[2]
        and q.shape[2] % _SP[0].shape[_SP[1]] == 0
    ):
        from vitxtgqa_tpu.parallel.sequence_parallel import sp_attention

        return sp_attention(q, k, v, bias, _SP[0], _SP[1])

    pallas_ok = (
        (use_pallas or _GLOBAL_USE_PALLAS)
        and k.shape[2] >= _PALLAS_MIN_KV
        and q.shape[2] > 1
        and _on_tpu()
    )
    if isinstance(bias, MaskSpec):
        if pallas_ok and q.shape[2] == k.shape[2]:
            from vitxtgqa_tpu.ops.pallas_attention import flash_attention

            if dropout_rate > 0.0 and dropout_rng is not None:
                # fold the key into an int32 seed for the in-kernel PRNG
                seed = jax.random.randint(
                    dropout_rng, (), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
                return flash_attention(
                    q, k, v, bias.key_mask, bias.dec_len,
                    dropout_rate=dropout_rate, dropout_seed=seed,
                )
            return flash_attention(q, k, v, bias.key_mask, bias.dec_len)
        bias = bias.to_bias()
    elif pallas_ok and dropout_rate == 0.0:
        from vitxtgqa_tpu.ops.pallas_attention import fused_attention

        return fused_attention(q, k, v, bias)
    if dropout_rate == 0.0:
        # jax.nn.dot_product_attention exposes the attention pattern to XLA's
        # fused lowering (no [B,H,L,L] probs in HBM when the backend fuses);
        # it expects [B, L, H, D] layout
        out = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            bias=bias,
            implementation="xla",
        )
        return out.transpose(0, 2, 1, 3)
    return mha_reference(q, k, v, bias, dropout_rate, dropout_rng)


def mha_reference(q, k, v, bias=None, dropout_rate=0.0, dropout_rng=None):
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(v.dtype)


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, L, D] -> [B, H, L, D/H]."""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, L, Dh] -> [B, L, D]."""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)
