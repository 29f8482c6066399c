"""Single-kernel decode step: all MMT layers of one greedy-decode step in
ONE pallas_call.

Motivation (BASELINE.md / VERDICT r2 #6): batch-1..48 serving latency is
launch-bound — the per-step decode dispatches ~30 XLA/Pallas kernels
(per layer: K/V/Q GEMVs, quantize, 4 cache DUS, the int8 decode-attention
kernel, and the unfused post-attention block ops at small row counts).
This kernel folds one full decode step over every MMT layer into a single
launch: per (layer, batch-row) grid program it computes the Q/K/V GEMVs,
quantizes the new K/V row (bit-matching ops.attention.quantize_kv), runs
the masked int8 attention over the unified cache with the current token
substituted in-register, and applies the whole post-attention block
(attn_out + LN + FFN + LN, mirroring ops.pallas_ffn._block_kernel).  The
cross-layer activation rides in a VMEM scratch buffer; layer weights are
grid-resident (re-fetched once per layer, not per row).  The caller then
commits the returned quantized rows with ONE dynamic_update_slice per
cache array (packed K|V values + packed scales), so a 3-layer step is
3 launches total (kernel + 2 DUS) instead of ~30.

Cache layout (fused_decode_prep): the per-layer ((k8, ks), (v8, vs))
int8 caches pack into
  kv8   [n_layers, B, Lcache, 2*H*D] int8   (K in lanes [:HD], V in [HD:])
  kvs   [n_layers, B, 2, Lcache]     f32    (row 0 = K scales, 1 = V)
Lcache is already a lane multiple (models/base.JointQAModel._enc_row_pad).

Reference behaviour being reproduced: the reference re-runs the full MMT
per greedy step (/root/reference/pythia/models/t2s.py:315-354); this is
the TPU-native KV-cached redesign of that loop with the per-step work in
one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic has no erf lowering — reuse the fused-FFN kernel's
# Abramowitz-Stegun erf/gelu (max abs err 1.5e-7, same numerics as the
# fused_block kernel this kernel replaces on the decode path)
from vitxtgqa_tpu.ops.pallas_ffn import _gelu

_NEG = -1e30


def _ln(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mu) * inv * scale + bias


def _fused_step_kernel(
    step_ref,  # SMEM [1] int32: decoder position t
    x_ref,     # [bb, 1, D] bf16 — step input (read at layer 0 only)
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,  # [1, D, D]/[1, 1, D]
    wo_ref, bo_ref, s1_ref, g1_ref,                   # attn_out + LN1
    w1_ref, b1_ref, w2_ref, b2_ref, s2_ref, g2_ref,   # FFN + LN2
    kv8_ref,   # [1, bb, Lp, 2*HD] int8 — packed K|V cache rows
    kvs_ref,   # [1, bb, 2, Lp] f32 — packed K/V per-token scales
    mask_ref,  # [bb, 1, Lp] f32 — encoder key mask (padded)
    y_ref,     # out [bb, 1, D] bf16 — final layer's activation
    row8_ref,  # out [1, bb, 1, 2*HD] int8 — quantized K|V rows
    rowsc_ref,  # out [1, bb, 2, 1] f32 — K/V scales
    x_scr,     # VMEM scratch [B, D] f32 — cross-layer activation carry
    *, scale, write_offset, num_heads, head_dim, eps, block_b,
):
    l = pl.program_id(0)
    bi = pl.program_id(1)
    bb = block_b
    step = step_ref[0]
    pos = write_offset + step
    hd = head_dim
    hd_total = num_heads * head_dim

    # ---- layer input: the step input at layer 0, scratch carry after ----
    # the scratch is f32: dynamic sublane indexing on a 16-bit memref needs
    # a provably even row index (bf16 packs 2 rows per sublane tile) —
    # f32 rows are unpacked, and bf16 -> f32 -> bf16 is lossless
    x_in = x_ref[:, 0, :]  # [bb, D]
    x_carry = x_scr[pl.ds(bi * bb, bb), :]  # [bb, D] (uninit at l == 0)
    xv = jnp.where(l == 0, x_in, x_carry.astype(x_in.dtype)).astype(
        x_in.dtype
    )

    # ---- Q/K/V projections (weights grid-resident per layer; bb rows
    # amortise the MXU's weight-tile march) ----
    f32 = jnp.float32
    dot = lambda a, w: jax.lax.dot_general(
        a, w[0], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    q = (dot(xv, wq_ref) + bq_ref[0].astype(f32)).astype(xv.dtype)  # [bb,HD]
    k_t = (dot(xv, wk_ref) + bk_ref[0].astype(f32)).astype(xv.dtype)
    v_t = (dot(xv, wv_ref) + bv_ref[0].astype(f32)).astype(xv.dtype)

    # ---- quantize the new K/V rows (ops.attention.quantize_kv semantics:
    # amax reduced in the input dtype, f32 scale, clip to ±127) ----
    def quant(rows):
        # keep reductions 2D: Mosaic cannot squeeze a bf16 scalar
        amax = jnp.max(jnp.abs(rows), axis=-1, keepdims=True).astype(f32)
        sc = jnp.maximum(amax, 1e-6) / 127.0  # [bb, 1] f32
        q8 = jnp.clip(
            jnp.round(rows.astype(f32) / sc), -127.0, 127.0
        ).astype(jnp.int8)
        return q8, sc

    k8_t, k_sc = quant(k_t)
    v8_t, v_sc = quant(v_t)
    row8_ref[0, :, 0, :] = jnp.concatenate([k8_t, v8_t], axis=-1)
    rowsc_ref[0, :, 0, 0:1] = k_sc
    rowsc_ref[0, :, 1, 0:1] = v_sc

    # ---- masked attention over the cache, current token substituted.
    # Per-row static loop: each row attends its own cache block (the dots
    # are [1, hd] x [Lp, hd] per head — the bandwidth-bound part) ----
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, mask_ref.shape[-1]), 1)
    dec_ok = jnp.logical_and(cols >= write_offset, cols < pos)
    is_cur = cols == pos
    ctx_rows = []
    for r in range(bb):
        kv = kv8_ref[0, r]                  # [Lp, 2*HD] int8
        kf = kv[:, :hd_total].astype(xv.dtype)
        vf = kv[:, hd_total:].astype(xv.dtype)
        ks_row = kvs_ref[0, r, 0:1, :]      # [1, Lp] f32
        vs_row = kvs_ref[0, r, 1:2, :]
        key_ok = mask_ref[r, 0:1, :] > 0    # [1, Lp]
        allowed = jnp.logical_or(key_ok, dec_ok)
        q_r = q[r : r + 1]
        k8_r = k8_t[r : r + 1].astype(xv.dtype)
        scores = jnp.concatenate(
            [
                jax.lax.dot_general(
                    q_r[:, h * hd : (h + 1) * hd],
                    kf[:, h * hd : (h + 1) * hd],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32,
                )
                for h in range(num_heads)
            ],
            axis=0,
        ) * (ks_row * scale)  # [H, Lp]
        cur_score = jnp.concatenate(
            [
                jax.lax.dot_general(
                    q_r[:, h * hd : (h + 1) * hd],
                    k8_r[:, h * hd : (h + 1) * hd],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32,
                )
                for h in range(num_heads)
            ],
            axis=0,
        ) * (k_sc[r : r + 1] * scale)  # [H, 1]
        scores = jnp.where(allowed, scores, _NEG)
        scores = jnp.where(is_cur, cur_score, scores)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        w = jnp.exp(scores)
        w = w / jnp.sum(w, axis=-1, keepdims=True)  # [H, Lp] probs
        w_cur = jnp.sum(jnp.where(is_cur, w, 0.0), axis=-1, keepdims=True)
        wv = jnp.where(is_cur, 0.0, w * vs_row)  # V scales folded
        v_cur = v8_t[r : r + 1].astype(f32) * v_sc[r : r + 1]  # [1, HD]
        ctx_rows.append(
            jnp.concatenate(
                [
                    jax.lax.dot_general(
                        wv[h : h + 1].astype(vf.dtype),
                        vf[:, h * hd : (h + 1) * hd],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
                    + w_cur[h : h + 1] * v_cur[:, h * hd : (h + 1) * hd]
                    for h in range(num_heads)
                ],
                axis=1,
            )
        )
    ctx = jnp.concatenate(ctx_rows, axis=0).astype(xv.dtype)  # [bb, HD]

    # ---- post-attention block (mirrors ops.pallas_ffn._block_kernel) ----
    xq = xv.astype(f32)
    attn = jax.lax.dot_general(
        ctx, wo_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + bo_ref[0].astype(f32)
    x1 = _ln(xq + attn, s1_ref[0].astype(f32), g1_ref[0].astype(f32), eps)
    x1b = x1.astype(xv.dtype)
    h1 = jax.lax.dot_general(
        x1b, w1_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + b1_ref[0].astype(f32)
    h1 = _gelu(h1).astype(xv.dtype)
    y = jax.lax.dot_general(
        h1, w2_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + b2_ref[0].astype(f32)
    out = _ln(x1 + y, s2_ref[0].astype(f32), g2_ref[0].astype(f32), eps)
    out_bf = out.astype(y_ref.dtype)

    # carry the bf16 values through the f32 scratch (lossless)
    x_scr[pl.ds(bi * bb, bb), :] = out_bf.astype(jnp.float32)
    y_ref[:, 0, :] = out_bf


# test hook: force interpret-mode pallas on CPU (read at trace time; the
# model wiring calls this without an interpret arg)
_FORCE_INTERPRET = False


def fused_decode_step(
    x_t,        # [B, 1, D] bf16
    stacks,     # dict of stacked per-layer weights (fused_decode_prep)
    kv8,        # [n_layers, B, Lp, 2*HD] int8
    kvs,        # [n_layers, B, 2, Lp] f32
    key_mask,   # [B, Lp] — 1 for live encoder rows
    step,       # int32 scalar decoder position
    write_offset: int,
    num_heads: int,
    eps: float = 1e-12,
    interpret: bool = False,
):
    """One full decode step over all layers in one kernel launch.

    Returns (y [B, 1, D], row8 [n_layers, B, 1, 2*HD] int8,
    rowsc [n_layers, B, 2, 1] f32).  The caller commits the rows with one
    dynamic_update_slice each into kv8 (axis 2, position
    write_offset+step) and kvs (axis 3)."""
    interpret = interpret or _FORCE_INTERPRET
    n_layers, b, l_p, two_hd = kv8.shape
    hd_total = two_hd // 2
    d = x_t.shape[-1]
    head_dim = hd_total // num_heads
    scale = 1.0 / (head_dim ** 0.5)
    m = stacks["w1"].shape[-1]
    # rows per program: bb > 1 amortises the MXU's per-layer weight-tile
    # march across rows (the 1-row form measured -41% device latency at
    # batch 1 but regressed at 8/48); VMEM budget caps bb at 8
    # (weights 14 MB + bb x 1.8 MB cache blocks, double-buffered)
    bb = 8 if b % 8 == 0 else 1
    # [B, 1, Lp]: a (1, Lp) block on a [B, Lp] array violates the
    # last-two-dims tiling rule once B > 1 (same trick as decode_attention)
    maskp = key_mask.astype(jnp.float32)[:, None, :]
    step_arr = jnp.asarray(step, jnp.int32).reshape(1)

    wspec = lambda shp: pl.BlockSpec(shp, lambda l, bi: (l,) + (0,) * (len(shp) - 1))
    y, row8, rowsc = pl.pallas_call(
        functools.partial(
            _fused_step_kernel, scale=scale, write_offset=write_offset,
            num_heads=num_heads, head_dim=head_dim, eps=eps, block_b=bb,
        ),
        grid=(n_layers, b // bb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # step
            pl.BlockSpec((bb, 1, d), lambda l, bi: (bi, 0, 0)),
            wspec((1, d, d)), wspec((1, 1, d)),   # wq, bq
            wspec((1, d, d)), wspec((1, 1, d)),   # wk, bk
            wspec((1, d, d)), wspec((1, 1, d)),   # wv, bv
            wspec((1, d, d)), wspec((1, 1, d)),   # wo, bo
            wspec((1, 1, d)), wspec((1, 1, d)),   # s1, g1
            wspec((1, d, m)), wspec((1, 1, m)),   # w1, b1
            wspec((1, m, d)), wspec((1, 1, d)),   # w2, b2
            wspec((1, 1, d)), wspec((1, 1, d)),   # s2, g2
            pl.BlockSpec((1, bb, l_p, two_hd), lambda l, bi: (l, bi, 0, 0)),
            pl.BlockSpec((1, bb, 2, l_p), lambda l, bi: (l, bi, 0, 0)),
            pl.BlockSpec((bb, 1, l_p), lambda l, bi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bb, 1, d), lambda l, bi: (bi, 0, 0)),
            pl.BlockSpec((1, bb, 1, two_hd), lambda l, bi: (l, bi, 0, 0)),
            pl.BlockSpec((1, bb, 2, 1), lambda l, bi: (l, bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, d), x_t.dtype),
            jax.ShapeDtypeStruct((n_layers, b, 1, two_hd), jnp.int8),
            jax.ShapeDtypeStruct((n_layers, b, 2, 1), jnp.float32),
        ],
        # f32 scratch: dynamic sublane indexing on 16-bit memrefs needs
        # even row indices (2-row packing) — see the kernel comment
        scratch_shapes=[pltpu.VMEM((b, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_layers * b * (4 * d * d + 2 * d * m)
            + 4 * n_layers * b * l_p * hd_total,
            bytes_accessed=n_layers * (4 * d * d + 2 * d * m) * 2
            + n_layers * b * 2 * l_p * hd_total,
            transcendentals=n_layers * b * (num_heads * l_p + m),
        ),
        interpret=interpret,
    )(
        step_arr, x_t,
        stacks["wq"], stacks["bq"], stacks["wk"], stacks["bk"],
        stacks["wv"], stacks["bv"], stacks["wo"], stacks["bo"],
        stacks["s1"], stacks["g1"], stacks["w1"], stacks["b1"],
        stacks["w2"], stacks["b2"], stacks["s2"], stacks["g2"],
        kv8, kvs, maskp,
    )
    return y, row8, rowsc


def fused_step_reference(x_t, stacks, kv8, kvs, key_mask, step,
                         write_offset: int, num_heads: int,
                         eps: float = 1e-12):
    """Pure-jnp oracle for fused_decode_step (testing): same math, same
    quantization, composed from the existing building blocks."""
    from vitxtgqa_tpu.ops.pallas_ffn import block_reference

    n_layers, bsz, l_p, two_hd = kv8.shape
    hd_total = two_hd // 2
    pos = write_offset + step
    xv = x_t
    rows8, rowscs, y = [], [], None
    for l in range(n_layers):
        dt = xv.dtype
        q = (xv[:, 0] @ stacks["wq"][l] + stacks["bq"][l]).astype(dt)
        k_t = (xv[:, 0] @ stacks["wk"][l] + stacks["bk"][l]).astype(dt)
        v_t = (xv[:, 0] @ stacks["wv"][l] + stacks["bv"][l]).astype(dt)

        def quant(row):
            amax = jnp.max(jnp.abs(row), axis=-1).astype(jnp.float32)
            sc = jnp.maximum(amax, 1e-6) / 127.0
            q8 = jnp.clip(
                jnp.round(row.astype(jnp.float32) / sc[:, None]), -127, 127
            ).astype(jnp.int8)
            return q8, sc

        k8_t, k_sc = quant(k_t)
        v8_t, v_sc = quant(v_t)
        rows8.append(jnp.concatenate([k8_t, v8_t], -1)[:, None, :])
        rowscs.append(jnp.stack([k_sc, v_sc], axis=1)[:, :, None])  # [B,2,1]

        kf = kv8[l, :, :, :hd_total].astype(dt)
        vf = kv8[l, :, :, hd_total:]
        ks_row = kvs[l, :, 0, :]
        vs_row = kvs[l, :, 1, :]
        cols = jnp.arange(l_p)
        allowed = jnp.logical_or(
            key_mask > 0,
            jnp.logical_and(cols >= write_offset, cols < pos)[None, :],
        )
        hd = hd_total // num_heads
        scale = 1.0 / (hd ** 0.5)
        ctxs = []
        for h in range(num_heads):
            qh = q[:, h * hd : (h + 1) * hd]
            sc_h = jnp.einsum(
                "bd,bld->bl", qh, kf[:, :, h * hd : (h + 1) * hd],
                preferred_element_type=jnp.float32,
            ) * ks_row * scale
            cur = jnp.einsum(
                "bd,bd->b", qh, k8_t[:, h * hd : (h + 1) * hd].astype(dt),
                preferred_element_type=jnp.float32,
            ) * k_sc * scale
            sc_h = jnp.where(allowed, sc_h, _NEG)
            sc_h = jnp.where(cols[None, :] == pos, cur[:, None], sc_h)
            sc_h = sc_h - sc_h.max(-1, keepdims=True)
            w = jnp.exp(sc_h)
            w = w / w.sum(-1, keepdims=True)
            w_cur = jnp.where(cols[None, :] == pos, w, 0.0).sum(-1)
            wv = jnp.where(cols[None, :] == pos, 0.0, w * vs_row)
            ctx_h = jnp.einsum(
                "bl,bld->bd", wv.astype(dt), vf[:, :, h * hd : (h + 1) * hd],
                preferred_element_type=jnp.float32,
            ) + w_cur[:, None] * (
                v8_t[:, h * hd : (h + 1) * hd].astype(jnp.float32)
                * v_sc[:, None]
            )
            ctxs.append(ctx_h)
        ctx = jnp.concatenate(ctxs, -1).astype(dt)
        out = block_reference(
            xv[:, 0], ctx, stacks["wo"][l], stacks["bo"][l],
            stacks["s1"][l], stacks["g1"][l], stacks["w1"][l],
            stacks["b1"][l], stacks["w2"][l], stacks["b2"][l],
            stacks["s2"][l], stacks["g2"][l], eps=eps,
        )
        xv = out[:, None, :]
        y = xv
    row8 = jnp.stack(rows8, 0)
    rowsc = jnp.stack(rowscs, 0)
    return y, row8, rowsc


# ---------------------------------------------------------------------------
# fused decode epilogue: classifier + OcrPtrNet scores + greedy argmax +
# next-token embedding in one launch (serving path, n_variants == 1)
# ---------------------------------------------------------------------------


def _fused_epilogue_kernel(
    step_ref,      # SMEM [1] int32
    y_ref,         # [bb, 1, D] bf16 — decode-step output
    clsw_ref,      # [D, Vp] classifier weight, transposed+padded, resident
    clsb_ref,      # [1, Vp] f32 bias, pad lanes -1e30
    ptrw_ref,      # [D, QK] f32 OcrPtrNet query kernel, resident
    ptrb_ref,      # [1, QK] f32
    keys_ref,      # [bb, N, QK] projected OCR keys
    mask_ref,      # [bb, 1, N] f32 raw 0/1 OCR mask (reference quirk: ADDED)
    ans_ref,       # [Vp, D] LN'd fixed-vocab table (pad rows 0), resident
    ocr_ref,       # [bb, N, D] LN'd OCR embedding tables
    emb_ref,       # [S2, D] f32 position+type embed rows, laid out
                   #   [(t, type)] -> row 2*t + type, resident
    scores_ref,    # out [bb, 1, Vp + N] f32
    tok_ref,       # out [bb, 1, 1] i32 (padded-space argmax, debug)
    emb_out_ref,   # out [bb, 1, D] bf16 — next step's decoder-slot input
    *, n_fixed, qk_scale, dec_len, block_b,
):
    f32 = jnp.float32
    bb = block_b
    step = step_ref[0]
    y = y_ref[:, 0, :]  # [bb, D]
    v_p = clsb_ref.shape[-1]
    n = mask_ref.shape[-1]

    y32 = y.astype(f32)  # classifier/ptr params are f32 (same-dtype dots)
    fixed = jax.lax.dot_general(
        y32, clsw_ref[...].astype(f32), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + clsb_ref[...]  # [bb, Vp] (pad lanes carry the -1e30 bias)
    q = jax.lax.dot_general(
        y32, ptrw_ref[...].astype(f32), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + ptrb_ref[...]  # [bb, QK]
    dyn = jnp.concatenate(
        [
            jax.lax.dot_general(
                q[r : r + 1], keys_ref[r].astype(f32),
                (((1,), (1,)), ((), ())), preferred_element_type=f32,
            ) * qk_scale + mask_ref[r]
            for r in range(bb)
        ],
        axis=0,
    )  # [bb, N]

    scores = jnp.concatenate([fixed, dyn], axis=-1)  # [bb, Vp + N]
    scores_ref[:, 0, :] = scores
    idx = jnp.argmax(scores, axis=-1, keepdims=True).astype(jnp.int32)
    tok_ref[:, 0, :] = idx  # [bb, 1]

    # ---- next-token embedding via one-hot MXU gathers (no dynamic
    # sublane indexing — 16-bit tables forbid unprovable row offsets) ----
    is_ocr = idx >= v_p  # [bb, 1] bool
    cols_v = jax.lax.broadcasted_iota(jnp.int32, (bb, v_p), 1)
    oh_ans = jnp.logical_and(cols_v == idx, jnp.logical_not(is_ocr))
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (bb, n), 1)
    oh_ocr = (cols_n == (idx - v_p)).astype(jnp.bfloat16)  # 0 if idx < v_p
    raw = jax.lax.dot_general(
        oh_ans.astype(jnp.bfloat16), ans_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + jnp.concatenate(
        [
            jax.lax.dot_general(
                oh_ocr[r : r + 1], ocr_ref[r],
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
            for r in range(bb)
        ],
        axis=0,
    )  # [bb, D] — exactly one table row selected per batch row
    # position/type rows laid out [2*t + is_ocr]; the last step's embedding
    # is computed (and discarded by the scan) with t+1 clamped in-range
    t_next = jnp.minimum(step + 1, dec_len - 1)
    s2 = emb_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bb, s2), 1)
    sel = 2 * t_next + is_ocr.astype(jnp.int32)  # [bb, 1]
    oh_emb = (rows == sel).astype(jnp.bfloat16)
    emb = jax.lax.dot_general(
        oh_emb, emb_ref[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )
    emb_out_ref[:, 0, :] = (raw + emb).astype(emb_out_ref.dtype)


def fused_epilogue(y, cls_w_t, cls_b_pad, ptr_w, ptr_b, ptr_keys, ocr_mask,
                   ans_tbl_pad, ocr_tbl, emb_rows, step, n_fixed: int,
                   qk_scale: float, dec_len: int, interpret: bool = False):
    """Decode-step epilogue in one launch (greedy serving, n_variants=1).

    Inputs are pre-padded/hoisted by the caller (models/base.py):
      cls_w_t     [D, Vp] classifier weight transposed, cols >= n_fixed zero
      cls_b_pad   [Vp] f32, pad entries -1e30 (argmax can never pick them)
      ans_tbl_pad [Vp, D] LN'd classifier table, pad rows zero
      emb_rows    [2*dec_len, D] f32: row 2*t+type = emb_ln(pos_t + type)
    Returns (scores [B, 1, Vp+N] f32 — slice the pad lanes OUT after the
    scan, not per step —, tok [B, 1, 1] i32 in padded space, dec_emb_next
    [B, 1, D])."""
    interpret = interpret or _FORCE_INTERPRET
    b = y.shape[0]
    d = y.shape[-1]
    v_p = cls_w_t.shape[-1]
    n = ocr_mask.shape[-1]
    qk = ptr_w.shape[-1]
    s2 = emb_rows.shape[0]
    # rows per program, matching fused_decode_step; capped at 4 here —
    # the per-row keys (f32) + OCR-table (bf16) blocks are ~4.2 MB each
    bb = 4 if b % 4 == 0 else 1
    step_arr = jnp.asarray(step, jnp.int32).reshape(1)
    res = lambda shp: pl.BlockSpec(shp, lambda bi: (0,) * len(shp))
    scores, tok, emb = pl.pallas_call(
        functools.partial(
            _fused_epilogue_kernel, n_fixed=n_fixed, qk_scale=qk_scale,
            dec_len=dec_len, block_b=bb,
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, 1, d), lambda bi: (bi, 0, 0)),
            res((d, v_p)),
            res((1, v_p)),
            res((d, qk)),
            res((1, qk)),
            pl.BlockSpec((bb, n, qk), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((bb, 1, n), lambda bi: (bi, 0, 0)),
            res((v_p, d)),
            pl.BlockSpec((bb, n, d), lambda bi: (bi, 0, 0)),
            res((s2, d)),
        ],
        out_specs=[
            pl.BlockSpec((bb, 1, v_p + n), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((bb, 1, 1), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((bb, 1, d), lambda bi: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, v_p + n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, d), y.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * (v_p + qk + n) + 2 * b * (v_p + n + s2) * d,
            bytes_accessed=(d * v_p + v_p * d) * 2 + b * n * (qk + d) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(step_arr, y, cls_w_t, cls_b_pad.reshape(1, v_p), ptr_w,
      ptr_b.reshape(1, qk), ptr_keys,
      ocr_mask.astype(jnp.float32)[:, None, :], ans_tbl_pad, ocr_tbl,
      emb_rows)
    return scores, tok, emb
