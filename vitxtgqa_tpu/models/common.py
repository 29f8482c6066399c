"""Shared flax module library for every model in the zoo.

The reference copy-pastes TextBert/MMT/OcrPtrNet/PrevPredEmbeddings into each
model file (reference: t2s.py:521-757, m4c.py, transtr.py, ...).  Here they
exist once, and the joint transformer supports both a full prefix-LM pass
(training) and an encode-once / KV-cached scan decode (eval) — the single
biggest algorithmic win over the reference, which re-runs the full 1056-token
MMT 12 times (x3 mask variants) per eval batch (reference: t2s.py:315-354).

Weight layouts follow BERT-base conventions (post-LN, gelu, 12 heads,
intermediate 3072, LN eps 1e-12) so a torch->jax converter can load
bert-base-uncased checkpoints (reference init: t2s.py:43-59).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.ops.attention import decode_mha, mha_merged
from vitxtgqa_tpu.ops.masks import NEG_INF


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 3
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dtype: Any = jnp.float32
    # route full-sequence attention through the fused Pallas kernel
    use_pallas: bool = False

    @classmethod
    def from_config(cls, node: Any, dtype=jnp.float32) -> "TransformerConfig":
        """Build from a BertConfig-style mapping/ConfigNode (partial
        overrides).  Works on FrozenDict too (flax freezes dict-typed module
        attributes)."""
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name == "dtype":
                continue
            val = cfg_get(node, f.name)
            if val is not None:
                kwargs[f.name] = val
        return cls(dtype=dtype, **kwargs)


def cfg_get(node: Any, key: str, default: Any = None) -> Any:
    """Key lookup that tolerates ConfigNode, dict, and flax FrozenDict."""
    try:
        return node[key]
    except (KeyError, TypeError, IndexError):
        return getattr(node, key, default)


_GLOBAL_FUSED_GRADS = False


def set_fused_grads(enabled: bool) -> None:
    """Dense backward with the bias gradient as an MXU dot (config:
    training_parameters.tpu.fused_grads).

    Rationale: XLA emits each Dense bias gradient as a standalone reduce
    fusion that re-reads the cotangent chain — the profile attributes
    3.1 ms per ffn_out/attn_out site at batch 48 (BASELINE.md
    train-roofline table: 54 ms of backward reductions).  dense_mm's
    custom VJP expresses db as ``ones_row @ g`` so it runs as a matmul
    over one clean operand; dx/dW are the identical dots XLA's autodiff
    produces (dW accumulates in f32).

    Measured NEGATIVE on the v5e (same-process A/B at the reference's
    batch 48, BENCH_FUSED_GRADS=1,0 tools/bench_train.py): 95.99 vs
    96.41 videos/s — the custom VJP's atomic boundary blocks the very
    operand fusions it tried to clean up, and the reduce self-times were
    evidently overlapped.  Default OFF; kept in-tree with grad-parity
    tests (tests/test_fused_grads.py) as the documented negative result.
    Trace-time flag like set_remat."""
    global _GLOBAL_FUSED_GRADS
    _GLOBAL_FUSED_GRADS = bool(enabled)


def fused_grads_enabled() -> bool:
    return _GLOBAL_FUSED_GRADS


@jax.custom_vjp
def dense_mm(x, kernel, bias):
    """flax Dense forward (x @ W.astype(x.dtype) + b), custom VJP — see
    set_fused_grads.  Caller casts x to the layer compute dtype first."""
    dt = x.dtype
    return jnp.dot(x, kernel.astype(dt)) + bias.astype(dt)


def _dense_mm_fwd(x, kernel, bias):
    return dense_mm(x, kernel, bias), (x, kernel)


def _dense_mm_bwd(res, g):
    x, kernel = res
    dt = x.dtype
    dx = jnp.dot(g, kernel.astype(dt).T)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    dw = jax.lax.dot_general(
        x2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ones = jnp.ones((1, g2.shape[0]), g2.dtype)
    db = jax.lax.dot_general(
        ones, g2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]
    return dx, dw.astype(kernel.dtype), db.astype(kernel.dtype)


dense_mm.defvjp(_dense_mm_fwd, _dense_mm_bwd)


_GLOBAL_FUSED_BLOCK_BWD = False


def set_fused_block_bwd(enabled: bool) -> None:
    """Fused-block BACKWARD kernel (config:
    training_parameters.tpu.fused_block_bwd): the training-mode
    post-attention block (attn_out + dropout + LN + FFN + dropout + LN)
    keeps its plain XLA forward — so the selective-remat policies are
    undisturbed — but backpropagates through ONE Pallas kernel per layer
    that computes every input, weight, bias, and LayerNorm-scale gradient
    in a single pass over the cotangent (ops/pallas_block_bwd.py).

    This is the round-3 roofline's named remedy for the 54 ms of backward
    reduce fusions (LN stats + LN dscale/dbias + Dense bias grads) at the
    reference's batch 48.  Measured +4.1% (99.8 vs 95.8 videos/s,
    same-process A/B; BASELINE.md for the v1-vs-v2 history).  Trace-time
    flag like set_remat; A/B via BENCH_FUSED_BLOCK_BWD=1,0
    tools/bench_train.py."""
    global _GLOBAL_FUSED_BLOCK_BWD
    _GLOBAL_FUSED_BLOCK_BWD = bool(enabled)


def fused_block_bwd_enabled() -> bool:
    return _GLOBAL_FUSED_BLOCK_BWD


class TransformerLayer(nn.Module):
    """One post-LN BERT layer with optional KV export / cached decode."""

    cfg: TransformerConfig

    def setup(self):
        c = self.cfg
        dense = lambda name: nn.Dense(c.hidden_size, dtype=c.dtype, name=name)
        self.query = dense("query")
        self.key = dense("key")
        self.value = dense("value")
        self.attn_out = dense("attn_out")
        self.attn_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype, name="attn_ln")
        self.ffn_in = nn.Dense(c.intermediate_size, dtype=c.dtype, name="ffn_in")
        self.ffn_out = dense("ffn_out")
        self.ffn_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype, name="ffn_ln")
        self.attn_drop = nn.Dropout(c.attention_probs_dropout_prob)
        self.hidden_drop = nn.Dropout(c.hidden_dropout_prob)

    def _dense(self, mod, x):
        """Dense apply routed through dense_mm when fused grads are on
        (bias grad as an MXU dot — set_fused_grads); module call at init
        so params get created."""
        if fused_grads_enabled() and not self.is_initializing():
            p = mod.variables["params"]
            return dense_mm(
                x.astype(self.cfg.dtype), p["kernel"], p["bias"]
            )
        return mod(x)

    def _fused_block_ok(self, x, deterministic: bool) -> bool:
        from vitxtgqa_tpu.ops.attention import _on_tpu, pallas_enabled
        from vitxtgqa_tpu.ops.pallas_ffn import ffn_kernel_ok

        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        # eval-only: under remat the custom-VJP forward computes 3x in
        # training (A/B: 66.3 vs 68.1 videos/s) while serving gains 10%+
        return (
            deterministic
            and not self.is_initializing()
            and pallas_enabled(self.cfg.use_pallas)
            and _on_tpu()
            and ffn_kernel_ok(x.shape[-1], self.cfg.intermediate_size, rows)
            and x.shape[-1] == self.cfg.hidden_size
        )

    def _fused_block_bwd_ok(self, x, deterministic, tanh_residual_base):
        from vitxtgqa_tpu.ops.attention import _on_tpu, pallas_enabled
        from vitxtgqa_tpu.ops.pallas_block_bwd import block_bwd_kernel_ok

        # tanh_residual_base (the QTV joint residual) composes fine: the
        # kernel covers the block, XLA autodiffs the base+tanh epilogue
        return (
            not deterministic
            and fused_block_bwd_enabled()
            and not fused_grads_enabled()
            and not self.is_initializing()
            and pallas_enabled(self.cfg.use_pallas)
            and _on_tpu()
            and x.shape[-1] == self.cfg.hidden_size
            and block_bwd_kernel_ok(
                self.cfg.hidden_size, self.cfg.intermediate_size
            )
        )

    def _finish(self, x_q, ctx, deterministic, tanh_residual_base=None):
        if self._fused_block_bwd_ok(x_q, deterministic, tanh_residual_base):
            # training path: XLA forward + single-kernel backward
            # (set_fused_block_bwd) — dropout masks drawn here so the
            # kernel backward and any remat recompute see the same pattern
            from vitxtgqa_tpu.ops.pallas_block_bwd import block_train

            p = lambda m: m.variables["params"]
            po, p1, p2 = p(self.attn_out), p(self.ffn_in), p(self.ffn_out)
            ln1, ln2 = p(self.attn_ln), p(self.ffn_ln)
            rate = float(self.cfg.hidden_dropout_prob)
            mask_a = mask_f = seed = None
            if rate > 0.0:
                from vitxtgqa_tpu.ops.pallas_block_bwd import (
                    kernel_dropout_enabled,
                )

                if kernel_dropout_enabled():
                    # seed mode (tpu.kernel_dropout): one int32 seed per
                    # layer call; both kernels regenerate the masks
                    # in-kernel — the ~30 ms/step of threefry+s8-convert
                    # mask pipelines never runs (round-5 HLO dig)
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (), 0,
                        jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                    )
                else:
                    keep = 1.0 - rate
                    mask_a = jax.random.bernoulli(
                        self.make_rng("dropout"), keep, x_q.shape
                    )
                    mask_f = jax.random.bernoulli(
                        self.make_rng("dropout"), keep, x_q.shape
                    )
            y = block_train(
                x_q, ctx, po["kernel"], po["bias"], ln1["scale"],
                ln1["bias"], p1["kernel"], p1["bias"], p2["kernel"],
                p2["bias"], ln2["scale"], ln2["bias"], mask_a, mask_f,
                rate=rate, eps=self.cfg.layer_norm_eps,
                dropout_seed=seed,
            )
            if tanh_residual_base is not None:
                y = tanh_residual_base + jnp.tanh(y)
            return y
        if self._fused_block_ok(x_q, deterministic):
            # whole post-attention block in one kernel: attn_out matmul,
            # both residual+LN clusters, and the gelu intermediate stay in
            # VMEM (separately they profiled ~48ms/layer at batch 384)
            from vitxtgqa_tpu.ops.attention import w8a8_enabled
            from vitxtgqa_tpu.ops.pallas_ffn import (
                fused_block,
                fused_block_tanh,
                fused_block_w8a8,
            )

            p = lambda m: m.variables["params"]
            po, p1, p2 = p(self.attn_out), p(self.ffn_in), p(self.ffn_out)
            ln1, ln2 = p(self.attn_ln), p(self.ffn_ln)
            args = (
                x_q, ctx, po["kernel"], po["bias"], ln1["scale"],
                ln1["bias"], p1["kernel"], p1["bias"], p2["kernel"],
                p2["bias"], ln2["scale"], ln2["bias"],
            )
            # opt-in int8 W8A8 serving mode (ops.attention.set_w8a8)
            if w8a8_enabled():
                y = fused_block_w8a8(*args, eps=self.cfg.layer_norm_eps)
                if tanh_residual_base is not None:
                    y = tanh_residual_base + jnp.tanh(y)
                return y
            if tanh_residual_base is not None:
                from vitxtgqa_tpu.ops.pallas_ffn import tanh_epilogue_enabled

                if tanh_epilogue_enabled():
                    # T2S QTV joint residual fused as the kernel epilogue —
                    # the separate res+tanh(h) elementwise pass over the
                    # [B, L, D] buffer profiled at ~10.8 ms at batch 576
                    return fused_block_tanh(
                        tanh_residual_base, *args,
                        eps=self.cfg.layer_norm_eps,
                    )
                y = fused_block(*args, eps=self.cfg.layer_norm_eps)
                return tanh_residual_base + jnp.tanh(y)
            return fused_block(*args, eps=self.cfg.layer_norm_eps)
        attn = self.hidden_drop(
            self._dense(self.attn_out, ctx), deterministic=deterministic
        )
        x = self.attn_ln(x_q + attn)
        ffn = self._dense(
            self.ffn_out,
            nn.gelu(self._dense(self.ffn_in, x), approximate=False),
        )
        ffn = self.hidden_drop(ffn, deterministic=deterministic)
        y = self.ffn_ln(x + ffn)
        if tanh_residual_base is not None:
            y = tanh_residual_base + jnp.tanh(y)
        return y

    def __call__(self, x, bias, deterministic: bool = True,
                 return_kv: bool = False, quantize: bool = False,
                 tanh_residual_base=None):
        h = self.cfg.num_attention_heads
        k_raw, v_raw = self._dense(self.key, x), self._dense(self.value, x)
        if return_kv and quantize:
            # int8 cache emission fused into the flash kernel (eval-only
            # path: the decode harness is deterministic by construction)
            from vitxtgqa_tpu.ops.attention import mha_merged_quantize

            ctx, kq, vq = mha_merged_quantize(
                self.query(x), k_raw, v_raw, bias, h,
                use_pallas=self.cfg.use_pallas,
            )
            return self._finish(x, ctx, deterministic), (kq, vq)
        rng = None if deterministic else self.make_rng("dropout")
        rate = 0.0 if deterministic else self.cfg.attention_probs_dropout_prob
        # merged-head layout end to end: projections feed the attention (and
        # the KV export IS the decode-cache layout) without split/merge
        # transposes — those relayouts profiled at ~12ms/layer at batch 384
        q_raw = self._dense(self.query, x)
        if not deterministic:
            # names consumed by the selective-remat policies (set_remat
            # "attn"/"attn_qkv"): no-ops unless a save_only_these_names
            # policy is active on the surrounding jax.checkpoint
            from jax.ad_checkpoint import checkpoint_name

            q_raw = checkpoint_name(q_raw, "attn_q")
            k_raw = checkpoint_name(k_raw, "attn_k")
            v_raw = checkpoint_name(v_raw, "attn_v")
        ctx = mha_merged(
            q_raw, k_raw, v_raw, bias, h, dropout_rate=rate,
            dropout_rng=rng, use_pallas=self.cfg.use_pallas,
        )
        if not deterministic:
            from jax.ad_checkpoint import checkpoint_name

            ctx = checkpoint_name(ctx, "attn_ctx")
        y = self._finish(x, ctx, deterministic, tanh_residual_base)
        return (y, (k_raw, v_raw)) if return_kv else y

    def decode(self, x_t, k_all, v_all, bias_t, deterministic: bool = True):
        """x_t: [B, 1, D] query token; k_all/v_all: [B, L, H*D] merged
        cache; bias_t: masks.DecodeStepSpec (or an additive bias)."""
        ctx = decode_mha(
            self.query(x_t), k_all, v_all, bias_t,
            self.cfg.num_attention_heads, use_pallas=self.cfg.use_pallas,
        )
        return self._finish(x_t, ctx, deterministic)


_GLOBAL_REMAT = False
_GLOBAL_KV_INT8 = False
_GLOBAL_PP = (None, "pp", 0)  # (mesh, axis, num_microbatches)


def set_pipeline(mesh, axis: str = "pp", num_microbatches: int = 0) -> None:
    """Pipeline-parallel switch (config: training_parameters.tpu.mesh.pp):
    every TransformerEncoder whose layer count divides the stage count runs
    its full-sequence forward through the GPipe schedule
    (parallel/pipeline.py) with layers sharded over the `pp` mesh axis.

    Applies to the training/teacher-forced path (__call__); the KV-cached
    decode methods keep the single-stage layout (the 12-slot decode loop is
    latency-bound — a pipeline bubble would dominate).  Set BEFORE the step
    is compiled (trace-time flag, like set_remat).  Pass mesh=None to
    disable."""
    global _GLOBAL_PP
    _GLOBAL_PP = (mesh, axis, int(num_microbatches))


def set_kv_cache_int8(enabled: bool) -> None:
    """Quantize the unified decode cache to int8 with per-token scales
    (config: training_parameters.tpu.kv_cache_int8) — halves the decode
    loop's dominant HBM traffic and the cache footprint.  Greedy argmax
    is tolerant to the ~0.4% relative quantization error; exact bf16
    parity runs should leave it off.

    Set BEFORE the eval/decode step is first compiled: the flag is read
    at trace time and jit caches are keyed only on input avals, so
    toggling after compilation silently has no effect on the cached
    executable (bench.py and the trainer both set it pre-compile)."""
    global _GLOBAL_KV_INT8
    _GLOBAL_KV_INT8 = bool(enabled)


def kv_cache_int8_enabled() -> bool:
    return _GLOBAL_KV_INT8


_GLOBAL_FUSED_DECODE = True
# above this batch the per-layer decode kernels win: the fused step only
# measured faster in the launch-bound near-batch-1 regime (-41% device
# latency at batch 1 round 3; round-4 chained A/B per batch: fused
# +12% at 1, +15% at 2, -6% at 4, neutral-to-slower from 8 up in BOTH
# kernel forms — tools/ab_fused_decode.py, numbers in BASELINE.md).
# Batch 4 was inside the default cap on the round-3 guess; the round-4
# per-batch measurement moved the cap to 2.
DEFAULT_FUSED_DECODE_MAX_BATCH = 2
_GLOBAL_FUSED_DECODE_MAX_BATCH = DEFAULT_FUSED_DECODE_MAX_BATCH


def set_fused_decode_max_batch(n: int) -> None:
    """Batch cap for the single-kernel decode step (config:
    training_parameters.tpu.fused_decode_max_batch)."""
    global _GLOBAL_FUSED_DECODE_MAX_BATCH
    _GLOBAL_FUSED_DECODE_MAX_BATCH = int(n)


def fused_decode_max_batch() -> int:
    return _GLOBAL_FUSED_DECODE_MAX_BATCH


def set_fused_decode(enabled: bool) -> None:
    """Single-kernel decode step (config: training_parameters.tpu.
    fused_decode, default on): each greedy-decode step runs all MMT
    layers in ONE pallas_call (QKV GEMVs, int8 quantize, cached
    attention with the current token substituted in-register, and the
    post-attention block), committing the new cache rows with one DUS
    per packed array — 3 launches per step instead of ~30.  Engages only
    with the int8 KV cache on a TPU backend (fused_decode_ok).  Trace-
    time flag like set_kv_cache_int8: set BEFORE the eval step is first
    compiled."""
    global _GLOBAL_FUSED_DECODE
    _GLOBAL_FUSED_DECODE = bool(enabled)


def fused_decode_enabled() -> bool:
    return _GLOBAL_FUSED_DECODE


_GLOBAL_COMPACT_TRAIN = False


def set_compact_train(enabled: bool) -> None:
    """EXPERIMENTAL grounding-compacted *training* (config:
    training_parameters.tpu.compact_train) — the pos/neg contrastive
    variants run their teacher-forced MMT pass on the statically-kept
    grounding rows (384 instead of 1152 at production dims), like compact
    full-eval; the ref variant keeps the full sequence.

    Estimator deviation (why this is NOT default): kept-row scores and
    their gradients are exact (attention permutation-equivariance — the
    same argument as compact serving), but the full path computes LIVE
    copy scores for non-kept OCR slots (the reference's raw 0/1 ptr-mask
    quirk) which feed the InfoNCE cosine over the full score vector and
    the BCE on non-grounded answer slots.  The compact pass cannot
    compute those rows; it substitutes the ref variant's scores
    (stop-gradient) for them — bounded and well-scaled, but those slots
    contribute no gradient and their pos/neg-specific values are
    approximated by ref's.  Keep off unless the trajectory evidence in
    BASELINE.md supports it for your use; trace-time flag like
    set_compact_serving."""
    global _GLOBAL_COMPACT_TRAIN
    if isinstance(enabled, str):
        mode = enabled.lower()
        _GLOBAL_COMPACT_TRAIN = (
            mode if mode == "live"
            else mode not in ("", "0", "false", "none")
        )
    else:
        _GLOBAL_COMPACT_TRAIN = bool(enabled)


def compact_train_enabled():
    """False | True (stop-grad ref fill) | "live" (gradient flows through
    the ref fill — the BCE/InfoNCE gradient on non-kept slots reaches the
    shared MMT weights via the ref variant's computation of those rows,
    approximating the full estimator's non-kept-score gradients)."""
    return _GLOBAL_COMPACT_TRAIN


_GLOBAL_COMPACT_SERVING = False


def set_compact_serving(enabled: bool) -> None:
    """Grounding-compacted serving (config:
    training_parameters.tpu.compact_serving) — the inference_only decode
    gathers only the rows the pos grounding masks keep (exactly
    frame_topk frames + ocr_topk OCR slots per frame + the question) and
    runs the MMT prefill + KV-cached decode on that short sequence
    (1152 -> 384 rows at production dims; see T2S._compact_decode).
    Also engages for t2s_wo_sg, whose grounding keeps every OCR slot of
    the grounded frames (frame_topk*ocr_frame_num rows, -1-padded when
    the padding-frame id 0->1 quirk collapses ground ids); t2s_wo_tg
    keeps every slot per frame and cannot compact.

    DOCUMENTED DEVIATION: the reference's OcrPtrNet adds the raw 0/1 OCR
    mask to the copy scores (t2s.py:665), so grounding-masked OCR slots
    keep a live raw q.k score that can in principle win the greedy
    argmax; the compact path never computes those rows and pins their
    scores to -1e4.  Predictions agree whenever the reference's argmax
    stays inside the grounding-selected set (measure with
    tools/compact_agreement.py before enabling in production).  Exact
    bug-for-bug runs should leave this off.

    Trace-time flag like set_kv_cache_int8: set BEFORE the eval step is
    first compiled."""
    global _GLOBAL_COMPACT_SERVING
    _GLOBAL_COMPACT_SERVING = bool(enabled)


def compact_serving_enabled() -> bool:
    return _GLOBAL_COMPACT_SERVING


def set_remat(enabled) -> None:
    """Rematerialise transformer layers in the backward pass (config:
    training_parameters.tpu.remat) — trades extra FLOPs for dropping
    per-layer activations from HBM.

    Accepts False/"none" (off), True/"full" (recompute everything — lowest
    memory), "dots" (jax.checkpoint_policies.dots_saveable: matmul
    outputs stay resident, only the cheap elementwise/softmax work
    recomputes — less recompute, more memory), "attn" (save only the
    flash-attention context per layer — the backward pass never re-runs
    the attention forward kernel, everything else recomputes), or
    "attn_qkv" ("attn" plus the Q/K/V projections, skipping their
    recompute too).  Measured at the reference's batch 48 on the v5e
    (same-process sequential A/Bs, tools/bench_train.py): attn 96.3 /
    attn_qkv 95.7 / full 90.0 / dots ~76-83 videos/s — "attn" is the
    recommended training mode (the saved context is cheap to hold and
    the flash forward is the most expensive recompute; saving Q/K/V too
    costs more HBM traffic than their recompute)."""
    global _GLOBAL_REMAT
    if isinstance(enabled, str):
        mode = enabled.lower()
        _GLOBAL_REMAT = {"none": False, "false": False,
                         "full": True, "true": True}.get(mode, mode)
    else:
        _GLOBAL_REMAT = bool(enabled)


class TransformerEncoder(nn.Module):
    """Stack of TransformerLayers (BertEncoder equivalent)."""

    cfg: TransformerConfig

    def setup(self):
        # remat wraps only the full-sequence train path (__call__); the
        # cached-decode methods keep the raw layers — flax remat cannot take
        # bool kwargs like return_kv, and eval needs no rematerialisation
        self.layers = [
            TransformerLayer(self.cfg, name=f"layer_{i}")
            for i in range(self.cfg.num_hidden_layers)
        ]

    def _pp_eligible(self, deterministic: bool) -> bool:
        mesh, axis, _ = _GLOBAL_PP
        return (
            mesh is not None
            and not self.is_initializing()
            and self.cfg.num_hidden_layers % mesh.shape[axis] == 0
            # dropout rngs don't thread through the pipeline payload;
            # PP trains with deterministic layers or eval passes
            and (
                deterministic
                or (
                    self.cfg.hidden_dropout_prob == 0.0
                    and self.cfg.attention_probs_dropout_prob == 0.0
                )
            )
        )

    def __call__(self, x, bias, deterministic: bool = True,
                 tanh_residual_base=None):
        """``tanh_residual_base`` (optional [B, L, D]): return
        ``base + tanh(stack(x))`` instead of ``stack(x)`` — the T2S QTV
        joint-residual idiom.  On the eval fused-block path the epilogue
        runs inside the last layer's Pallas kernel; the remat/PP training
        paths compute it as plain XLA ops."""
        base = tanh_residual_base
        if self._pp_eligible(deterministic):
            from vitxtgqa_tpu.ops.masks import MaskSpec
            from vitxtgqa_tpu.parallel.pipeline import pipeline_encoder_apply

            mesh, axis, n_micro = _GLOBAL_PP
            bias_t = bias.to_bias() if isinstance(bias, MaskSpec) else bias
            layer_params = [
                layer.variables["params"] for layer in self.layers
            ]
            h = pipeline_encoder_apply(
                self.cfg, layer_params, x, bias_t, mesh, axis, n_micro
            )
            return h if base is None else base + jnp.tanh(h)
        if _GLOBAL_REMAT:
            kwargs = {}
            if _GLOBAL_REMAT == "dots":
                kwargs["policy"] = jax.checkpoint_policies.dots_saveable
            elif _GLOBAL_REMAT == "attn":
                kwargs["policy"] = (
                    jax.checkpoint_policies.save_only_these_names("attn_ctx")
                )
            elif _GLOBAL_REMAT == "attn_qkv":
                kwargs["policy"] = (
                    jax.checkpoint_policies.save_only_these_names(
                        "attn_ctx", "attn_q", "attn_k", "attn_v"
                    )
                )
            for layer in self.layers:
                x = nn.remat(
                    TransformerLayer.__call__, static_argnums=(3,), **kwargs
                )(layer, x, bias, deterministic)
            return x if base is None else base + jnp.tanh(x)
        last = len(self.layers) - 1
        for i, layer in enumerate(self.layers):
            if base is not None and i == last:
                x = layer(x, bias, deterministic, tanh_residual_base=base)
            else:
                x = layer(x, bias, deterministic)
        return x

    def encode_with_cache(self, x, bias, deterministic: bool = True,
                          quantize: bool = False):
        """Returns (final hidden, [(k, v)] per layer computed from each
        layer's input) for later cached decoding.  K/V are the raw merged
        projections [B, L, H*D] — the decode-cache layout.  With
        ``quantize`` each entry is instead the ((k8, ks), (v8, vs)) int8
        per-token-scaled pair (quantize_kv layout), emitted inside the
        flash kernel on the Pallas path.  Not used by the decode harness:
        the fused emission measured slower than a separate
        quantize_cache pass on the v5e (see flash_attention_merged_q8)."""
        kvs = []
        for layer in self.layers:
            x, kv = layer(x, bias, deterministic, return_kv=True,
                          quantize=quantize)
            kvs.append(kv)
        return x, kvs

    def decode_step(self, x_t, enc_kvs, dec_cache, step, bias_t,
                    deterministic: bool = True, write_offset=None):
        """One cached decode step.

        x_t: [B, 1, D]; dec_cache: per-layer (k, v) [B, Lcache, H*D]
        *unified* merged-head cache holding the encoder keys in the leading
        slots; step: scalar int32 decoder position; this step's K/V are
        written at write_offset + step (write_offset defaults to the
        encoder length taken from enc_kvs, which is otherwise unused).
        Returns (y_t, updated dec_cache).

        The unified layout avoids re-concatenating the full encoder cache
        every layer x step — the single dominant HBM cost of the decode
        scan (profiled at ~2.5GB of concat copies per step at batch 192).
        """
        if write_offset is None:
            first = dec_cache[0][0] if enc_kvs is None else enc_kvs[0][0]
            if isinstance(first, tuple):
                first = first[0]
            write_offset = first.shape[1] if enc_kvs is not None else 0

        def write(cache, x_new, pos):
            """DUS one token into a plain [B, L, H*D] cache or an
            (int8 values, [B, L] per-token scales) quantized cache."""
            if isinstance(cache, tuple):
                from vitxtgqa_tpu.ops.attention import quantize_kv

                vals, scales = cache
                q8, sc = quantize_kv(x_new)
                vals = jax.lax.dynamic_update_slice_in_dim(
                    vals, q8, pos, axis=1
                )
                scales = jax.lax.dynamic_update_slice_in_dim(
                    scales, sc.astype(scales.dtype), pos, axis=1
                )
                return (vals, scales)
            return jax.lax.dynamic_update_slice_in_dim(
                cache, x_new.astype(cache.dtype), pos, axis=1
            )

        new_cache = []
        for layer, (ck, cv) in zip(self.layers, dec_cache):
            k_t = layer.key(x_t)  # [B, 1, H*D]
            v_t = layer.value(x_t)
            ck = write(ck, k_t, write_offset + step)
            cv = write(cv, v_t, write_offset + step)
            new_cache.append((ck, cv))
            x_t = layer.decode(x_t, ck, cv, bias_t, deterministic)
        return x_t, new_cache

    def quantize_cache(self, kvs):
        """[(k, v)] merged bf16 caches -> [((k8, ks), (v8, vs))] int8."""
        from vitxtgqa_tpu.ops.attention import quantize_kv

        h = self.cfg.num_attention_heads
        return [(quantize_kv(k, h), quantize_kv(v, h)) for k, v in kvs]

    def fused_decode_ok(self) -> bool:
        """Single-kernel decode step (ops.pallas_decode_step): TPU + Pallas
        + int8 cache only.  Folds each decode step's ~10 per-layer ops into
        one launch per STEP — the lever for the launch-bound batch-1..48
        serving latency (BASELINE.md).  Disengaged under W8A8 so that mode
        keeps ONE numeric path regardless of batch size (the fused step
        computes with bf16 weights; mixing it in below the batch cap would
        silently change numerics within the same opt-in mode)."""
        from vitxtgqa_tpu.ops.attention import _on_tpu, pallas_enabled, w8a8_enabled

        return (
            fused_decode_enabled()
            and kv_cache_int8_enabled()
            and not w8a8_enabled()
            and pallas_enabled(self.cfg.use_pallas)
            and _on_tpu()
            and not self.is_initializing()
        )

    def fused_decode_prep(self, kvs):
        """Pack the per-layer int8 caches + layer weights for the
        single-kernel decode step (ops.pallas_decode_step).

        kvs: [((k8, ks), (v8, vs))] from quantize_cache.  Returns
        (stacks, kv8 [n_layers, B, Lp, 2*H*D] int8,
        kvsc [n_layers, B, 2, Lp] f32).  Build OUTSIDE the decode scan so
        the stacking copies trace once per eval call (at batch 48 the
        packed cache copy is ~255 MB ≈ 0.3 ms one-time)."""
        p = lambda m: m.variables["params"]
        k = lambda name: jnp.stack(
            [p(getattr(l, name))["kernel"] for l in self.layers]
        )
        bi = lambda name: jnp.stack(
            [p(getattr(l, name))["bias"] for l in self.layers]
        )[:, None, :]
        ln = lambda name, f: jnp.stack(
            [p(getattr(l, name))[f] for l in self.layers]
        )[:, None, :]
        stacks = {
            "wq": k("query"), "bq": bi("query"),
            "wk": k("key"), "bk": bi("key"),
            "wv": k("value"), "bv": bi("value"),
            "wo": k("attn_out"), "bo": bi("attn_out"),
            "s1": ln("attn_ln", "scale"), "g1": ln("attn_ln", "bias"),
            "w1": k("ffn_in"), "b1": bi("ffn_in"),
            "w2": k("ffn_out"), "b2": bi("ffn_out"),
            "s2": ln("ffn_ln", "scale"), "g2": ln("ffn_ln", "bias"),
        }
        dt = self.cfg.dtype
        stacks = {
            name: (w.astype(dt) if name[0] == "w" else w)
            for name, w in stacks.items()
        }
        kv8 = jnp.stack(
            [jnp.concatenate([k8, v8], axis=-1)
             for (k8, _), (v8, _) in kvs]
        )
        kvsc = jnp.stack(
            [jnp.stack([ks, vs], axis=1) for (_, ks), (_, vs) in kvs]
        )
        return stacks, kv8, kvsc

    def fused_decode_step_apply(self, stacks, x_t, kv8, kvsc, step,
                                key_mask, write_offset: int):
        """One decode step through the single-kernel path; commits this
        step's quantized K/V rows with one DUS per packed cache array.
        Returns (y_t [B, 1, D], kv8', kvsc')."""
        from vitxtgqa_tpu.ops.pallas_decode_step import fused_decode_step

        y, row8, rowsc = fused_decode_step(
            x_t, stacks, kv8, kvsc, key_mask, step, write_offset,
            self.cfg.num_attention_heads, eps=self.cfg.layer_norm_eps,
        )
        pos = write_offset + step
        kv8 = jax.lax.dynamic_update_slice(kv8, row8, (0, 0, pos, 0))
        kvsc = jax.lax.dynamic_update_slice(
            kvsc, rowsc, (0, 0, 0, pos)
        )
        return y, kv8, kvsc

    def init_dec_cache(self, batch: int, dec_len: int, enc_kvs=None):
        """Unified per-layer merged KV caches [B, Lenc+dec, H*D]: the
        encoder keys (from encode_with_cache) occupy the leading slots,
        decoder slots fill in as decoding progresses.  Invalid/padded slots
        are masked by the decode-step bias, so zeros are safe placeholders.
        Passing enc_kvs=None yields decoder-only caches (legacy layout —
        decode_step then expects enc_kvs=None too)."""
        c = self.cfg
        if enc_kvs is None:
            shape = (batch, dec_len, c.hidden_size)
            return [
                (jnp.zeros(shape, c.dtype), jnp.zeros(shape, c.dtype))
                for _ in range(c.num_hidden_layers)
            ]
        pad = ((0, 0), (0, dec_len), (0, 0))
        return [
            (jnp.pad(ek, pad), jnp.pad(ev, pad)) for ek, ev in enc_kvs
        ]


class BertEmbeddings(nn.Module):
    """Word + position + token-type embeddings with LN and dropout."""

    cfg: TransformerConfig

    def setup(self):
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype)
        self.position_embeddings = nn.Embed(
            c.max_position_embeddings, c.hidden_size, dtype=c.dtype
        )
        self.token_type_embeddings = nn.Embed(
            c.type_vocab_size, c.hidden_size, dtype=c.dtype
        )
        self.ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype)
        self.drop = nn.Dropout(c.hidden_dropout_prob)

    def __call__(self, input_ids, deterministic: bool = True):
        b, l = input_ids.shape
        pos = jnp.arange(l)[None, :]
        x = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(pos)
            + self.token_type_embeddings(jnp.zeros_like(input_ids))
        )
        return self.drop(self.ln(x), deterministic=deterministic)


class TextEncoder(nn.Module):
    """Question encoder: BertEmbeddings + N layers (TextBert,
    reference: t2s.py:521-545)."""

    cfg: TransformerConfig

    def setup(self):
        self.embeddings = BertEmbeddings(self.cfg)
        self.encoder = TransformerEncoder(self.cfg)

    def __call__(self, txt_inds, txt_mask, deterministic: bool = True):
        x = self.embeddings(txt_inds, deterministic)
        bias = (1.0 - txt_mask)[:, None, None, :] * NEG_INF
        return self.encoder(x, bias, deterministic)


class PrevPredEmbeddings(nn.Module):
    """Decoder-slot embeddings from previous predictions
    (reference: t2s.py:673-723)."""

    cfg: TransformerConfig
    MAX_DEC_LENGTH: int = 100
    MAX_TYPE_NUM: int = 5

    def setup(self):
        c = self.cfg
        self.position_embeddings = nn.Embed(
            self.MAX_DEC_LENGTH, c.hidden_size, dtype=c.dtype
        )
        self.token_type_embeddings = nn.Embed(
            self.MAX_TYPE_NUM, c.hidden_size, dtype=c.dtype
        )
        self.ans_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype)
        self.ocr_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype)
        self.emb_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype)
        self.drop = nn.Dropout(c.hidden_dropout_prob)

    def tables(self, ans_emb, ocr_emb):
        """LayerNormed embedding tables: ([V, D], [B, N, D]).

        Loop-invariant during decode — compute ONCE before the scan (the
        per-step ocr_ln over [B, 960, 768] profiled at ~30ms/step at batch
        384); ``embed`` then only gathers."""
        return self.ans_ln(ans_emb).astype(ocr_emb.dtype), self.ocr_ln(ocr_emb)

    def embed(self, ans, ocr, prev_inds, deterministic: bool = True,
              position_offset: int = 0):
        """Gather decoder-slot embeddings from prepared tables (see
        ``tables``); prev_inds [B, S] (S may be 1 for cached decode with
        position_offset=t)."""
        b, s = prev_inds.shape
        ans_num = ans.shape[0]
        # two clamped gathers + select instead of materialising the
        # concatenated [B, V+N, D] address space (1.8GB at production dims,
        # rebuilt inside every decode step before this change)
        is_ocr = prev_inds >= ans_num
        ans_idx = jnp.clip(prev_inds, 0, ans_num - 1)
        ocr_idx = jnp.clip(prev_inds - ans_num, 0, ocr.shape[1] - 1)
        from_ans = jnp.take(ans, ans_idx, axis=0)  # [B, S, D]
        from_ocr = jnp.take_along_axis(ocr, ocr_idx[..., None], axis=1)
        raw = jnp.where(is_ocr[..., None], from_ocr, from_ans)

        positions = jnp.arange(s)[None, :] + position_offset
        token_type = is_ocr.astype(jnp.int32)
        emb = self.position_embeddings(positions) + self.token_type_embeddings(token_type)
        emb = self.drop(self.emb_ln(emb), deterministic=deterministic)
        return raw + emb

    def __call__(self, ans_emb, ocr_emb, prev_inds, deterministic: bool = True,
                 position_offset: int = 0):
        """ans_emb [V, D] fixed-vocab table; ocr_emb [B, N, D]; prev_inds
        [B, S] (S may be 1 for cached decode with position_offset=t)."""
        ans, ocr = self.tables(ans_emb, ocr_emb)
        return self.embed(ans, ocr, prev_inds, deterministic, position_offset)


class OcrPtrNet(nn.Module):
    """Dynamic OCR-copy scores (reference: t2s.py:636-670).

    NOTE: faithfully reproduces the reference quirk of adding the *raw 0/1*
    OCR mask to the scores (valid slots get +1) rather than a -10000 mask.
    """

    hidden_size: int
    query_key_size: int = 0

    def setup(self):
        qk = self.query_key_size or self.hidden_size
        self.query = nn.Dense(qk, name="query")
        self.key = nn.Dense(qk, name="key")

    def keys(self, key_inputs):
        """Project the OCR keys.  Loop-invariant during decode — call ONCE
        before the scan (re-projecting [B, 960, 768] keys every step
        profiled at ~27ms/step at batch 384)."""
        return self.key(key_inputs)

    def scores_from_keys(self, query_inputs, k, attention_mask):
        qk = self.query_key_size or self.hidden_size
        q = self.query(query_inputs)
        if isinstance(k, tuple):
            # int8 per-token-scaled keys (quantize_kv layout): the decode
            # scan re-reads the full [B, N, qk] key tensor every step, so
            # halving its bytes matters the same way the KV cache does
            from vitxtgqa_tpu.ops.attention import (
                _on_tpu,
                dequantize_kv,
                pallas_enabled,
            )

            k8, ks = k
            if (
                pallas_enabled()
                and _on_tpu()
                and q.shape[1] == 1
                and qk % 128 == 0
            ):
                from vitxtgqa_tpu.ops.pallas_attention import ptr_scores_int8

                return ptr_scores_int8(q, k8, ks, attention_mask)
            k = dequantize_kv(k8, ks, dtype=q.dtype)
        scores = jnp.einsum(
            "bsd,bnd->bsn", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(qk, jnp.float32))
        return scores + attention_mask[:, None, :].astype(scores.dtype)

    def __call__(self, query_inputs, key_inputs, attention_mask):
        return self.scores_from_keys(
            query_inputs, self.keys(key_inputs), attention_mask
        )


class FixedVocabClassifier(nn.Module):
    """Linear classifier whose weight doubles as the fixed-answer embedding
    table for PrevPredEmbeddings (the reference passes
    classifier.module.weight, t2s.py:275; ClassifierLayer at layers.py:91-109).
    """

    out_dim: int
    in_dim: int = 768

    def setup(self):
        self.weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.out_dim, self.in_dim),
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))

    def __call__(self, x):
        return (
            jnp.einsum(
                "...d,vd->...v", x, self.weight,
                preferred_element_type=jnp.float32,
            )
            + self.bias
        )

    def table(self) -> jax.Array:
        """[out_dim, in_dim] embedding table view of the classifier weight."""
        return self.weight
