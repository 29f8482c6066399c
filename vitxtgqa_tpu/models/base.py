"""Shared joint-transformer + pointer-decode harness for all QA models.

Every videoqa model in the reference re-implements the same MMT forward and
greedy decode loop per file (reference: t2s.py:265-354, m4c.py:260-310,
t5vitevqa.py, transtr.py, ...).  Here the harness exists once; models
subclass and provide the modality encodings and grounding mechanism.

The harness supports `n_variants` mask variants folded into the batch dim
(T2S uses 3 for ref/pos/neg contrastive passes; baselines use 1), with the
greedy argmax driven by `argmax_variant`.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.ops.masks import (
    DecodeStepSpec,
    MaskSpec,
    joint_mask_spec,
)


_COMPACT_POSTSCAN = False


def set_compact_postscan(enabled: bool) -> None:
    """Trace-time A/B knob for the compact decode epilogue.  True keeps
    copy scores compact in-scan (argmax maps through the gather list) and
    scatters to the full copy width once post-scan; False (default,
    production) is the per-step in-scan scatter+concat form.

    MEASURED NEGATIVE on the v5e (tools/ab_compact_epilogue.py, compact
    serving batch 576, both orders interleaved same-process): post-scan
    1588.9/1589.0 vs in-scan 1605.4/1604.6 videos/s (-1.0%), token
    agreement 1.000000 — XLA already overlaps the 12 small per-step
    scatters, and the post-scan form's per-step argmax token mapping plus
    the one big [B, S, full_n] scatter cost slightly more.  Kept in-tree
    with the numbers, like the other measured negatives (ROADMAP.md)."""
    global _COMPACT_POSTSCAN
    _COMPACT_POSTSCAN = bool(enabled)


def compact_postscan_enabled() -> bool:
    return _COMPACT_POSTSCAN


def l2_normalize(x, axis=-1, eps=1e-12):
    """F.normalize equivalent: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def inv_l2_norm(x, eps=1e-12):
    """f32 reciprocal row norms 1 / max(||x||, eps), shape [..., 1].

    ``l2_normalize(x) @ W == (x @ W) * inv_l2_norm(x)``: the per-row scale
    commutes through the matmul, so callers can skip materialising the
    normalised copy of a large feature tensor (and the division runs in
    f32 on the accumulated product instead of bf16 on the input)."""
    sumsq = jnp.sum(
        jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True
    )
    return 1.0 / jnp.maximum(jnp.sqrt(sumsq), eps)


def split_dense(dense, parts, scales, out_dtype):
    """``dense(concat(parts, -1))`` without materialising the concat.

    Slices the kernel row-wise per part and sums the partial products in
    f32; ``scales[i]`` (or None) is a per-row multiplier commuted through
    the matmul (see inv_l2_norm).  The [B, N, sum(d_i)] concat buffer of
    the naive form — 1.44 GB at T2S production dims — never exists.
    Caller must have created ``dense``'s params (gate on is_initializing).
    """
    p = dense.variables["params"]
    w = p["kernel"]
    acc = None
    off = 0
    for part, s in zip(parts, scales):
        d = part.shape[-1]
        wi = w[off : off + d].astype(part.dtype)
        y = jnp.einsum(
            "...d,dh->...h", part, wi, preferred_element_type=jnp.float32
        )
        if s is not None:
            y = y * s
        acc = y if acc is None else acc + y
        off += d
    assert off == w.shape[0], (off, w.shape)
    return (acc + p["bias"].astype(jnp.float32)).astype(out_dtype)


def project_features(dense, parts, normalize, out_dtype, is_init: bool):
    """``dense(concat([l2_normalize(p) if n else p, ...], -1))`` — the
    modality input-projection idiom shared by every model in the zoo
    (reference: t2s.py:203-258, m4c.py:185-230, ...).

    Measured NEGATIVE result (v5e, same-process A/B at [576, 960] OCR
    dims): lowering this to split_dense with the l2 scales commuted
    through the matmul — skipping the [B, N, sum(d_i)] concat buffer and
    the normalised copies — runs 49.2 ms vs 42.5 ms for this naive form.
    The sliced matmuls lose more to unaligned contraction dims
    (300/604/50) and four materialised f32 partial products than the
    concat costs; pre-scaled-inputs-in-the-concat measured neutral
    (42.8 ms).  So the naive form is the fast one; split_dense remains
    available for geometry where the parts are lane-aligned."""
    del out_dtype, is_init  # kept for signature stability at call sites
    cat = jnp.concatenate(
        [l2_normalize(p) if n else p for p, n in zip(parts, normalize)],
        axis=-1,
    )
    return dense(cat)


class JointQAModel(nn.Module):
    """Mixin-style base: subclasses must create in setup():
    self.mmt (TransformerEncoder), self.prev_pred_embeddings,
    self.classifier (FixedVocabClassifier), self.ocr_ptr_net, and define
    bos_idx.  The decode harness then works unchanged."""

    def _scores(self, dec_out, ocr_out, ocr_mask):
        fixed = self.classifier(dec_out)
        dynamic = self.ocr_ptr_net(dec_out, ocr_out, ocr_mask)
        return jnp.concatenate([fixed, dynamic], axis=-1)

    @staticmethod
    def _scatter_dynamic(dynamic, idx, full_n, may_pad, fill=None):
        """Scatter compact-row copy scores [B, S, n_compact] back to the
        full OCR width [B, S, full_n]; non-kept slots pin to -1e4 (the
        documented compact deviation vs the reference's raw 0/1 ptr mask),
        or to ``fill`` [B, S, full_n] when given (compact TRAINING
        substitutes the ref variant's stop-gradient scores there — see
        models/common.set_compact_train).

        ``may_pad``: -1-padded gather lists (t2s_wo_sg) write into a trash
        slot that is sliced away — their rows are masked, and scattering at
        a clamped index would clobber a real slot's score.  Plain t2s
        scatters lane-aligned at full_n directly."""
        b, s, n = dynamic.shape
        idx_b = jnp.broadcast_to(idx[:, None, :], (b, s, n))
        if may_pad:
            safe = jnp.where(idx_b < 0, full_n, idx_b)
            if fill is None:
                full = jnp.full((b, s, full_n + 1), -1e4, dynamic.dtype)
            else:
                full = jnp.pad(
                    fill.astype(dynamic.dtype), ((0, 0), (0, 0), (0, 1))
                )
            return jnp.put_along_axis(
                full, safe, dynamic, axis=-1, inplace=False
            )[..., :full_n]
        if fill is None:
            full = jnp.full((b, s, full_n), -1e4, dynamic.dtype)
        else:
            full = fill.astype(dynamic.dtype)
        return jnp.put_along_axis(full, idx_b, dynamic, axis=-1,
                                  inplace=False)

    # joint sequences are padded so enc+dec is a lane multiple: the flash
    # kernel and the KV caches then need no per-call jnp.pad round-trips
    # (profiled at ~80ms/step at batch 384); padded rows are masked tokens
    # whose outputs are never read, so results are exactly the unpadded ones
    LANE = 128

    def _enc_row_pad(self, l_enc: int, dec_len: int) -> int:
        return (-(l_enc + dec_len)) % self.LANE

    def _mmt_full(self, txt, obj, ocr, enc_mask, ocr_masks, prev_inds,
                  deterministic: bool, embed_ocr=None, dynamic_scatter=None):
        """Single prefix-LM pass with teacher forcing (training path).

        Compact hooks (mirroring _greedy_decode): ``ocr`` may be a
        grounding-gathered row subset; ``embed_ocr`` then supplies the FULL
        OCR stream for the prev-pred copy tables (token ids index the
        original copy space) and ``dynamic_scatter=(idx, full_n, may_pad)``
        scatters the compact copy scores back to full width."""
        dec_len = prev_inds.shape[1]
        dec_emb = self.prev_pred_embeddings(
            self.classifier.table(),
            ocr if embed_ocr is None else embed_ocr,
            prev_inds, deterministic,
        )
        l0 = txt.shape[1] + obj.shape[1] + ocr.shape[1]
        pad = self._enc_row_pad(l0, dec_len)
        # pad rows ride in the SAME concatenate (a separate jnp.pad costs
        # a full extra HBM read+write of the joint sequence — ~3 ms/site
        # at batch 576)
        pieces = [txt, obj, ocr]
        if pad:
            pieces.append(
                jnp.zeros((txt.shape[0], pad, txt.shape[2]), txt.dtype)
            )
            enc_mask = jnp.pad(enc_mask, ((0, 0), (0, pad)))
        pieces.append(dec_emb)
        x = jnp.concatenate(pieces, axis=1)
        h = self.mmt(x, joint_mask_spec(enc_mask, dec_len), deterministic)
        n_ocr = ocr.shape[1]
        ocr_out = h[:, l0 - n_ocr : l0]
        dec_out = h[:, -dec_len:]
        if dynamic_scatter is not None:
            idx, full_n, may_pad, *rest = dynamic_scatter
            fixed = self.classifier(dec_out)
            dynamic = self.ocr_ptr_net(dec_out, ocr_out, ocr_masks)
            dynamic = self._scatter_dynamic(
                dynamic, idx, full_n, may_pad,
                fill=(rest[0] if rest else None),
            )
            return jnp.concatenate([fixed, dynamic], axis=-1)
        return self._scores(dec_out, ocr_out, ocr_masks)

    def _greedy_decode(self, txt, obj, ocr, enc_mask, ocr_masks, dec_len: int,
                       n_variants: int = 1, argmax_variant: int = 0,
                       joint=None, embed_ocr=None, dynamic_scatter=None):
        """Encode once, then KV-cached greedy lax.scan (eval path).

        ``joint``, when given, is the pre-built lane-aligned sequence
        [txt | obj | ocr | pad+dec zeros-or-garbage rows] — e.g. the QTV
        residual buffer (T2S._apply_qtv) — so the concatenate below never
        re-materialises it (~5.4 ms/step at batch 576).  Rows past l0 may
        hold arbitrary finite values: they are masked everywhere and the
        decoder overwrites their cache slots.

        Compact-serving hooks (see models/common.set_compact_serving):
        ``ocr`` may be a grounding-gathered subset of the OCR rows; then
        ``embed_ocr`` supplies the FULL OCR stream for the prev-pred copy
        tables (decoded token ids index the original copy space) and
        ``dynamic_scatter=(idx [B, n_compact], full_n)`` scatters each
        step's compact copy scores back to the full copy space with the
        never-selectable fill -1e4."""
        bN = txt.shape[0]
        b = bN // n_variants
        l0 = txt.shape[1] + obj.shape[1] + ocr.shape[1]
        pad = self._enc_row_pad(l0, dec_len)
        # encode over the full lane-aligned length (enc + pad + dec slots):
        # the per-layer K/V come out cache-sized, and decode overwrites the
        # trailing dec_len slots in place.  The zero rows ride in the same
        # concatenate — a separate jnp.pad re-reads the joint sequence
        if joint is not None and joint.shape[1] == l0 + pad + dec_len:
            x = joint
        elif pad or dec_len:
            zeros = jnp.zeros(
                (bN, pad + dec_len, txt.shape[2]), txt.dtype
            )
            x = jnp.concatenate([txt, obj, ocr, zeros], axis=1)
        else:
            x = jnp.concatenate([txt, obj, ocr], axis=1)
        key_mask_full = jnp.pad(enc_mask, ((0, 0), (0, pad + dec_len)))
        write_offset = l0 + pad

        enc_h, enc_kvs = self.mmt.encode_with_cache(
            x, MaskSpec(key_mask=key_mask_full), deterministic=True
        )
        n_ocr = ocr.shape[1]
        ocr_out = enc_h[:, l0 - n_ocr : l0]
        dec_cache = enc_kvs  # unified: dec slots live at write_offset..+dec
        from vitxtgqa_tpu.models.common import kv_cache_int8_enabled

        if kv_cache_int8_enabled():
            # separate XLA quantize pass on purpose: fusing the int8
            # emission into the flash kernel (encode_with_cache
            # quantize=True) measured 75.6 vs 73.7 ms per layer-call on
            # the v5e — the extra outputs break the kernel's pipelining
            # more than the saved HBM re-read gains
            dec_cache = self.mmt.quantize_cache(enc_kvs)
        lo = argmax_variant * b
        # hoist every loop-invariant projection out of the scan: the
        # normalised prev-pred tables and the OcrPtrNet key projection
        # together profiled at ~57ms/step at batch 384 when recomputed
        # inside the loop
        ans_tbl, ocr_tbl = self.prev_pred_embeddings.tables(
            self.classifier.table(), ocr if embed_ocr is None else embed_ocr
        )
        # ptr keys stay bf16: int8-with-per-token-scales via
        # ptr_scores_int8 measured 39.7 vs 34.3 ms over 12 steps on the
        # v5e (the [B]-grid matvec kernel loses more to per-program
        # overhead than the halved key bytes gain)
        ptr_keys = self.ocr_ptr_net.keys(ocr_out)

        def finish_step(y_t):
            """Shared per-step epilogue: classifier + copy scores + greedy
            argmax (compact-scattered in-scan by default; the post-scan
            variant — compact argmax mapped through the gather list, one
            scatter after the scan — is token-exact but measured -1.0% on
            the v5e, see set_compact_postscan)."""
            fixed = self.classifier(y_t)
            dynamic = self.ocr_ptr_net.scores_from_keys(
                y_t, ptr_keys, ocr_masks
            )
            postscan = dynamic_scatter is not None and compact_postscan_enabled()
            if dynamic_scatter is not None and not postscan:
                # legacy in-scan form (A/B arm, set_compact_postscan(False))
                idx, full_n, may_pad = dynamic_scatter
                dynamic = self._scatter_dynamic(dynamic, idx, full_n, may_pad)
            elif postscan and dynamic_scatter[2]:
                idx = dynamic_scatter[0]
                dynamic = jnp.where(
                    (idx >= 0)[:, None, :], dynamic,
                    jnp.asarray(-1e4, dynamic.dtype),
                )
            scores_t = jnp.concatenate([fixed, dynamic], axis=-1)[:, 0, :]
            nxt = jnp.argmax(scores_t[lo : lo + b], axis=-1)
            if postscan:
                idx = dynamic_scatter[0]
                v_fix = fixed.shape[-1]
                j = jnp.clip(nxt - v_fix, 0, idx.shape[1] - 1)
                mapped = jnp.take_along_axis(
                    idx[lo : lo + b].astype(jnp.int32), j[:, None], axis=1
                )[:, 0]
                nxt = jnp.where(
                    nxt < v_fix, nxt, v_fix + jnp.maximum(mapped, 0)
                )
            nxtN = jnp.concatenate([nxt] * n_variants, axis=0)
            return nxtN, scores_t

        def expand_scores(s):
            """Post-scan compact->full copy-score scatter ([bN, S, v_fix +
            n_compact] -> [bN, S, v_fix + full_n]); identity when serving
            the full geometry or on the legacy in-scan arm."""
            if dynamic_scatter is None or not compact_postscan_enabled():
                return s
            idx, full_n, may_pad = dynamic_scatter
            v_fix = s.shape[-1] - idx.shape[1]
            dyn = self._scatter_dynamic(s[..., v_fix:], idx, full_n, may_pad)
            return jnp.concatenate([s[..., :v_fix], dyn], axis=-1)

        bos = jnp.full((bN,), self.bos_idx, dtype=jnp.int32)

        from vitxtgqa_tpu.models.common import fused_decode_max_batch

        if self.mmt.fused_decode_ok() and bN <= fused_decode_max_batch():
            # single-kernel decode step: all MMT layers in one launch per
            # step, quantized cache rows committed with one DUS per packed
            # array — the fix for the launch-bound batch-1..48 latency
            # (~30 kernels/step -> 3; see ops/pallas_decode_step.py)
            stacks, kv8, kvsc = self.mmt.fused_decode_prep(dec_cache)

            if n_variants == 1 and dynamic_scatter is None:
                # fused epilogue too (serving path): classifier + ptr
                # scores + greedy argmax + next-token embedding in a
                # second launch — a 4-launch step in total.  Gated off for
                # the multi-variant full-eval (the argmax crosses variant
                # rows) and compact scatter (scores stay compact-width
                # in-kernel).
                from vitxtgqa_tpu.ops.pallas_decode_step import (
                    fused_epilogue,
                )

                cls_p = self.classifier.variables["params"]
                w_c = cls_p["weight"]  # [Vfix, D]
                b_c = cls_p["bias"].astype(jnp.float32)
                v_fix = w_c.shape[0]
                v_p = -(-v_fix // self.LANE) * self.LANE
                cls_w_t = (
                    jnp.zeros((w_c.shape[1], v_p), w_c.dtype)
                    .at[:, :v_fix]
                    .set(w_c.T)
                )
                cls_b_pad = (
                    jnp.full((v_p,), -1e30, jnp.float32).at[:v_fix].set(b_c)
                )
                ans_pad = (
                    jnp.zeros((v_p, ans_tbl.shape[-1]), ans_tbl.dtype)
                    .at[:v_fix]
                    .set(ans_tbl)
                )
                ptr_p = self.ocr_ptr_net.query.variables["params"]
                ptr_w = ptr_p["kernel"]
                ptr_b = ptr_p["bias"]
                qk = ptr_w.shape[1]
                # (position, token-type) decoder-slot embedding rows,
                # LN'd — 2*dec_len rows, hoisted out of the scan
                ppe = self.prev_pred_embeddings
                pos_e = ppe.position_embeddings(jnp.arange(dec_len))
                type_e = ppe.token_type_embeddings(jnp.arange(2))
                emb_rows = (
                    ppe.emb_ln(pos_e[:, None, :] + type_e[None, :, :])
                    .reshape(2 * dec_len, -1)
                    .astype(jnp.float32)
                )
                init_emb = ppe.embed(
                    ans_tbl, ocr_tbl, bos[:, None], deterministic=True,
                    position_offset=0,
                )

                def step_ep(carry, t):
                    demb, kv8, kvsc = carry
                    y_t, kv8, kvsc = self.mmt.fused_decode_step_apply(
                        stacks, demb, kv8, kvsc, t, key_mask_full,
                        write_offset,
                    )
                    scores_pad, _tok, demb_next = fused_epilogue(
                        y_t, cls_w_t, cls_b_pad, ptr_w, ptr_b, ptr_keys,
                        ocr_masks, ans_pad, ocr_tbl, emb_rows, t, v_fix,
                        1.0 / (qk ** 0.5), dec_len,
                    )
                    return (demb_next, kv8, kvsc), scores_pad[:, 0, :]

                (_, _, _), s_steps = jax.lax.scan(
                    step_ep, (init_emb, kv8, kvsc), jnp.arange(dec_len)
                )
                s_steps = jnp.transpose(s_steps, (1, 0, 2))
                # slice the classifier pad lanes out ONCE, post-scan.
                # Decode-scores dtype contract: every branch of
                # _greedy_decode returns float32 (finish_step's classifier
                # einsum uses preferred_element_type=f32, ptr_scores_int8
                # emits f32, and fused_epilogue's out_shape is f32) — the
                # cast pins that contract against kernel-side drift.
                return jnp.concatenate(
                    [s_steps[..., :v_fix], s_steps[..., v_p:]], axis=-1
                ).astype(jnp.float32)

            def step_fused(carry, t):
                prev_tok, kv8, kvsc = carry
                dec_emb_t = self.prev_pred_embeddings.embed(
                    ans_tbl, ocr_tbl, prev_tok[:, None],
                    deterministic=True, position_offset=t,
                )
                y_t, kv8, kvsc = self.mmt.fused_decode_step_apply(
                    stacks, dec_emb_t, kv8, kvsc, t, key_mask_full,
                    write_offset,
                )
                nxtN, scores_t = finish_step(y_t)
                return (nxtN, kv8, kvsc), scores_t

            (_, _, _), scores_steps = jax.lax.scan(
                step_fused, (bos, kv8, kvsc), jnp.arange(dec_len)
            )
            return expand_scores(jnp.transpose(scores_steps, (1, 0, 2)))

        def step(carry, t):
            prev_tok, cache = carry
            dec_emb_t = self.prev_pred_embeddings.embed(
                ans_tbl, ocr_tbl, prev_tok[:, None],
                deterministic=True, position_offset=t,
            )
            # compact spec: the XLA path materialises the same bias as the
            # old decode_step_bias(enc_mask_p, t, dec_len); the TPU path
            # feeds the Pallas decode kernel directly (no [B,1,1,L] tensor)
            bias_t = DecodeStepSpec(
                key_mask=key_mask_full, step=t, write_offset=write_offset
            )
            y_t, cache = self.mmt.decode_step(
                dec_emb_t, None, cache, t, bias_t, deterministic=True,
                write_offset=write_offset,
            )
            nxtN, scores_t = finish_step(y_t)
            return (nxtN, cache), scores_t

        (_, _), scores_steps = jax.lax.scan(
            step, (bos, dec_cache), jnp.arange(dec_len)
        )
        return expand_scores(
            jnp.transpose(scores_steps, (1, 0, 2))
        )  # [bN, S, V+N]

    def _recompute_decode(self, txt, obj, ocr, enc_mask, ocr_masks,
                          dec_len: int, n_variants: int = 1,
                          argmax_variant: int = 0):
        """Reference-style greedy decode (full MMT per step, t2s.py:315-354);
        the parity oracle for the cached scan path."""
        bN = txt.shape[0]
        b = bN // n_variants
        lo = argmax_variant * b
        prev_inds = jnp.zeros((bN, dec_len), dtype=jnp.int32)
        prev_inds = prev_inds.at[:, 0].set(self.bos_idx)
        scores = None
        for _ in range(dec_len):
            scores = self._mmt_full(
                txt, obj, ocr, enc_mask, ocr_masks, prev_inds,
                deterministic=True,
            )
            argmax = jnp.argmax(scores[lo : lo + b], axis=-1)
            argmaxN = jnp.concatenate([argmax] * n_variants, axis=0)
            prev_inds = prev_inds.at[:, 1:].set(
                argmaxN[:, :-1].astype(jnp.int32)
            )
        return scores
