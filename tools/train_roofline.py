"""Train-step roofline accounting: analytic MXU ideals per term vs the
measured device profile — the serving-style %-of-ideal table for training
(BASELINE.md; serving's table lives in ROADMAP.md).

Model of the step (batch B, 3 contrastive variants, joint length L=1152 at
production dims, hidden d=768, bf16 on one v5e @ ~197 TFLOP/s):

  * matmul FLOPs per transformer layer, forward:
      projections (QKV+O+FFN) = 24*B*L*d^2;  attention dots = 4*B*L^2*d
  * backward = 2x forward FLOPs (each matmul contributes dX and dW);
  * selective remat "attn" (the shipped default): the backward re-runs the
    non-attention forward once (projections x4 total: fwd + recompute +
    2x bwd) but reuses the saved flash-attention context (attention x3);
  * attention dots run at HALF the MXU rate: the per-head contraction /
    output width is head_dim=64 against the 128-lane MXU tile (the same
    structural ceiling the serving profile documents for the flash
    kernel, ROADMAP.md).

The MMT sees all 3 variants (B_eff=3B, variant-scanned); QTV and text_bert
see B once.  Modality projections, classifier/ptr heads, optimizer update
and losses are accounted as minor terms.

Usage:
  python tools/train_roofline.py [--batch 48] [--profile /tmp/trace]
With --profile (a jax.profiler trace captured via
`BENCH_PROFILE_DIR=/tmp/trace BENCH_AXES=train python bench.py`), measured
self-times are bucketed by op name and compared per term.

Why batch scaling is flat (96.3 videos/s @ 48 -> 93.2 @ 96): at batch 48
the MMT matmuls already run at [3B*L, d] = [165888, 768] — thousands of
MXU tiles deep, fully pipeline-saturated — so doubling the batch doubles
both FLOPs and time.  Serving scales with batch because its decode loop
amortises per-step launch overhead; the train step has no such loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

V5E_BF16_TFLOPS = 197e12
ATTN_RATE = 0.5  # contraction/output-64 vs the 128-wide MXU tile


def layer_flops(b, L, d):
    proj = 24 * b * L * d * d
    attn = 4 * b * L * L * d
    return proj, attn


def analytic_terms(batch: int, cfg) -> dict:
    d = int(cfg.mmt.hidden_size) if hasattr(cfg.mmt, "hidden_size") else 768
    n_mmt = int(cfg.mmt.num_hidden_layers)
    n_qtv = int(cfg.translayers.num_hidden_layers)
    n_txt = int(cfg.text_bert.num_hidden_layers)
    L = 1152  # lane-aligned joint length at production dims (20+64+960+12)
    L_txt = 20
    b3 = 3 * batch  # MMT runs all 3 contrastive variants

    terms = {}

    proj, attn = layer_flops(b3, L, d)
    # remat "attn": projections fwd + recompute + 2x bwd; attention fwd +
    # 2x bwd (saved context, no recompute)
    terms["mmt projections+FFN (fwd+remat+bwd)"] = proj * n_mmt * 4
    terms["mmt attention dots (fwd+bwd, half-rate)"] = (
        attn * n_mmt * 3 / ATTN_RATE
    )

    proj_q, attn_q = layer_flops(batch, L, d)
    terms["qtv projections+FFN (fwd+remat+bwd)"] = proj_q * n_qtv * 4
    terms["qtv attention dots (fwd+bwd, half-rate)"] = (
        attn_q * n_qtv * 3 / ATTN_RATE
    )

    proj_t, attn_t = layer_flops(batch, L_txt, d)
    terms["text_bert (fwd+remat+bwd)"] = (proj_t * 4 + attn_t * 3 / ATTN_RATE) * n_txt

    # modality input projections (ocr 300+604+50+50 -> d, obj 1024+50 -> d,
    # bbox 4 -> d), fwd+remat+bwd
    n_ocr, n_obj = 960, 64
    terms["modality projections"] = (
        2 * batch * (n_ocr * (1004 + 4) + n_obj * 1074) * d * 4
    )
    # decode heads: fixed classifier (5050) + ptr scores over 960 rows,
    # 12 steps, 3 variants
    terms["classifier+ptr heads"] = (
        2 * b3 * 12 * d * 5050 + 2 * b3 * 12 * d * n_ocr
    ) * 4
    return terms


def bucket_profile(profile_dir: str):
    """Group measured device self-times (us) by (phase, module, op kind).

    Uses only the DEVICE table (tables[0]) — iterating every table the
    converter returns double-counts (the round-3 first cut read 981 ms
    for a 490 ms step)."""
    from tools.profile_summary import find_xplane

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from xprof.convert import raw_to_tool_data as rttd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data(
        [find_xplane(profile_dir)], "framework_op_stats", {"tqx": "out:json;"}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    obj = json.loads(data)
    tables = obj if isinstance(obj, list) else [obj.get("table", obj)]
    tbl = tables[0]
    cols = [c.get("label", c.get("id", "")) for c in tbl.get("cols", [])]

    def idx(*names):
        for n in names:
            for i, c in enumerate(cols):
                if n.lower() in str(c).lower():
                    return i
        return None

    i_name, i_self, i_type = (
        idx("op name", "operation name"), idx("total self"), idx("type"),
    )
    top_rows = []  # (self_us, name, type) for per-op attribution (--top)
    if i_name is None or i_self is None:
        raise RuntimeError(
            "framework_op_stats table lacks an op-name/self-time column "
            f"(cols={cols}); profile format changed?"
        )
    buckets = {}
    total = 0.0
    for row in tbl.get("rows", []):
        c = row["c"]
        try:
            self_us = float(c[i_self].get("v", 0) or 0)
        except (TypeError, ValueError):
            continue
        name = str(c[i_name].get("v", ""))
        typ = str(c[i_type].get("v", "")) if i_type is not None else "?"
        total += self_us
        phase = "bwd" if "transpose(jvp" in name else "fwd"
        if "mmt" in name:
            mod = "mmt"
        elif "qtv" in name or "_apply_qtv" in name:
            mod = "qtv"
        elif "text" in name:
            mod = "text_bert"
        else:
            mod = "misc"
        low = typ.lower()
        nlow = name.lower()
        if "pallas" in low or "custom" in low:
            kind = "pallas"
        elif "dot" in low or "conv" in low:
            kind = "dot"
        elif "reduce" in low:
            kind = "reduce"
        elif ("threefry" in nlow or "random" in nlow or "rng" in nlow
              or "prng" in nlow):
            # dropout-mask generation (threefry counter hash + bit
            # mangling) — the round-4 "fwd misc elementwise" attribution
            # question: is the 13.1 ms bucket mask cost?
            kind = "rng/dropout-mask"
        else:
            kind = "elementwise/other"
        key = f"{phase} {mod} {kind}"
        buckets[key] = buckets.get(key, 0.0) + self_us
        top_rows.append((self_us, name, typ, key))
    top_rows.sort(reverse=True)
    return buckets, total, top_rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--measured_step_ms", type=float, default=None,
                    help="measured train-step device/wall ms (e.g. from "
                         "bench.py axis_train chained_block_s / iters)")
    ap.add_argument("--profile", default=None)
    ap.add_argument("--top", type=int, default=0,
                    help="also print the N largest individual ops "
                         "(self-time) with their bucket — per-op "
                         "attribution for the misc buckets")
    ap.add_argument("--bucket", default=None,
                    help="restrict --top to ops in buckets containing "
                         "this substring (e.g. 'fwd misc')")
    args = ap.parse_args()

    from vitxtgqa_tpu.core.config import build_config

    cfg = build_config(
        os.path.join(REPO, "configs", "t2s_abinet.yml")
    ).model_attributes.t2s

    terms = analytic_terms(args.batch, cfg)
    total_flops = sum(terms.values())
    ideal_ms = total_flops / V5E_BF16_TFLOPS * 1e3

    print(f"train-step MXU roofline @ batch {args.batch} (bf16, v5e "
          f"{V5E_BF16_TFLOPS/1e12:.0f} TFLOP/s, remat=attn, variant-scan):")
    out_terms = {}
    for k, v in sorted(terms.items(), key=lambda kv: -kv[1]):
        ms = v / V5E_BF16_TFLOPS * 1e3
        out_terms[k] = round(ms, 1)
        print(f"  {ms:7.1f} ms  {100*v/total_flops:5.1f}%  {k}")
    print(f"  {ideal_ms:7.1f} ms  TOTAL ideal")

    result = {"batch": args.batch, "ideal_ms": round(ideal_ms, 1),
              "terms_ms": out_terms}
    if args.measured_step_ms:
        pct = 100.0 * ideal_ms / args.measured_step_ms
        result["measured_step_ms"] = args.measured_step_ms
        result["pct_of_ideal"] = round(pct, 1)
        print(f"measured step: {args.measured_step_ms:.1f} ms -> "
              f"{pct:.1f}% of MXU ideal")
    if args.profile:
        buckets, total, top_rows = bucket_profile(args.profile)
        result["profile_buckets_ms"] = {
            k: round(v / 1e3, 1) for k, v in buckets.items()
        }
        result["profile_total_ms"] = round(total / 1e3, 1)
        print("profile buckets (device self-time):")
        for k, v in buckets.items():
            print(f"  {v/1e3:7.1f} ms  {k}")
        print(f"  {total/1e3:7.1f} ms  total")
        if args.top:
            rows = [
                r for r in top_rows
                if args.bucket is None or args.bucket in r[3]
            ][: args.top]
            print(f"top {len(rows)} ops"
                  + (f" in buckets ~'{args.bucket}'" if args.bucket else "")
                  + ":")
            for self_us, name, typ, key in rows:
                print(f"  {self_us/1e3:7.2f} ms  [{key}] {typ}  {name[:120]}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
