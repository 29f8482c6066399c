"""Checkpoint-parity runbook: released torch checkpoint -> converted JAX
eval -> six-metric diff, in one command.

The released T2S checkpoints (reference README.md:111) and the real
ViTXT-GQA data are not in this image; the day they exist this is the
zero-thought run:

  python tools/checkpoint_parity.py \
      --torch_ckpt /path/to/best.ckpt \
      --config configs/t2s_abinet.yml --model t2s \
      --reference_metrics ref_metrics.json \
      dataset_attributes.vtextgqa.data_root_dir=/path/to/data

and on the reference side:

  bash scripts/val_t2s_abinet.sh 0 <dir> /path/to/best.ckpt val
  (record the six printed metrics into ref_metrics.json as
   {"vtextgqa/textvqa_accuracy": ..., "vtextgqa/stvqa_anls": ...,
    "vtextgqa/IOU@0.3": ..., "vtextgqa/IOU@0.5": ...,
    "vtextgqa/GQA@0.3": ..., "vtextgqa/GQA@0.5": ...})

What it does:
  1. loads the torch checkpoint (handles the reference's {"model": sd}
     layout and DataParallel "module." prefixes, checkpoint.py:101-111,
     221-224);
  2. converts through utils/torch_convert with the per-model wiring used
     by the full-model parity tests;
  3. forces `run_type: val` + `training_parameters.reference_compat: true`
     (bug-for-bug metric semantics — see metrics/evaluators.py) and runs
     the full validation;
  4. writes a JSON report with the six metrics and, when
     --reference_metrics is given, the per-metric diff; exits non-zero if
     any |diff| exceeds --tol.

Exercised against fixture-shaped stand-ins in
tests/test_checkpoint_parity_runbook.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SIX_METRICS = (
    "vtextgqa/textvqa_accuracy", "vtextgqa/stvqa_anls",
    "vtextgqa/IOU@0.3", "vtextgqa/IOU@0.5",
    "vtextgqa/GQA@0.3", "vtextgqa/GQA@0.5",
)


def load_torch_state_dict(path: str):
    """Reference checkpoint layout: {"model": sd, ...} or a bare sd;
    DP/DDP "module." prefixes stripped (checkpoint.py:101-111)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            out[k] = v
    return out


def convert_for_model(sd, model_key: str, model_cfg):
    """Dispatch to the converter wiring each model family needs (mirrors
    tests/test_*_full_model_parity.py)."""
    from vitxtgqa_tpu.utils import torch_convert as TC

    def layers(sect, default):
        node = getattr(model_cfg, sect, None)
        return int(getattr(node, "num_hidden_layers", default) or default)

    text_layers = layers("text_bert", 3)
    mmt_layers = layers("mmt", 4)
    qtv_layers = layers("translayers", 2)

    if model_key in ("t2s", "t2s_wo_tg", "t2s_wo_sg", "gt_box"):
        return TC.convert_t2s_like(
            sd, text_layers=text_layers, qtv_layers=qtv_layers,
            mmt_layers=mmt_layers,
        )
    if model_key == "m4c":
        return TC.convert_t2s_like(
            sd, text_layers=text_layers, mmt_layers=mmt_layers,
            has_qtv=False, has_grounding=False, has_posthoc=True,
            obj_has_frame_embed=False, ocr_has_ids=False,
        )
    if model_key == "t5vitevqa":
        return TC.convert_t2s_like(
            sd, text_layers=text_layers, mmt_layers=mmt_layers,
            has_qtv=False, has_grounding=False, has_posthoc=True,
        )
    if model_key == "transtr":
        return TC.convert_transtr(
            sd, text_layers=text_layers, mmt_layers=mmt_layers,
        )
    if model_key == "mist":
        return TC.convert_mist(
            sd, text_layers=text_layers, mmt_layers=mmt_layers,
        )
    raise SystemExit(f"no converter wiring for model {model_key!r}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--model", default="t2s")
    ap.add_argument("--datasets", default="vtextgqa")
    ap.add_argument("--split", default="val")
    ap.add_argument("--reference_metrics", default=None,
                    help="JSON file with the reference run's six metrics")
    ap.add_argument("--tol", type=float, default=5e-4)
    ap.add_argument("--out", default="checkpoint_parity_report.json")
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("opts", nargs="*", default=[],
                    help="dotted config overrides (data_root_dir etc.)")
    args = ap.parse_args(argv)

    import jax

    import vitxtgqa_tpu
    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.core.registry import registry
    from vitxtgqa_tpu.utils import torch_convert as TC

    vitxtgqa_tpu.setup_imports()
    opts = list(args.opts) + [
        f"model={args.model}",
        f"datasets={args.datasets}",
        "training_parameters.reference_compat=True",
        f"training_parameters.seed={args.seed}",
        f"training_parameters.run_type={args.split}",
    ]
    cfg = build_config(args.config, opts=opts)
    registry.register("config", cfg)

    sd = load_torch_state_dict(args.torch_ckpt)
    flat = convert_for_model(
        sd, args.model, cfg.model_attributes[args.model]
    )

    trainer_cls = registry.get_trainer_class(
        getattr(cfg.training_parameters, "trainer", "base_trainer")
    )
    trainer = trainer_cls(cfg)
    trainer.load()
    params = jax.tree_util.tree_map(lambda a: a, trainer.params)
    params = TC.convert_into_params(flat, jax.device_get(params), strict=True)
    trainer.params = jax.device_put(params, trainer.param_sharding)

    loss_avg, metric_avg = trainer.evaluate(args.split)
    got = {k: float(metric_avg.get(k, float("nan"))) for k in SIX_METRICS}

    report = {
        "torch_ckpt": args.torch_ckpt,
        "config": args.config,
        "model": args.model,
        "split": args.split,
        "reference_compat": True,
        "metrics": got,
        "losses": {k: float(v) for k, v in (loss_avg or {}).items()},
    }
    status = 0
    if args.reference_metrics:
        with open(args.reference_metrics) as f:
            want = json.load(f)
        diffs = {
            k: got[k] - float(want[k]) for k in SIX_METRICS if k in want
        }
        report["reference"] = want
        report["diff"] = diffs
        report["max_abs_diff"] = max(abs(d) for d in diffs.values())
        if report["max_abs_diff"] > args.tol:
            status = 1
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return status


if __name__ == "__main__":
    raise SystemExit(main())
