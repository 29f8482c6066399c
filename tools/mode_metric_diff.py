"""Six-metric deviation quantification: exact vs compact vs W8A8 serving
at TRAINED weights.

The compact-serving and W8A8 modes are characterized by token/grounding
AGREEMENT probes (tools/compact_agreement.py, tools/w8a8_agreement.py —
1.000000 token agreement at 300-step overfit weights), but the shipped
metric surface is textvqa_accuracy / stvqa_anls / IOU@tau / GQA@tau
(reference: pythia/modules/metrics.py:233-545).  This tool measures those
six metrics themselves under each mode on a fixture eval set:

  1. train the full-dims T2S on a generated fixture set (real dataset
     pipeline, real losses, batch/step knobs below) — the trainer saves
     best/final checkpoints;
  2. re-load the SAME trained checkpoint into three fresh trainers — exact
     (bf16 + int8 KV), compact (tpu.compact_serving), compact+W8A8 — and
     run the full `evaluate("val")` metric pipeline in each;
  3. emit one JSON line with the three metric dicts and per-metric deltas
     (also written to MODEDIFF.json at the repo root).

Run ON THE TPU CHIP (the compact/W8A8 kernels are TPU-gated; on CPU the
modes fall back and the diff degenerates to ~0).

Env knobs: MODE_DIFF_STEPS (default 300), MODE_DIFF_BATCH (train batch,
default 12), MODE_DIFF_VIDEOS (fixture train videos, default 32),
MODE_DIFF_ROOT (reuse an existing fixture root — single-seed runs only),
MODE_DIFF_MODES (comma list from exact,compact,w8a8 — default all three),
MODE_DIFF_SEEDS (comma list, default "13,29" — each seed generates its
own fixture set AND training run, so the six-metric bound is replicated
across independent data + weights, not anecdotal; the artifact carries
every seed plus a cross-seed max-|delta| summary).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = int(os.environ.get("MODE_DIFF_STEPS", "300"))
TRAIN_BATCH = int(os.environ.get("MODE_DIFF_BATCH", "12"))
N_VIDEOS = int(os.environ.get("MODE_DIFF_VIDEOS", "32"))
MODES = os.environ.get("MODE_DIFF_MODES", "exact,compact,w8a8").split(",")
SEEDS = [int(s) for s in os.environ.get("MODE_DIFF_SEEDS", "13,29").split(",")]


def _build_trainer(opts):
    import vitxtgqa_tpu
    from vitxtgqa_tpu.core.config import build_config
    from vitxtgqa_tpu.core.flags import get_parser
    from vitxtgqa_tpu.core.registry import registry

    vitxtgqa_tpu.setup_imports()
    registry.clear_state()
    args = get_parser().parse_args(opts)
    cfg = build_config(args.config, opts=args.opts, args=args)
    registry.register("config", cfg)
    trainer_cls = registry.get_trainer_class("base_trainer")
    trainer = trainer_cls(cfg)
    trainer.load()
    return trainer


def run_seed(seed: int):
    """One full train + three-mode eval at ``seed`` (fixture generation
    AND trainer rng both derive from it); returns the result dict."""
    fixroot = os.environ.get("MODE_DIFF_ROOT") if len(SEEDS) == 1 else None
    if not fixroot:
        fixroot = os.path.join(
            tempfile.mkdtemp(prefix=f"modediff_s{seed}_"), "data"
        )
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_fixtures.py"),
             "--root", fixroot, "--feat_dim", "1024",
             "--seed", str(seed), "--n_videos", str(N_VIDEOS)],
            check=True, cwd=REPO,
        )
    save_dir = tempfile.mkdtemp(prefix="modediff_save_")

    # NOTE: --flags must precede dotted opts (`opts` is an argparse
    # REMAINDER — flags after the first dotted token are swallowed into it)
    flags = [
        "--config", os.path.join(REPO, "configs", "t2s_abinet.yml"),
        "--model", "t2s", "--datasets", "vtextgqa",
    ]
    common = [
        f"dataset_attributes.vtextgqa.data_root_dir={fixroot}",
        "training_parameters.num_workers=0",
        f"training_parameters.save_dir={save_dir}",
        f"training_parameters.seed={seed}",
        "training_parameters.tpu.use_pallas=True",
        "training_parameters.tpu.kv_cache_int8=True",
        "training_parameters.evalai_inference=False",
    ]

    # ---- 1. train once (exact-mode flags; eval modes don't touch the
    # train path, so these weights serve every arm) ----
    print(f"training {STEPS} steps at batch {TRAIN_BATCH} on {fixroot}",
          file=sys.stderr, flush=True)
    trainer = _build_trainer(flags + ["--run_type", "train"] + common + [
        f"training_parameters.batch_size={TRAIN_BATCH}",
        f"training_parameters.max_iterations={STEPS}",
        "training_parameters.log_interval=100",
        f"training_parameters.snapshot_interval={STEPS}",
        "training_parameters.patience=1000000",
    ])
    trainer.train()
    ckpt = os.path.join(save_dir, "ckpt", "best")
    assert os.path.exists(ckpt), ckpt

    # ---- 2. evaluate the six metrics per mode on the SAME weights ----
    mode_opts = {
        "exact": [],
        "compact": ["training_parameters.tpu.compact_serving=True"],
        "w8a8": ["training_parameters.tpu.compact_serving=True",
                 "training_parameters.tpu.w8a8=True"],
    }
    results = {}
    for mode in MODES:
        t = _build_trainer(
            flags + ["--run_type", "val", "--resume_file", ckpt]
            + common + ["training_parameters.batch_size=48"]
            + mode_opts[mode]
        )
        loss_avg, metric_avg = t.evaluate("val")
        results[mode] = {
            "metrics": {k: round(v, 6) for k, v in metric_avg.items()},
            "losses": {k: round(v, 6) for k, v in loss_avg.items()},
        }
        print(f"{mode}: {results[mode]['metrics']}", file=sys.stderr,
              flush=True)

    deltas = {}
    if "exact" in results:
        base = results["exact"]["metrics"]
        for mode in MODES:
            if mode == "exact":
                continue
            deltas[mode] = {
                k: round(results[mode]["metrics"].get(k, 0.0) - v, 6)
                for k, v in base.items()
            }

    return {
        "seed": seed,
        "steps": STEPS,
        "train_batch": TRAIN_BATCH,
        "fixture_root": fixroot,
        "n_val_samples": len(trainer.datasets.get("val", [])),
        "results": results,
        "deltas_vs_exact": deltas,
    }


def main():
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/vitxtgqa_jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    per_seed = {}
    for seed in SEEDS:
        print(f"=== seed {seed} ===", file=sys.stderr, flush=True)
        per_seed[str(seed)] = run_seed(seed)

    # cross-seed summary: worst-case |delta| per metric per mode — the
    # replicated bound the artifact certifies
    max_abs = {}
    for rec in per_seed.values():
        for mode, d in rec["deltas_vs_exact"].items():
            dst = max_abs.setdefault(mode, {})
            for k, v in d.items():
                dst[k] = round(max(dst.get(k, 0.0), abs(v)), 6)
    out = {
        "metric": "mode_metric_diff",
        "seeds": SEEDS,
        "per_seed": per_seed,
        "max_abs_delta_vs_exact": max_abs,
    }
    with open(os.path.join(REPO, "MODEDIFF.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
