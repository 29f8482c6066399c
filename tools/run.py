"""CLI entry point (reference: tools/run.py:67-88).

  python tools/run.py --config configs/t2s_abinet.yml --model t2s \
      --datasets vtextgqa --run_type train [opts...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import vitxtgqa_tpu
from vitxtgqa_tpu.core.config import build_config
from vitxtgqa_tpu.core.flags import get_parser
from vitxtgqa_tpu.core.registry import registry


def run(argv=None):
    vitxtgqa_tpu.setup_imports()
    args = get_parser().parse_args(argv)
    if not args.config:
        raise SystemExit("--config is required")

    cfg = build_config(args.config, opts=args.opts, args=args,
                       config_override=args.config_override)
    registry.register("config", cfg)

    # honour `training_parameters.device: cpu` (the reference's cpu
    # fallback, configuration.py:309-346): force the JAX platform before
    # any device is touched.  Needed explicitly on images whose
    # sitecustomize pre-registers an accelerator plugin — the
    # JAX_PLATFORMS env var alone does not win there.
    if str(getattr(cfg.training_parameters, "device", "auto")) == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    # multi-host process-group init.  TPU pods auto-initialize, so this is
    # opt-in: set VITXTGQA_DISTRIBUTED=1 (coordinator/process env vars per
    # jax.distributed docs) or `training_parameters.distributed_init: true`.
    # Consumers (jax.process_count() in trainer/collectives) work either way.
    if os.environ.get("VITXTGQA_DISTRIBUTED", "") == "1" or bool(
        getattr(cfg.training_parameters, "distributed_init", False)
    ):
        import jax

        jax.distributed.initialize()

    trainer_cls = registry.get_trainer_class(
        getattr(cfg.training_parameters, "trainer", "base_trainer")
    )
    trainer = trainer_cls(cfg)
    trainer.load()
    try:
        trainer.train()
    except Exception:
        # log the traceback to the run's log file before re-raising
        # (reference: tools/run.py:75-84)
        import traceback

        logger = getattr(trainer, "logger", None)
        if logger is not None:
            logger.write(traceback.format_exc(), "error")
        raise
    return trainer


if __name__ == "__main__":
    run()
