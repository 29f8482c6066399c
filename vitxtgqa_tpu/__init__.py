"""vitxtgqa_tpu: TPU-native grounded TextVideoQA framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zhousheng97/ViTXT-GQA (the Pythia/MMF-derived T2S-QA reference).  The
registry is populated by the explicit import manifest in
`vitxtgqa_tpu.setup_imports` — call it (or just import the subpackages you
need) before resolving names from configs.
"""

__version__ = "0.1.0"

from vitxtgqa_tpu.core.registry import registry  # noqa: F401


def setup_imports() -> None:
    """Import every module that registers models/processors/losses/metrics.

    Explicit manifest instead of the reference's filesystem glob-import
    (reference: tools/run.py:13-64).
    """
    import vitxtgqa_tpu.data.processors  # noqa: F401
    import vitxtgqa_tpu.data.builders  # noqa: F401
    import vitxtgqa_tpu.losses  # noqa: F401
    import vitxtgqa_tpu.metrics.metrics  # noqa: F401
    import vitxtgqa_tpu.models.t2s  # noqa: F401
    import vitxtgqa_tpu.models.t2s_ablations  # noqa: F401
    import vitxtgqa_tpu.models.m4c  # noqa: F401
    import vitxtgqa_tpu.models.t5vitevqa  # noqa: F401
    import vitxtgqa_tpu.models.transtr  # noqa: F401
    import vitxtgqa_tpu.models.mist  # noqa: F401
    import vitxtgqa_tpu.models.gt_box  # noqa: F401
    import vitxtgqa_tpu.training.trainer  # noqa: F401
