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
    import importlib

    modules = [
        "vitxtgqa_tpu.data.processors",
        "vitxtgqa_tpu.data.builders",
        "vitxtgqa_tpu.losses",
        "vitxtgqa_tpu.metrics.metrics",
        "vitxtgqa_tpu.models.t2s",
        "vitxtgqa_tpu.models.t2s_ablations",
        "vitxtgqa_tpu.models.m4c",
        "vitxtgqa_tpu.models.t5vitevqa",
        "vitxtgqa_tpu.models.transtr",
        "vitxtgqa_tpu.models.mist",
        "vitxtgqa_tpu.models.gt_box",
        "vitxtgqa_tpu.models.legacy_vqa",
        "vitxtgqa_tpu.training.trainer",
    ]
    for mod in modules:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            if not e.name.startswith("vitxtgqa_tpu"):
                raise  # real missing dependency, not a not-yet-built model
