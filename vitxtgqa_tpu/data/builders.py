"""Dataset builders (registry-keyed, config-driven).

(reference: pythia/datasets/base_dataset_builder.py:41-122,
 videoqa/vtextgqa/builder.py:7-12, videoqa/gt_box_clipocr/builder.py:7)
"""

from __future__ import annotations

import random
from typing import Any, Optional

from vitxtgqa_tpu.core.registry import registry
from vitxtgqa_tpu.data.dataset import VTextGQADataset


@registry.register_builder("vtextgqa")
class VTextGQABuilder:
    dataset_name = "vtextgqa"
    dataset_class = VTextGQADataset

    def build(self, dataset_type: str, config: Any) -> None:
        """One-time data preparation; nothing to download in this framework."""

    def load(
        self, dataset_type: str, config: Any, seed: Optional[int] = None
    ) -> VTextGQADataset:
        rng = random.Random(seed)
        return self.dataset_class(dataset_type, config, rng=rng)


@registry.register_builder("gt_box")
@registry.register_builder("gt_box_clipocr")
class GTBoxBuilder(VTextGQABuilder):
    """Oracle variant: exposes GT grounding annotations to the model
    (reference: pythia/datasets/videoqa/gt_box_clipocr/)."""

    dataset_name = "gt_box_clipocr"

    def load(self, dataset_type, config, seed=None):
        from vitxtgqa_tpu.data.gt_box_dataset import GTBoxDataset

        return GTBoxDataset(dataset_type, config, rng=random.Random(seed))


class _LegacyVQABuilderBase:
    """Shared legacy image-VQA builder lifecycle
    (reference: vqa2/builder.py:18-89): one dataset per imdb file, concat
    when several; `update_registry_for_model` rides on the dataset
    (vqa2/builder.py:40-48 — the trainer calls it there)."""

    dataset_name = "vqa2"
    dataset_class = None  # set by subclasses

    def build(self, dataset_type: str, config: Any) -> None:
        """reference vqa2/builder.py:36-38: nothing to download."""

    def load(self, dataset_type: str, config: Any, seed: Optional[int] = None):
        imdb_files = config.imdb_files
        if dataset_type not in imdb_files:
            raise ValueError(f"no imdb for split {dataset_type}")
        rng = random.Random(seed)
        datasets = [
            self.dataset_class(dataset_type, config, imdb_file_index=i, rng=rng)
            for i in range(len(imdb_files[dataset_type]))
        ]
        if len(datasets) == 1:
            return datasets[0]
        from vitxtgqa_tpu.data.concat_dataset import ConcatDataset

        return ConcatDataset(datasets)


from vitxtgqa_tpu.data.legacy_vqa_datasets import (  # noqa: E402
    TextVQADataset,
    VizWizDataset,
    VQA2Dataset,
    VQA2OCRDataset,
)


@registry.register_builder("vqa2")
class VQA2Builder(_LegacyVQABuilderBase):
    dataset_name = "vqa2"
    dataset_class = VQA2Dataset


@registry.register_builder("vizwiz")
class VizWizBuilder(_LegacyVQABuilderBase):
    """reference vizwiz/builder.py:7-16."""

    dataset_name = "vizwiz"
    dataset_class = VizWizDataset


@registry.register_builder("textvqa")
class TextVQABuilder(_LegacyVQABuilderBase):
    """reference textvqa/builder.py:7-12."""

    dataset_name = "textvqa"
    dataset_class = TextVQADataset


@registry.register_builder("vqa2_ocr")
class VQA2OCRBuilder(_LegacyVQABuilderBase):
    """reference vqa2/ocr_builder.py:7-12."""

    dataset_name = "vqa2_ocr"
    dataset_class = VQA2OCRDataset
