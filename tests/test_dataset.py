"""Dataset assembly tests on synthetic fixtures: shapes, masks, collation."""

import os
import subprocess
import sys

import numpy as np
import pytest

from vitxtgqa_tpu.core.config import build_config
from vitxtgqa_tpu.data.builders import VTextGQABuilder
from vitxtgqa_tpu.data.dataset import collate, polygon_to_xyxy, sample_frames
from vitxtgqa_tpu.data.loader import DataLoader, EpochSampler

FIXROOT = os.path.join(os.path.dirname(__file__), "fixtures", "data")


@pytest.fixture(scope="session")
def fixture_data(repo_root):
    if not os.path.exists(os.path.join(FIXROOT, "vtextgqa")):
        subprocess.run(
            [sys.executable, os.path.join(repo_root, "tools", "make_fixtures.py"),
             "--root", FIXROOT, "--feat_dim", "1024"],
            check=True, cwd=repo_root,
        )
    return FIXROOT


@pytest.fixture(scope="session")
def ds_config(repo_root, fixture_data):
    cfg = build_config(
        os.path.join(repo_root, "configs", "t2s_abinet.yml"),
        opts=[f"dataset_attributes.vtextgqa.data_root_dir={fixture_data}"],
    )
    return cfg.dataset_attributes.vtextgqa


@pytest.fixture(scope="session")
def val_dataset(ds_config):
    return VTextGQABuilder().load("val", ds_config, seed=7)


def test_sample_frames():
    assert sample_frames([1, 2, 3], 5) == [1, 2, 3]
    got = sample_frames(list(range(1, 131)), 64)
    assert len(got) == 64 and got[0] == 1 and got[1] == 3  # step = 130//64 = 2


def test_polygon_to_xyxy():
    assert polygon_to_xyxy([1, 2, 9, 2, 9, 8, 1, 8]) == [1, 2, 9, 8]


def test_sample_shapes(val_dataset):
    s = val_dataset[0]
    nv = val_dataset.answer_processor.get_vocab_size()
    assert s["text"].shape == (20,)
    assert s["video_feat"].shape == (64, 1024)
    assert s["frame_id"].shape == (64,) and s["frame_mask"].shape == (64,)
    assert s["ocr_bbox_coordinates"].shape == (960, 4)
    assert s["track_id"].shape == (960,) and s["temporal_id"].shape == (960,)
    assert s["context_feature_0"].shape == (960, 300)
    assert s["context_feature_1"].shape == (960, 604)
    assert s["targets"].shape == (12, nv)
    assert s["train_prev_inds"].shape == (12,)
    assert len(s["context_tokens"]) == 960


def test_sample_mask_consistency(val_dataset):
    s = val_dataset[0]
    F = int(s["frame_num"])
    assert (s["frame_mask"][:F] == 1).all() and (s["frame_mask"][F:] == 0).all()
    assert (s["frame_id"][:F] > 0).all() and (s["frame_id"][F:] == 0).all()
    # temporal ids of real frames' OCR slots equal that frame id
    for fi in range(F):
        block = s["temporal_id"][fi * 15 : (fi + 1) * 15]
        assert (block == s["frame_id"][fi]).all()
    # masked OCR slots are <pad> tokens with zero boxes
    m = s["ocr_mask"].astype(bool)
    toks = np.array(s["context_tokens"])
    assert (toks[~m] == "<pad>").all()
    assert (s["ocr_bbox_coordinates"][~m] == 0).all()
    # normalised boxes within [0, 1]
    assert s["ocr_bbox_coordinates"].min() >= 0
    assert s["ocr_bbox_coordinates"].max() <= 1.0 + 1e-6


def test_middle_frame_is_last_sampled(val_dataset):
    s = val_dataset[0]
    F = int(s["frame_num"])
    assert s["middel_frame_id"][0] == s["frame_id"][F - 1]
    # mid feature matches the stored frame feature
    np.testing.assert_array_equal(s["mid_img_feat"][0], s["video_feat"][F - 1])


def test_answer_targets_groundable(val_dataset):
    # fixture answers come from OCR tokens -> loss mask must activate
    active = 0
    for i in range(len(val_dataset)):
        s = val_dataset[i]
        active += int(s["train_loss_mask"].sum() > 0)
    assert active >= len(val_dataset) // 2


def test_collate_and_loader(val_dataset):
    loader = DataLoader(val_dataset, batch_size=3, shuffle=True, seed=0)
    batch = next(iter(loader))
    t, h = batch["tensors"], batch["host"]
    assert t["video_feat"].shape == (3, 64, 1024)
    assert t["targets"].shape[0] == 3
    assert len(h["context_tokens"]) == 3 and len(h["context_tokens"][0]) == 960
    assert h["dataset_name"] == "vtextgqa"
    # epoch seeding changes order, same epoch is deterministic
    s = EpochSampler(10, shuffle=True, seed=1)
    s.set_epoch(0)
    a = s.indices()
    s.set_epoch(1)
    b = s.indices()
    assert a != b
    s.set_epoch(0)
    assert s.indices() == a


def test_sampler_rank_sharding():
    parts = []
    for rank in range(4):
        s = EpochSampler(10, shuffle=False, rank=rank, world_size=4)
        parts.append(s.indices())
    assert all(len(p) == 3 for p in parts)  # padded to 12
    flat = sorted(i for p in parts for i in p)
    assert set(flat) == set(range(10))


def test_update_registry_for_model(val_dataset):
    from vitxtgqa_tpu.core.registry import registry

    val_dataset.update_registry_for_model()
    nv = val_dataset.answer_processor.get_true_vocab_size()
    assert registry.get("vtextgqa_num_final_outputs") == nv + 960
    assert registry.get("vtextgqa_answer_processor") is not None


def test_threaded_loader_matches_serial(val_dataset):
    """Thread-pool assembly yields the same deterministic fields in the same
    order (answer teacher-forcing is sampled per fetch by design, so target
    fields are excluded)."""
    stochastic = {"targets", "train_prev_inds", "train_loss_mask"}
    serial = DataLoader(val_dataset, batch_size=2, shuffle=False, num_workers=0)
    threaded = DataLoader(val_dataset, batch_size=2, shuffle=False, num_workers=4)
    for bs, bt in zip(serial, threaded):
        for key in bs["tensors"]:
            if key in stochastic:
                continue
            np.testing.assert_array_equal(
                bs["tensors"][key], bt["tensors"][key], err_msg=key
            )
        assert bs["host"]["context_tokens"] == bt["host"]["context_tokens"]


def test_infinite_batches_resume_epoch(val_dataset):
    """A stream resumed at start_epoch=k replays exactly the uninterrupted
    stream's epoch-k-onward order (checkpoint resume re-seeds the sampler
    like the reference: checkpoint.py:131-136, base_trainer.py:216-223)."""
    from vitxtgqa_tpu.data.loader import infinite_batches

    def qids(stream, n):
        return [
            tuple(next(stream)["tensors"]["question_id"].tolist())
            for _ in range(n)
        ]

    loader = DataLoader(val_dataset, batch_size=2, shuffle=True, seed=3)
    per_epoch = len(loader)
    epochs_a = []
    full = qids(
        infinite_batches(loader, epoch_cb=epochs_a.append), 3 * per_epoch
    )

    loader_b = DataLoader(val_dataset, batch_size=2, shuffle=True, seed=3)
    epochs_b = []
    resumed = qids(
        infinite_batches(loader_b, start_epoch=2, epoch_cb=epochs_b.append),
        per_epoch,
    )
    assert resumed == full[2 * per_epoch :]
    assert epochs_a[:3] == [0, 1, 2] and epochs_b[0] == 2


def test_multi_dataset_iter_from(val_dataset):
    """iter_from(k) continues the deterministic dataset schedule at step k."""
    from vitxtgqa_tpu.data.multi_dataset import MultiDataset

    la = DataLoader(val_dataset, batch_size=2, shuffle=True, seed=0)
    lb = DataLoader(val_dataset, batch_size=2, shuffle=True, seed=1)
    md = MultiDataset({"a": la, "b": lb}, proportional=False, seed=5)
    schedule = [md.dataset_for_step(s) for s in range(10)]
    assert schedule == [
        md.dataset_for_step(s) for s in range(10)
    ]  # pure function of (seed, step)
    it = md.iter_from(7)
    next(it)  # draws from schedule[7]'s loader without error
    assert md.dataset_for_step(7) == schedule[7]
