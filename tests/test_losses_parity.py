"""Parity for the legacy loss family vs torch constructions of the
reference formulas (reference: pythia/modules/losses.py:176-320).

``bce`` — plain BCE over probabilities, mean * target width (losses.py:176-197)
``bce_kl_combined`` — weight_softmax * per-sample KL + width-scaled logit BCE
    (losses.py:199-297)
``multi`` — weighted sum of sub-losses (losses.py:210-266)
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vitxtgqa_tpu.losses import Losses


def _rand(shape, seed, positive=False):
    rng = np.random.RandomState(seed)
    x = rng.randn(*shape).astype(np.float32)
    if positive:
        x = 1.0 / (1.0 + np.exp(-x))  # valid probabilities
    return x


def test_bce_matches_torch():
    scores = _rand((6, 40), 0, positive=True)
    targets = (_rand((6, 40), 1, positive=True) > 0.7).astype(np.float32)
    losses = Losses([{"type": "bce"}])
    got = float(losses({"targets": targets}, {"scores": scores})["vtextgqa/bce"])
    want = (
        F.binary_cross_entropy(
            torch.from_numpy(scores), torch.from_numpy(targets), reduction="mean"
        )
        * targets.shape[1]
    ).item()
    assert got == pytest.approx(want, rel=1e-5)


def _torch_bce_kl(pred, target, weight_softmax):
    pred = torch.from_numpy(pred)
    target = torch.from_numpy(target)
    tar_sum = torch.sum(target, dim=1, keepdim=True)
    tar_sum.masked_fill_(torch.eq(tar_sum, 0), 1.0e-06)
    tar = target / tar_sum
    res = F.log_softmax(pred, dim=1)
    y_is_0 = torch.eq(tar, 0)
    tar_safe = tar.clone()
    tar_safe.masked_fill_(y_is_0, 1)
    log_y = torch.log(tar_safe)
    log_y.masked_fill_(y_is_0, 0)
    loss1 = torch.sum(tar * (log_y - res), dim=1, keepdim=True)
    loss1 = torch.sum(loss1) / loss1.size(0)
    loss2 = F.binary_cross_entropy_with_logits(pred, target, reduction="mean")
    loss2 = loss2 * target.size(1)
    return (weight_softmax * loss1 + loss2).item()


def test_bce_kl_combined_matches_torch():
    pred = _rand((5, 30), 2) * 3.0
    target = np.clip(_rand((5, 30), 3, positive=True) - 0.6, 0, None)
    target[0] = 0.0  # a zero-sum row exercises the 1e-6 path
    losses = Losses([{"type": "bce_kl_combined", "params": {"weight_softmax": 0.3}}])
    got = float(
        losses({"targets": target}, {"scores": pred})["vtextgqa/bce_kl_combined"]
    )
    want = _torch_bce_kl(pred, target, 0.3)
    assert got == pytest.approx(want, rel=1e-4)


def test_multi_weighted_sum():
    scores = _rand((4, 12, 50), 4)
    targets = (_rand((4, 12, 50), 5, positive=True) > 0.8).astype(np.float32)
    mask = np.ones((4, 12), np.float32)
    batch = {"targets": targets, "train_loss_mask": mask}
    output = {"scores": scores}

    multi = Losses(
        [
            {
                "type": "multi",
                "params": {
                    "params": [
                        {"type": "bce_loss", "weight": 0.3, "params": {}},
                        {"type": "bce_loss", "weight": 0.7, "params": {}},
                    ]
                },
            }
        ]
    )
    single = Losses([{"type": "bce_loss"}])
    got = float(multi(batch, output)["vtextgqa/multi"])
    want = float(single(batch, output)["vtextgqa/bce_loss"])  # 0.3+0.7 = 1.0
    assert got == pytest.approx(want, rel=1e-6)
