"""Direct parity against the reference's evaluator implementation.

The reference's pythia/utils/m4c_evaluators.py is importable standalone
(torch + re only), so answer normalisation, VQA soft accuracy, temporal and
box grounding are compared head-to-head on randomized cases.  Skipped when
the reference tree isn't mounted.
"""

import importlib.util
import os
import random

import numpy as np
import pytest

from vitxtgqa_tpu.metrics import evaluators as OURS

REF_PATH = "/root/reference/pythia/utils/m4c_evaluators.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF_PATH):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_evaluators", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


STRINGS = [
    "The Coffee Shop!", "dont stop", "Two;  apples", "what's up?",
    "a/b\\c", "one, two, three", "y'all  (maybe)", "7-eleven",
    "none left", "STOP  SIGN.", "1,000 points", "it's 3.5 km",
    "", "   ", "@#`_-<>", "he said \"go\"",
]


def test_answer_processor_parity(ref):
    ref_p = ref.EvalAIAnswerProcessor()
    our_p = OURS.EvalAIAnswerProcessor()
    for s in STRINGS:
        assert our_p(s) == ref_p(s), repr(s)


def test_vqa_accuracy_parity(ref):
    rng = random.Random(0)
    words = ["stop", "exit", "go", "open shop", "7", "dont"]
    entries = []
    for _ in range(30):
        gt = [rng.choice(words) for _ in range(10)]
        entries.append({"pred_answer": rng.choice(words + ["zzz"]),
                        "gt_answers": gt})
    ref_scores, ref_acc = ref.TextVQAAccuracyEvaluator().eval_pred_list(
        [], [dict(e) for e in entries]
    )
    our_scores, our_acc = OURS.TextVQAAccuracyEvaluator().eval_pred_list(entries)
    assert np.allclose(our_scores, ref_scores)
    assert abs(our_acc - ref_acc) < 1e-9


def _box_entries(seed, one_hit_max=True):
    rng = random.Random(seed)
    entries = []
    for _ in range(25):
        fps = 10
        gt_frame = rng.randint(1, 40)
        gt_box = sorted(rng.sample(range(0, 200), 2)) + sorted(
            rng.sample(range(0, 120), 2)
        )
        gt_box = [gt_box[0], gt_box[2], gt_box[1], gt_box[3]]
        # prediction: one frame, topk boxes
        pred_frame = [rng.randint(1, 40)]
        k = 3
        boxes = []
        for _ in range(k):
            x1, x2 = sorted(rng.sample(range(0, 200), 2))
            y1, y2 = sorted(rng.sample(range(0, 120), 2))
            boxes.append([x1 / 200, y1 / 120, x2 / 200, y2 / 120])
        entries.append(
            {
                "pred_frame": pred_frame,
                "pred_box": boxes,
                "frame_topk": 1,
                "ocr_topk": k,
                "st_gt": [
                    {
                        "temporal_gt": [(gt_frame - 1) / fps, gt_frame / fps],
                        "bbox_gt": {str(gt_frame - 1): gt_box},
                    }
                ],
                "video_fps": fps,
                "width": 200,
                "height": 120,
            }
        )
    return entries


def test_box_grounding_parity_single_hit_cases(ref):
    """With one span and one predicted frame, the reference's duplicate-append
    quirk can't trigger — scores must match exactly."""
    entries = _box_entries(1)
    ref_scores, ref_acc = ref.BoxGroundAccuracyEvaluator().eval_pred_list(
        [], [dict(e) for e in entries], threshold=0.3
    )
    our_scores, our_acc = OURS.BoxGroundAccuracyEvaluator().eval_pred_list(
        entries, threshold=0.3
    )
    assert our_scores == ref_scores
    assert abs(our_acc - ref_acc) < 1e-9


def test_temporal_parity(ref):
    entries = _box_entries(2)
    ref_acc = ref.TempGroundAccuracyEvaluator().eval_pred_list(
        [dict(e) for e in entries]
    )
    _, our_acc = OURS.TempGroundAccuracyEvaluator().eval_pred_list(entries)
    assert abs(our_acc - ref_acc) < 1e-9


def test_iou_parity(ref):
    rng = random.Random(3)
    ref_ev = ref.BoxGroundAccuracyEvaluator()
    for _ in range(50):
        b1 = sorted(rng.sample(range(0, 100), 2)) + sorted(rng.sample(range(0, 100), 2))
        b2 = sorted(rng.sample(range(0, 100), 2)) + sorted(rng.sample(range(0, 100), 2))
        box1 = [b1[0], b1[2], b1[1], b1[3]]
        box2 = [b2[0], b2[2], b2[1], b2[3]]
        assert abs(
            OURS.box_iou(box1, box2) - ref_ev.calculate_iou(box1, box2)
        ) < 1e-9
