"""Evaluator and metric tests: normalisation, soft accuracy, ANLS, IoU, GQA."""

import numpy as np

from vitxtgqa_tpu.metrics import evaluators as E


def test_evalai_normalisation():
    p = E.EvalAIAnswerProcessor()
    assert p("The Coffee Shop!") == "coffee shop"
    assert p("dont") == "don't"
    assert p("Two") == "2"
    assert p("stop sign?") == "stop sign"


def test_vqa_soft_scores():
    table = E.vqa_soft_scores(["stop"] * 5 + ["exit"] * 5)
    # 5 of 10: leave-one-out -> mix of min(1,5/3) and min(1,4/3) = all 1.0
    assert table["stop"] == 1.0 and table["exit"] == 1.0
    table2 = E.vqa_soft_scores(["stop"] * 2 + ["exit"] * 8)
    assert 0 < table2["stop"] < 1.0


def test_textvqa_accuracy_evaluator():
    ev = E.TextVQAAccuracyEvaluator()
    preds = [
        {"pred_answer": "stop", "gt_answers": ["stop"] * 10},
        {"pred_answer": "wrong", "gt_answers": ["stop"] * 10},
    ]
    scores, acc = ev.eval_pred_list(preds)
    assert scores == [1.0, 0.0] and acc == 0.5


def test_levenshtein_and_anls():
    assert E.levenshtein("kitten", "sitting") == 3
    assert E.levenshtein("", "abc") == 3
    ev = E.STVQAANLSEvaluator()
    assert ev.get_anls("hello", "hello") == 1.0
    assert ev.get_anls("hello", "hellp") == 0.8
    assert ev.get_anls("abc", "xyz") == 0.0  # below .5 floor


def test_box_iou():
    assert E.box_iou([0, 0, 9, 9], [0, 0, 9, 9]) == 1.0
    assert E.box_iou([0, 0, 9, 9], [100, 100, 109, 109]) == 0.0
    v = E.box_iou([0, 0, 9, 9], [5, 0, 14, 9])
    assert 0.3 < v < 0.4  # 50/150


def _box_entry(pred_frame, pred_box, gt_frame, gt_box, fps=10):
    return {
        "pred_frame": pred_frame,
        "pred_box": pred_box,
        "frame_topk": len(pred_frame),
        "ocr_topk": 1,
        "st_gt": [
            {
                "temporal_gt": [(gt_frame - 1) / fps, gt_frame / fps],
                "bbox_gt": {str(gt_frame - 1): gt_box},
            }
        ],
        "video_fps": fps,
        "width": 100,
        "height": 100,
    }


def test_box_ground_evaluator_hit_and_miss():
    ev = E.BoxGroundAccuracyEvaluator()
    # predicted frame 5 inside GT span around frame 5, box matches exactly
    hit = _box_entry([5], [[0.1, 0.1, 0.5, 0.5]], 5, [10, 10, 50, 50])
    miss_box = _box_entry([5], [[0.7, 0.7, 0.9, 0.9]], 5, [10, 10, 50, 50])
    miss_frame = _box_entry([50], [[0.1, 0.1, 0.5, 0.5]], 5, [10, 10, 50, 50])
    scores, acc = ev.eval_pred_list([hit, miss_box, miss_frame], threshold=0.5)
    assert scores == [1, 0, 0]
    assert abs(acc - 1 / 3) < 1e-9


def test_box_ground_evaluator_reference_compat():
    """reference_compat restores m4c_evaluators.py:357-406 bit-for-bit:
    one append per matching (span, frame) pair, trailing 0 keyed on the
    LAST pair's flag — so a 2-hit sample contributes 2 entries and a
    hit-then-miss sample contributes both a 1 and a 0."""
    ev = E.BoxGroundAccuracyEvaluator()
    # two predicted frames both inside the span, both with matching boxes
    double_hit = {
        "pred_frame": [5, 6],
        "pred_box": [[0.1, 0.1, 0.5, 0.5], [0.1, 0.1, 0.5, 0.5]],
        "frame_topk": 2,
        "ocr_topk": 1,
        "st_gt": [
            {
                "temporal_gt": [0.4, 0.6],
                "bbox_gt": {"4": [10, 10, 50, 50], "5": [10, 10, 50, 50]},
            }
        ],
        "video_fps": 10,
        "width": 100,
        "height": 100,
    }
    # first frame hits, second frame (also in span, has GT box) misses:
    # reference appends the 1 AND the trailing 0 (last flag False)
    hit_then_miss = {
        "pred_frame": [5, 6],
        "pred_box": [[0.1, 0.1, 0.5, 0.5], [0.7, 0.7, 0.9, 0.9]],
        "frame_topk": 2,
        "ocr_topk": 1,
        "st_gt": [
            {
                "temporal_gt": [0.4, 0.6],
                "bbox_gt": {"4": [10, 10, 50, 50], "5": [10, 10, 50, 50]},
            }
        ],
        "video_fps": 10,
        "width": 100,
        "height": 100,
    }
    fixed_scores, fixed_acc = ev.eval_pred_list(
        [double_hit, hit_then_miss], threshold=0.5
    )
    assert fixed_scores == [1, 1] and fixed_acc == 1.0
    E.set_reference_compat(True)
    try:
        ref_scores, ref_acc = ev.eval_pred_list(
            [double_hit, hit_then_miss], threshold=0.5
        )
    finally:
        E.set_reference_compat(False)
    assert ref_scores == [1, 1, 1, 0]
    assert abs(ref_acc - 0.75) < 1e-9


def test_temporal_evaluator():
    ev = E.TempGroundAccuracyEvaluator()
    entries = [
        _box_entry([5], [[0, 0, 0, 0]], 5, [0, 0, 1, 1]),
        _box_entry([50], [[0, 0, 0, 0]], 5, [0, 0, 1, 1]),
    ]
    scores, acc = ev.eval_pred_list(entries)
    assert scores == [1, 0] and acc == 0.5


def test_decode_answers():
    from vitxtgqa_tpu.core.config import ConfigNode
    from vitxtgqa_tpu.data import processors as procs
    from vitxtgqa_tpu.metrics.metrics import decode_answers
    import os

    cfg = ConfigNode(
        {
            "vocab_file": os.path.join(
                os.path.dirname(__file__), "fixtures", "vocab_small.txt"
            ),
            "preprocessor": {"type": "simple_word", "params": {}},
            "max_length": 4,
            "max_copy_steps": 6,
            "num_answers": 10,
        }
    )
    p = procs.M4CAnswerProcessor(cfg)
    nv = p.get_true_vocab_size()
    stop = p.answer_vocab.word2idx("stop")
    # [stop, OCR#1, EOS, junk] -> "stop banana", decoding halts at EOS
    inds = np.array([[stop, nv + 1, p.EOS_IDX, stop]])
    ctx = [["apple", "banana", "cherry", "date"]]
    assert decode_answers(inds, ctx, p) == ["stop banana"]
