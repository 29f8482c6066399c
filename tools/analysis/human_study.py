"""Score human-study annotations against GT grounding + answers.

(reference: tools/analysis/human.py — reads an xlsx of human answers/boxes
and scores QA accuracy, ANLS, IoU and GQA; this version consumes a JSON
file of the same records so no spreadsheet dependency is needed.)

Input JSON: a list of entries
  {"question_id": int, "answer": str, "pred_frame": [int, ...],
   "pred_box": [[x1,y1,x2,y2], ...]}   (boxes in pixels)

  python tools/analysis/human_study.py --data_root <root> --split val \
      --predictions humans.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

from vitxtgqa_tpu.metrics.evaluators import (
    BoxGroundAccuracyEvaluator,
    STVQAANLSEvaluator,
    TextVQAAccuracyEvaluator,
)


def score(data_root: str, split: str, predictions_path: str,
          threshold: float = 0.5):
    qa_rows = np.load(
        os.path.join(data_root, "vtextgqa", "ground_annotation",
                     f"qa_sub_{split}.npy"),
        allow_pickle=True,
    )[1:]
    ground_rows = np.load(
        os.path.join(data_root, "vtextgqa", "ground_annotation",
                     f"grouding_anno_{split}.npy"),
        allow_pickle=True,
    )[1:]
    qa_by_qid = {int(r["question_id"]): r for r in qa_rows}
    gt_by_qid = {int(r["question_id"]): r for r in ground_rows}

    with open(predictions_path) as f:
        preds = json.load(f)

    qa_entries, box_entries = [], []
    for p in preds:
        qid = int(p["question_id"])
        qa = qa_by_qid.get(qid)
        gt = gt_by_qid.get(qid)
        if qa is None or gt is None:
            continue
        answers = list(qa["answers"])
        tiled = (answers * 10)[:10] if len(answers) < 10 else answers[:10]
        qa_entries.append({"pred_answer": p["answer"], "gt_answers": tiled})
        # human boxes are already pixel-space: normalise to the evaluator's
        # unit-box convention
        w, h = gt["width"], gt["height"]
        boxes = [
            [b[0] / w, b[1] / h, b[2] / w, b[3] / h] for b in p["pred_box"]
        ]
        box_entries.append(
            {
                "pred_frame": p["pred_frame"],
                "pred_box": boxes,
                "frame_topk": len(p["pred_frame"]),
                "ocr_topk": max(len(boxes) // max(len(p["pred_frame"]), 1), 1),
                "st_gt": gt["spatial_temporal_gt"],
                "video_fps": gt["fps"],
                "width": w,
                "height": h,
            }
        )

    qa_scores, qa_acc = TextVQAAccuracyEvaluator().eval_pred_list(qa_entries)
    _, anls = STVQAANLSEvaluator().eval_pred_list(qa_entries)
    box_scores, iou_acc = BoxGroundAccuracyEvaluator().eval_pred_list(
        box_entries, threshold=threshold
    )
    gqa = [1 if q == 1 and b == 1 else 0 for q, b in zip(qa_scores, box_scores)]
    return {
        "n": len(qa_entries),
        "qa_accuracy": qa_acc,
        "anls": anls,
        f"iou@{threshold}": iou_acc,
        f"gqa@{threshold}": sum(gqa) / max(len(gqa), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--iou", type=float, default=0.5)
    args = ap.parse_args()
    out = score(args.data_root, args.split, args.predictions, args.iou)
    for k, v in out.items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
