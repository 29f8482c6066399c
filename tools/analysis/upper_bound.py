"""Oracle upper bounds of the OCR system: best achievable QA / ANLS / IoU /
GQA given the detections (reference: tools/analysis/upper_bound.py:54-200).

Works over the framework's npy dataset layout (the reference used a json
variant with hard-coded paths):

  python tools/analysis/upper_bound.py --data_root <root> --split test \
      [--ocr_dir fps10_ocr_detection] [--vocab vtextgqa/vocabulary/...txt]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

from vitxtgqa_tpu.data.dataset import polygon_to_xyxy
from vitxtgqa_tpu.metrics.evaluators import STVQAANLSEvaluator, box_iou


def upper_bounds(data_root: str, split: str, ocr_dir: str, vocab_rel: str,
                 iou_threshold: float = 0.5):
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
    ground_by_qid = {int(r["question_id"]): r for r in ground_rows}
    with open(os.path.join(data_root, vocab_rel)) as f:
        vocab = {line.strip().lower() for line in f}

    anls_eval = STVQAANLSEvaluator()
    qa_hits, anls_scores, iou_hits, gqa_hits = [], [], [], []

    for qa in qa_rows:
        video = qa["video_id"]
        ocr_info = np.load(
            os.path.join(data_root, ocr_dir, split, f"{video}.npy"),
            allow_pickle=True,
        ).item()
        ocr_tokens = {
            det["ocr"].lower()
            for dets in ocr_info.values()
            for det in dets
        }
        answer_space = vocab | ocr_tokens

        # QA upper bound: every answer word reachable from vocab+OCR
        qa_ok = 0
        for ans in qa["answers"]:
            if all(w.lower() in answer_space for w in str(ans).split()):
                qa_ok = 1
                break
        qa_hits.append(qa_ok)

        # ANLS upper bound: best token vs each GT answer
        best = 0.0
        for ans in qa["answers"]:
            best = max(
                best,
                max(
                    (anls_eval.get_anls(str(ans), tok) for tok in answer_space),
                    default=0.0,
                ),
            )
        anls_scores.append(best)

        # IoU upper bound: any detected box in a GT-span frame beats tau
        gt = ground_by_qid.get(int(qa["question_id"]))
        hit = 0
        if gt is not None:
            fps = int(gt["fps"])
            for span in gt["spatial_temporal_gt"]:
                t0, t1 = span["temporal_gt"]
                st, ed = int(t0 * fps) + 1, int(t1 * fps) + 1
                for fid_key, gt_box in span["bbox_gt"].items():
                    frame_id = int(fid_key) + 1
                    if not (st <= frame_id <= ed):
                        continue
                    dets = ocr_info.get(str(frame_id), [])
                    for det in dets:
                        if box_iou(gt_box, polygon_to_xyxy(det["points"])) > iou_threshold:
                            hit = 1
        iou_hits.append(hit)
        gqa_hits.append(1 if qa_ok and hit else 0)

    n = max(len(qa_rows), 1)
    return {
        "qa_upper": sum(qa_hits) / n,
        "anls_upper": sum(anls_scores) / n,
        f"iou@{iou_threshold}_upper": sum(iou_hits) / n,
        f"gqa@{iou_threshold}_upper": sum(gqa_hits) / n,
        "n": len(qa_rows),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--ocr_dir", default="fps10_ocr_detection")
    ap.add_argument("--vocab", default="vtextgqa/vocabulary/fixed_vocab_top5k.txt")
    ap.add_argument("--iou", type=float, default=0.5)
    args = ap.parse_args()
    out = upper_bounds(args.data_root, args.split, args.ocr_dir, args.vocab, args.iou)
    for k, v in out.items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
