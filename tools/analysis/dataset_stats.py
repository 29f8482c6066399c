"""Dataset distribution statistics.

Consolidates the reference's 12 per-plot scripts (tools/analysis/dataset/
anno_box_*_distribution.py, anno_temporal_span_*.py, ans_len_distribution.py,
frame_number_distribution.py, ocr_number_distribution.py,
sampled_grounded_frame_ratio.py) into one tool that emits every statistic as
a JSON report (no matplotlib dependency; plot with any frontend).

  python tools/analysis/dataset_stats.py --data_root <root> --split val
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

from vitxtgqa_tpu.data.dataset import sample_frames


def _histogram(values, bins=10):
    if not values:
        return {"count": 0}
    arr = np.asarray(values, dtype=np.float64)
    hist, edges = np.histogram(arr, bins=bins)
    return {
        "count": int(arr.size),
        "mean": float(arr.mean()),
        "std": float(arr.std()),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "hist": hist.tolist(),
        "bin_edges": [float(e) for e in edges],
    }


def compute_stats(data_root: str, split: str, ocr_dir: str, num_frames: int = 64):
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

    ans_lens, frame_counts, ocr_counts = [], [], []
    box_sizes, box_ratios, box_cx, box_cy = [], [], [], []
    span_lens, span_ratios, span_centers = [], [], []
    grounded_sampled_ratio = []

    seen_videos = set()
    for qa in qa_rows:
        ans_lens.extend(len(str(a).split()) for a in qa["answers"])
        video = qa["video_id"]
        ocr_path = os.path.join(data_root, ocr_dir, split, f"{video}.npy")
        if video not in seen_videos and os.path.exists(ocr_path):
            seen_videos.add(video)
            ocr_info = np.load(ocr_path, allow_pickle=True).item()
            frame_counts.append(len(ocr_info))
            ocr_counts.extend(len(d) for d in ocr_info.values())

        gt = ground_by_qid.get(int(qa["question_id"]))
        if gt is None:
            continue
        w, h = gt["width"], gt["height"]
        fps = int(gt["fps"])
        n_video_frames = frame_counts[-1] if frame_counts else num_frames
        duration = max(n_video_frames / fps, 1e-6)
        sampled = set(sample_frames(list(range(1, n_video_frames + 1)), num_frames))
        grounded_frames = set()
        for span in gt["spatial_temporal_gt"]:
            t0, t1 = span["temporal_gt"]
            span_lens.append(t1 - t0)
            span_ratios.append((t1 - t0) / duration)
            span_centers.append(((t0 + t1) / 2) / duration)
            st, ed = int(t0 * fps) + 1, int(t1 * fps) + 1
            grounded_frames.update(range(st, ed + 1))
            for box in span["bbox_gt"].values():
                x1, y1, x2, y2 = box
                bw, bh = max(x2 - x1, 1e-6), max(y2 - y1, 1e-6)
                box_sizes.append(bw * bh / (w * h))
                box_ratios.append(bw / bh)
                box_cx.append((x1 + x2) / 2 / w)
                box_cy.append((y1 + y2) / 2 / h)
        if grounded_frames:
            grounded_sampled_ratio.append(
                len(grounded_frames & sampled) / len(grounded_frames)
            )

    return {
        "answer_length": _histogram(ans_lens),
        "frames_per_video": _histogram(frame_counts),
        "ocr_per_frame": _histogram(ocr_counts),
        "gt_box_area_fraction": _histogram(box_sizes),
        "gt_box_aspect_ratio": _histogram(box_ratios),
        "gt_box_center_x": _histogram(box_cx),
        "gt_box_center_y": _histogram(box_cy),
        "temporal_span_seconds": _histogram(span_lens),
        "temporal_span_video_fraction": _histogram(span_ratios),
        "temporal_span_center": _histogram(span_centers),
        "grounded_frame_sampled_ratio": _histogram(grounded_sampled_ratio),
        "n_questions": len(qa_rows),
        "n_videos": len(seen_videos),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--ocr_dir", default="fps10_ocr_detection")
    ap.add_argument("--out", default=None, help="write JSON here (default stdout)")
    args = ap.parse_args()
    stats = compute_stats(args.data_root, args.split, args.ocr_dir)
    blob = json.dumps(stats, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob)
        print(f"wrote {args.out}")
    else:
        print(blob)


if __name__ == "__main__":
    main()
