"""Dataset distribution statistics.

Consolidates the reference's per-plot scripts (tools/analysis/dataset/
anno_box_*_distribution.py, anno_temporal_span_*.py, ans_len_distribution.py,
frame_number_distribution.py, ocr_number_distribution.py,
sampled_grounded_frame_ratio.py; box_visualization.py lives in
tools/analysis/box_visualization.py) into one tool that emits every
statistic as a JSON report (no matplotlib dependency; plot with any
frontend).

The `per_script` section of the report carries one entry PER reference
script, named identically, computing the same statistic that script
prints (sums/means/medians, quadrant and thirds bucket counts, cumulative
span-ratio quirk included).  The only substitution: video frame counts
come from the OCR detection store rather than cv2-opening the .mp4 (same
number at 10 fps; raw videos are not shipped here).

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
        "median": float(np.median(arr)),
        "std": float(arr.std()),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "hist": hist.tolist(),
        "bin_edges": [float(e) for e in edges],
    }


def _mms(values):
    """sum/mean/median triple — the numbers every reference script prints."""
    if not values:
        return {"count": 0}
    arr = np.asarray(values, dtype=np.float64)
    return {
        "count": int(arr.size),
        "sum": float(arr.sum()),
        "mean": float(arr.mean()),
        "median": float(np.median(arr)),
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

    ans_lens, first_ans_lens, frame_counts, ocr_counts = [], [], [], []
    ocr_per_frame_by_video, ocr_total_by_video = [], []
    box_sizes, box_ratios, box_cx, box_cy = [], [], [], []
    span_lens, span_ratios, span_centers = [], [], []
    grounded_sampled_ratio = []
    # per-script accumulators (one list per reference script; names below)
    boxes_per_question = []            # anno_box_distribution.py
    quadrants = {"top left": 0, "bottom left": 0,
                 "top right": 0, "bottom right": 0}  # anno_box_location_*
    grounded_frames_over_video = []    # anno_box_ratio_distribution.py
    spans_per_question = []            # anno_temporal_span_distribution.py
    thirds = {"Left": 0, "Middle": 0, "Right": 0}  # ..span_location_*
    cumulative_span_ratio = []         # ..span_ratio_distribution.py (quirk:
    #   the reference appends the RUNNING cumulative ratio after each span)
    sampled_anno_pct, total_anno_pct = [], []  # sampled_grounded_frame_ratio

    frames_by_video = {}
    seen_videos = set()
    for qa in qa_rows:
        ans_lens.extend(len(str(a).split()) for a in qa["answers"])
        # the reference's ans_len_distribution.py measures answers[0] only
        if len(qa["answers"]):
            first_ans_lens.append(len(str(qa["answers"][0]).split()))
        video = qa["video_id"]
        ocr_path = os.path.join(data_root, ocr_dir, split, f"{video}.npy")
        if video not in seen_videos and os.path.exists(ocr_path):
            seen_videos.add(video)
            ocr_info = np.load(ocr_path, allow_pickle=True).item()
            frames_by_video[video] = len(ocr_info)
            frame_counts.append(len(ocr_info))
            ocr_counts.extend(len(d) for d in ocr_info.values())
            total = sum(len(d) for d in ocr_info.values())
            ocr_total_by_video.append(total)
            ocr_per_frame_by_video.append(
                total / len(ocr_info) if ocr_info else 0.0
            )

        gt = ground_by_qid.get(int(qa["question_id"]))
        if gt is None:
            continue
        w, h = gt["width"], gt["height"]
        fps = int(gt["fps"])
        # frame counts come from the OCR store (the reference opens the
        # .mp4 via cv2 — not shipped in this image; same number at 10 fps)
        n_video_frames = frames_by_video.get(video, num_frames)
        duration = float(gt.get("duration", 0) or 0) or max(
            n_video_frames / fps, 1e-6
        )
        sampled = set(sample_frames(list(range(1, n_video_frames + 1)), num_frames))
        grounded_frames = set()
        q_boxes = 0
        q_ground_frames = 0
        ground_ids = []
        running_span = 0.0
        spans = gt["spatial_temporal_gt"]
        spans_per_question.append(len(spans))
        for span in spans:
            t0, t1 = span["temporal_gt"]
            span_lens.append(t1 - t0)
            span_ratios.append((t1 - t0) / duration)
            span_centers.append(((t0 + t1) / 2) / duration)
            # reference cumulative-ratio quirk (anno_temporal_span_ratio_
            # distribution.py:20-24): append the running sum after EVERY span
            running_span += (t1 - t0)
            cumulative_span_ratio.append(running_span / duration)
            # thirds bucket of the span midpoint (..span_location_*.py:13-23)
            mid = t0 + (t1 - t0) / 2
            if mid < duration / 3:
                thirds["Left"] += 1
            elif mid < duration * 2 / 3:
                thirds["Middle"] += 1
            else:
                thirds["Right"] += 1
            st, ed = int(t0 * fps) + 1, int(t1 * fps) + 1
            grounded_frames.update(range(st, ed + 1))
            # reference frame ids for the sampled-ratio script are 0-based
            # int(t)*10 (sampled_grounded_frame_ratio.py:33-36)
            st0, ed0 = int(t0) * 10, int(t1) * 10
            ground_ids.extend(range(st0, ed0 + 1))
            q_ground_frames += ed0 - st0 + 1
            q_boxes += len(span["bbox_gt"])
            for box in span["bbox_gt"].values():
                x1, y1, x2, y2 = box
                bw, bh = max(x2 - x1, 1e-6), max(y2 - y1, 1e-6)
                box_sizes.append(bw * bh / (w * h))
                box_ratios.append(bw / bh)
                box_cx.append((x1 + x2) / 2 / w)
                box_cy.append((y1 + y2) / 2 / h)
                # quadrant of the box centre (anno_box_location_*.py:4-16)
                cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
                horiz = "left" if cx < w / 2 else "right"
                vert = "top" if cy < h / 2 else "bottom"
                quadrants[f"{vert} {horiz}"] += 1
        boxes_per_question.append(q_boxes)
        if n_video_frames > 0:
            grounded_frames_over_video.append(
                q_ground_frames / n_video_frames
            )
            total_anno_pct.append(q_ground_frames / n_video_frames * 100.0)
        if grounded_frames:
            grounded_sampled_ratio.append(
                len(grounded_frames & sampled) / len(grounded_frames)
            )
        # sampled_grounded_frame_ratio.py:45-63: stride-sample frame ids,
        # percentage of annotated ids covered by the sample
        if ground_ids and n_video_frames > 0:
            if n_video_frames <= num_frames:
                sample_ids = set(range(n_video_frames))
            else:
                step = n_video_frames // num_frames
                sample_ids = {i * step for i in range(num_frames)}
            gset = set(ground_ids)
            sampled_anno_pct.append(
                len(gset & sample_ids) / len(gset) * 100.0
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
        # one entry per reference analysis script, emitting the same
        # statistic(s) that script prints (tools/analysis/dataset/<name>.py)
        "per_script": {
            "anno_box_distribution": _mms(boxes_per_question),
            "anno_box_location_distribution": dict(quadrants),
            "anno_box_ratio_distribution": _mms(grounded_frames_over_video),
            "anno_box_size_distribution": _mms(box_sizes),
            "anno_temporal_span_distribution": _mms(spans_per_question),
            "anno_temporal_span_location_distribution": dict(thirds),
            "anno_temporal_span_ratio_distribution": _mms(
                cumulative_span_ratio
            ),
            "ans_len_distribution": _mms(first_ans_lens),
            "frame_number_distribution": _mms(frame_counts),
            "ocr_number_distribution": {
                "per_frame_by_video": _mms(ocr_per_frame_by_video),
                "total_by_video": _mms(ocr_total_by_video),
            },
            "sampled_grounded_frame_ratio": {
                "sampled_annotated_pct": _mms(sampled_anno_pct),
                "total_annotated_pct": _mms(total_anno_pct),
            },
        },
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
