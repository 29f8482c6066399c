"""Draw GT grounding boxes on frames for qualitative inspection.

(reference: tools/analysis/dataset/box_visualization.py — hard-coded
personal paths and a latent bug: it overwrites (x2, y2) with undefined
``x1+w, y1+h`` locals.  Here paths are CLI flags, boxes are drawn with the
annotation's own xyxy coordinates, and missing frames fall back to the
video's last frame like the reference.)

Usage:
  python tools/analysis/box_visualization.py \
      --frames <fps10_frames dir> --annotation <grounding anno .json|.npy> \
      --out <dir> [--limit 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def load_annotation(path: str):
    if path.endswith(".json"):
        with open(path) as f:
            anno = json.load(f)
        return anno["data"] if isinstance(anno, dict) and "data" in anno else anno
    data = np.load(path, allow_pickle=True)
    if isinstance(data, np.ndarray):
        data = data.tolist()
    if isinstance(data, dict) and "data" in data:
        data = data["data"]
    return data


def draw_boxes(frames_dir: str, anno: list, out_dir: str, limit: int = 0):
    drawn = 0
    for entry in anno:
        q_id = entry["question_id"]
        v_id = entry["video_id"]
        for span in entry.get("spatial_temporal_gt", []):
            for f, box in span.get("bbox_gt", {}).items():
                frame_id = int(f) + 1  # annotation frame index -> 1-based file
                image_path = os.path.join(frames_dir, v_id, f"{frame_id}.jpg")
                if not os.path.exists(image_path):
                    vdir = os.path.join(frames_dir, v_id)
                    if not os.path.isdir(vdir):
                        continue
                    # reference fallback: use the last frame of the video
                    frame_id = len(os.listdir(vdir)) - 1
                    image_path = os.path.join(vdir, f"{frame_id}.jpg")
                    if not os.path.exists(image_path):
                        continue
                img = cv2.imread(image_path)
                if img is None:
                    continue
                x1, y1, x2, y2 = (int(v) for v in box)
                cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), 3)
                save_dir = os.path.join(out_dir, str(q_id), v_id)
                os.makedirs(save_dir, exist_ok=True)
                cv2.imwrite(os.path.join(save_dir, f"{frame_id}.jpg"), img)
                drawn += 1
                if limit and drawn >= limit:
                    return drawn
    return drawn


def main(argv=None):
    if cv2 is None:
        print("opencv not available", file=sys.stderr)
        return 1
    p = argparse.ArgumentParser()
    p.add_argument("--frames", required=True)
    p.add_argument("--annotation", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)
    anno = load_annotation(args.annotation)
    n = draw_boxes(args.frames, anno, args.out, args.limit)
    print(f"drew {n} annotated frames into {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
