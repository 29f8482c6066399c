"""Dump videos to per-frame jpgs, 1-indexed (reference: tools/video_process/
video2frames.py:9-49 — frames land at <dst>/<video>/<n>.jpg).

  python tools/video_process/video2frames.py --src <dir> --dst <dir>
"""

from __future__ import annotations

import argparse
import os


def video_to_frames(src_path: str, dst_dir: str) -> int:
    import cv2

    os.makedirs(dst_dir, exist_ok=True)
    cap = cv2.VideoCapture(src_path)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        n += 1
        cv2.imwrite(os.path.join(dst_dir, f"{n}.jpg"), frame)
    cap.release()
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    args = ap.parse_args()
    for name in sorted(os.listdir(args.src)):
        if not name.lower().endswith((".mp4", ".avi", ".mkv", ".mov")):
            continue
        video_id = os.path.splitext(name)[0]
        n = video_to_frames(
            os.path.join(args.src, name), os.path.join(args.dst, video_id)
        )
        print(f"{video_id}: {n} frames")


if __name__ == "__main__":
    main()
