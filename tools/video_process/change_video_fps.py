"""Re-encode videos to a target fps (reference: tools/video_process/
change_video_fps.py:12-37, which used moviepy; this uses OpenCV).

  python tools/video_process/change_video_fps.py --src <dir> --dst <dir> [--fps 10]
"""

from __future__ import annotations

import argparse
import os


def change_fps(src_path: str, dst_path: str, fps: int = 10) -> int:
    import cv2

    cap = cv2.VideoCapture(src_path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(dst_path, fourcc, fps, (width, height))

    # sample source frames at the target cadence
    step = src_fps / fps
    written = 0
    next_pick = 0.0
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx >= next_pick:
            out.write(frame)
            written += 1
            next_pick += step
        idx += 1
    cap.release()
    out.release()
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="dir of source videos")
    ap.add_argument("--dst", required=True, help="output dir")
    ap.add_argument("--fps", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    for name in sorted(os.listdir(args.src)):
        if not name.lower().endswith((".mp4", ".avi", ".mkv", ".mov")):
            continue
        n = change_fps(
            os.path.join(args.src, name), os.path.join(args.dst, name), args.fps
        )
        print(f"{name}: {n} frames @ {args.fps}fps")


if __name__ == "__main__":
    main()
