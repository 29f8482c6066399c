"""End-to-end pipeline: raw videos -> grounded QA predictions.

(BASELINE.json config #5: "raw video 10fps decode -> on-TPU ViT-B feature
extraction -> grounded QA inference"; reference pipeline: SURVEY.md §3.5.)

Stages:
  1. decode each video at the target fps and dump frames (OpenCV)
  2. batch frames through the on-device ViT feature extractor
  3. assemble a transient imdb from the questions JSON + provided OCR npys
     (OCR detection/recognition itself is an external system in the
     reference too — TransVTSpotter/ABINet, README.md:36-38)
  4. run model inference and write the prediction JSON

  python tools/e2e_pipeline.py --videos <dir> --questions questions.json \
      --ocr <dir-of-<video>.npy> --workdir /tmp/e2e --config configs/t2s_abinet.yml \
      --model t2s [--ckpt save/ckpt/best] [--fps 10]

questions.json: [{"question_id": 1, "video_id": "clip01", "question": "...",
                  "answers": ["..."]}, ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def decode_videos(video_dir: str, frames_dir: str, fps: int) -> dict:
    """Sample each video at `fps` and dump 1-indexed jpgs; returns
    {video_id: (n_frames, width, height)}."""
    import cv2

    meta = {}
    for name in sorted(os.listdir(video_dir)):
        if not name.lower().endswith((".mp4", ".avi", ".mkv", ".mov")):
            continue
        video_id = os.path.splitext(name)[0]
        out_dir = os.path.join(frames_dir, video_id)
        os.makedirs(out_dir, exist_ok=True)
        cap = cv2.VideoCapture(os.path.join(video_dir, name))
        src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
        step = src_fps / fps
        n, idx, next_pick = 0, 0, 0.0
        width = height = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx >= next_pick:
                n += 1
                cv2.imwrite(os.path.join(out_dir, f"{n}.jpg"), frame)
                height, width = frame.shape[:2]
                next_pick += step
            idx += 1
        cap.release()
        meta[video_id] = (n, width, height)
        print(f"decoded {video_id}: {n} frames @ {fps}fps")
    return meta


def extract_features(frames_dir: str, feat_dir: str, weights: str = None,
                     batch: int = 64):
    from PIL import Image

    from vitxtgqa_tpu.models.vit import VIT_L_16, make_feature_extractor

    params = None
    if weights:
        from vitxtgqa_tpu.utils.torch_convert import load_torch_vit_params

        params = load_torch_vit_params(weights, VIT_L_16)
    extract, params = make_feature_extractor(VIT_L_16, params=params)

    for video_id in sorted(os.listdir(frames_dir)):
        vdir = os.path.join(frames_dir, video_id)
        if not os.path.isdir(vdir):
            continue
        odir = os.path.join(feat_dir, video_id)
        os.makedirs(odir, exist_ok=True)
        frames = sorted(
            (f for f in os.listdir(vdir) if f.endswith(".jpg")),
            key=lambda f: int(os.path.splitext(f)[0]),
        )
        for start in range(0, len(frames), batch):
            chunk = frames[start : start + batch]
            imgs = np.stack(
                [
                    np.asarray(
                        Image.open(os.path.join(vdir, f)).convert("RGB").resize(
                            (VIT_L_16.image_size, VIT_L_16.image_size)
                        ),
                        dtype=np.uint8,
                    )
                    for f in chunk
                ]
            )
            feats = np.asarray(extract(params, imgs))
            for f, feat in zip(chunk, feats):
                np.save(
                    os.path.join(odir, f"{os.path.splitext(f)[0]}.npy"),
                    feat[None, :],
                )
        print(f"features {video_id}: {len(frames)} frames")


def assemble_data_root(workdir: str, questions_path: str, ocr_dir: str,
                       feat_dir: str, meta: dict, vocab_path: str = None):
    """Lay out the workdir as a framework data root for split 'test'."""
    with open(questions_path) as f:
        questions = json.load(f)
    imdb = [{"metadata": {"source": "e2e_pipeline"}}]
    for q in questions:
        vid = q["video_id"]
        n, w, h = meta.get(vid, (0, 0, 0))
        imdb.append(
            {
                "question_id": int(q["question_id"]),
                "video_id": vid,
                "question": q["question"],
                "answers": list(q.get("answers", ["<unk>"])) or ["<unk>"],
                "video_width": w or q.get("width", 1280),
                "video_height": h or q.get("height", 720),
            }
        )
    os.makedirs(os.path.join(workdir, "vtextgqa", "ground_annotation"), exist_ok=True)
    os.makedirs(os.path.join(workdir, "vtextgqa", "vocabulary"), exist_ok=True)
    np.save(
        os.path.join(workdir, "vtextgqa", "ground_annotation", "qa_sub_test.npy"),
        np.array(imdb, dtype=object), allow_pickle=True,
    )
    ocr_out = os.path.join(workdir, "fps10_ocr_detection", "test")
    os.makedirs(ocr_out, exist_ok=True)
    for name in os.listdir(ocr_dir):
        if name.endswith(".npy"):
            src = os.path.join(ocr_dir, name)
            dst = os.path.join(ocr_out, name)
            if not os.path.exists(dst):
                os.symlink(os.path.abspath(src), dst)
    feat_link = os.path.join(workdir, "fps10_video_vit_feat")
    if not os.path.exists(feat_link):
        os.symlink(os.path.abspath(feat_dir), feat_link)
    vdst = os.path.join(workdir, "vtextgqa", "vocabulary", "fixed_vocab_top5k.txt")
    if vocab_path and not os.path.exists(vdst):
        os.symlink(os.path.abspath(vocab_path), vdst)
    elif not os.path.exists(vdst):
        with open(vdst, "w") as f:
            f.write("\n".join(["<pad>", "<unk>", "<s>", "</s>", "yes", "no"]) + "\n")


def run_inference(workdir: str, config: str, model: str, ckpt: str = None,
                  batch_size: int = 8, extra_opts=None):
    from tools.run import run

    argv = [
        "--config", config, "--model", model, "--datasets", "vtextgqa",
        "--run_type", "test",
    ]
    if ckpt:
        argv += ["--resume_file", ckpt]
    argv += [
        f"dataset_attributes.vtextgqa.data_root_dir={workdir}",
        f"training_parameters.batch_size={batch_size}",
        f"training_parameters.save_dir={workdir}/save",
        "training_parameters.evalai_inference=True",
    ]
    argv += list(extra_opts or [])
    trainer = run(argv)
    return trainer.predict_for_evalai("test")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", required=True)
    ap.add_argument("--questions", required=True)
    ap.add_argument("--ocr", required=True, help="dir of <video>.npy OCR detections")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--config", default="configs/t2s_abinet.yml")
    ap.add_argument("--model", default="t2s")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--vit_weights", default=None)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--fps", type=int, default=10)
    args = ap.parse_args()

    frames_dir = os.path.join(args.workdir, "frames")
    feat_dir = os.path.join(args.workdir, "vit_feats")
    meta = decode_videos(args.videos, frames_dir, args.fps)
    extract_features(frames_dir, feat_dir, weights=args.vit_weights)
    assemble_data_root(args.workdir, args.questions, args.ocr, feat_dir, meta,
                       vocab_path=args.vocab)
    report = run_inference(args.workdir, args.config, args.model, args.ckpt)
    print(f"predictions: {report}")


if __name__ == "__main__":
    main()
