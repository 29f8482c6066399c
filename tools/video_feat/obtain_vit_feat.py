"""Per-frame ViT features on the accelerator.

Replaces the reference's offline HF pipeline (tools/video_feat/
obtain_vit_feat.py:13-53: ViT-L/16-224-in21k CLS -> <video>/<n>.npy [1,D])
with a batched jitted forward: frames stream through the device in chunks
instead of one torch forward per frame.

  python tools/video_feat/obtain_vit_feat.py --frames <dir> --out <dir> \
      [--weights vit.ckpt.pt] [--batch 64] [--feat_dim 1024]

Without --weights a randomly initialised ViT is used (useful for pipeline
smoke tests only); pass a torch ViTModel checkpoint to reproduce the
reference features (converted via vitxtgqa_tpu/utils/torch_convert.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np


def iter_videos(frames_root: str):
    for video_id in sorted(os.listdir(frames_root)):
        vdir = os.path.join(frames_root, video_id)
        if not os.path.isdir(vdir):
            continue
        frames = sorted(
            (f for f in os.listdir(vdir) if f.endswith(".jpg")),
            key=lambda f: int(os.path.splitext(f)[0]),
        )
        yield video_id, vdir, frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", required=True, help="dir of <video>/<n>.jpg")
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", default=None, help="torch ViT checkpoint")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from PIL import Image

    from vitxtgqa_tpu.models.vit import VIT_L_16, make_feature_extractor

    params = None
    if args.weights:
        from vitxtgqa_tpu.utils.torch_convert import load_torch_vit_params

        params = load_torch_vit_params(args.weights, VIT_L_16)

    extract, params = make_feature_extractor(VIT_L_16, params=params)

    for video_id, vdir, frames in iter_videos(args.frames):
        odir = os.path.join(args.out, video_id)
        os.makedirs(odir, exist_ok=True)
        for start in range(0, len(frames), args.batch):
            chunk = frames[start : start + args.batch]
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
            feats = np.asarray(extract(params, imgs))  # [b, D]
            for f, feat in zip(chunk, feats):
                n = os.path.splitext(f)[0]
                np.save(os.path.join(odir, f"{n}.npy"), feat[None, :])
        print(f"{video_id}: {len(frames)} frames")


if __name__ == "__main__":
    main()
