"""Generate a synthetic ViTXT-GQA-shaped dataset tree for tests and benches.

Produces the same on-disk layout the real dataset uses
(reference: README.md:36-60, configs/t2s_abinet.yml:6-31):

  <root>/vtextgqa/qa_annotation/ViteVQA_0.0.2_t1s2train.npy
  <root>/vtextgqa/ground_annotation/{qa_sub_val.npy, qa_sub_test.npy,
                                     grouding_anno_val.npy, grouding_anno_test.npy}
  <root>/vtextgqa/vocabulary/fixed_vocab_top5k.txt
  <root>/fps10_ocr_detection/{train,val,test}/<video>.npy
  <root>/fps10_video_vit_feat/<video>/<frame>.npy

Content is random but self-consistent: answers are drawn from OCR tokens /
the fixed vocab so QA targets and grounding spans are non-trivial.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

WORDS = [
    "stop", "exit", "sign", "open", "closed", "sale", "coffee", "shop",
    "street", "north", "south", "east", "west", "park", "hotel", "pizza",
    "one", "two", "three", "left", "right", "yes", "no", "red", "blue",
    "green", "menu", "bus", "taxi", "bank",
]
VOCAB_EXTRA = ["<pad>", "<unk>", "<s>", "</s>", "what", "name", "of", "on", "the", "a"]
QUESTIONS = [
    "what does the sign say?",
    "what is the name of the shop?",
    "what word is on the bus?",
    "what number is on the door?",
    "what is written on the banner?",
]


def make_video(rng, root, split, video_id, n_frames, width, height, feat_dim):
    ocr_info = {}
    for f in range(1, n_frames + 1):
        dets = []
        for d in range(rng.integers(1, 6)):
            x1 = float(rng.uniform(0, width - 60))
            y1 = float(rng.uniform(0, height - 30))
            w, h = float(rng.uniform(30, 60)), float(rng.uniform(10, 30))
            x2, y2 = x1 + w, y1 + h
            # 8-pt polygon: tl, tr, br, bl
            points = [x1, y1, x2, y1, x2, y2, x1, y2]
            dets.append(
                {
                    "points": points,
                    "ocr": str(rng.choice(WORDS)),
                    "ID": int(rng.integers(1, 12)),
                }
            )
        ocr_info[str(f)] = dets
    os.makedirs(os.path.join(root, "fps10_ocr_detection", split), exist_ok=True)
    np.save(
        os.path.join(root, "fps10_ocr_detection", split, video_id + ".npy"),
        np.array(ocr_info, dtype=object),
        allow_pickle=True,
    )

    feat_dir = os.path.join(root, "fps10_video_vit_feat", video_id)
    os.makedirs(feat_dir, exist_ok=True)
    for f in range(1, n_frames + 1):
        feat = rng.standard_normal((1, feat_dim)).astype(np.float32)
        np.save(os.path.join(feat_dir, f"{f}.npy"), feat)
    return ocr_info


def make_split(rng, root, split, n_videos, n_questions, feat_dim, qid_base):
    imdb = [{"metadata": {"version": "fixture-1", "split": split}}]
    ground = [{"metadata": {"version": "fixture-1", "split": split}}]
    for v in range(n_videos):
        video_id = f"{split}_video_{v:03d}"
        n_frames = int(rng.integers(6, 20))
        width = int(rng.choice([640, 1280]))
        height = int(rng.choice([360, 720]))
        ocr_info = make_video(
            rng, root, split, video_id, n_frames, width, height, feat_dim
        )
        for q in range(n_questions):
            qid = qid_base + v * n_questions + q
            # answer = an OCR token from some frame (groundable)
            frame = int(rng.integers(1, n_frames + 1))
            det = ocr_info[str(frame)][int(rng.integers(len(ocr_info[str(frame)])))]
            answer = det["ocr"]
            imdb.append(
                {
                    "question_id": qid,
                    "video_id": video_id,
                    "question": str(rng.choice(QUESTIONS)),
                    "answers": [answer, answer],
                    "video_width": width,
                    "video_height": height,
                }
            )
            x1, y1, x2, y2 = (
                min(det["points"][0], det["points"][6]),
                min(det["points"][1], det["points"][3]),
                max(det["points"][2], det["points"][4]),
                max(det["points"][5], det["points"][7]),
            )
            t0 = max(0.0, (frame - 1) / 10.0 - 0.05)
            t1 = min(n_frames / 10.0, frame / 10.0 + 0.05)
            ground.append(
                {
                    "question_id": qid,
                    "video_id": video_id,
                    "fps": 10,
                    "width": width,
                    "height": height,
                    "spatial_temporal_gt": [
                        {
                            "temporal_gt": [t0, t1],
                            "bbox_gt": {str(frame - 1): [x1, y1, x2, y2]},
                        }
                    ],
                }
            )
    return imdb, ground


def main(root: str, seed: int = 0, feat_dim: int = 1024, n_videos: int = 4,
         n_questions: int = 3):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "vtextgqa", "qa_annotation"), exist_ok=True)
    os.makedirs(os.path.join(root, "vtextgqa", "ground_annotation"), exist_ok=True)
    os.makedirs(os.path.join(root, "vtextgqa", "vocabulary"), exist_ok=True)

    with open(
        os.path.join(root, "vtextgqa", "vocabulary", "fixed_vocab_top5k.txt"), "w"
    ) as f:
        f.write("\n".join(VOCAB_EXTRA + WORDS) + "\n")

    imdb_train, _ = make_split(
        rng, root, "train", n_videos, n_questions, feat_dim, qid_base=1000
    )
    np.save(
        os.path.join(root, "vtextgqa", "qa_annotation", "ViteVQA_0.0.2_t1s2train.npy"),
        np.array(imdb_train, dtype=object),
        allow_pickle=True,
    )
    for split, qb in (("val", 2000), ("test", 3000)):
        imdb, ground = make_split(
            rng, root, split, max(2, n_videos // 2), n_questions, feat_dim, qid_base=qb
        )
        np.save(
            os.path.join(root, "vtextgqa", "ground_annotation", f"qa_sub_{split}.npy"),
            np.array(imdb, dtype=object),
            allow_pickle=True,
        )
        np.save(
            os.path.join(
                root, "vtextgqa", "ground_annotation", f"grouding_anno_{split}.npy"
            ),
            np.array(ground, dtype=object),
            allow_pickle=True,
        )
    print(f"fixtures written to {root}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="tests/fixtures/data")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--feat_dim", type=int, default=1024)
    ap.add_argument("--n_videos", type=int, default=4)
    ap.add_argument("--n_questions", type=int, default=3)
    a = ap.parse_args()
    main(a.root, a.seed, a.feat_dim, a.n_videos, a.n_questions)
