"""Pre-extract word vectors for a token set into an .npz cache.

The reference loads the 8GB fastText wiki.en.bin inside every DataLoader
worker (reference: pythia/datasets/processors.py:463-476).  This tool runs
the heavy model once offline and emits a small {tokens, vectors} .npz that
vitxtgqa_tpu.data.word_vectors.CachedVectors memory-maps at train time —
point the config's context_processor model_file at the .npz.

  python tools/extract_word_vectors.py --model wiki.en.bin \
      --ocr_dirs fps10_ocr_detection/train fps10_ocr_detection/val \
      --vocab vtextgqa/vocabulary/fixed_vocab_top5k.txt \
      --out vectors_cache.npz
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from vitxtgqa_tpu.data.text import word_tokenize
from vitxtgqa_tpu.data.word_vectors import load_word_vectors


def collect_tokens(ocr_dirs, vocab_path):
    tokens = set(["<pad>", "<unk>"])
    for d in ocr_dirs or []:
        for path in glob.glob(os.path.join(d, "*.npy")):
            info = np.load(path, allow_pickle=True).item()
            for dets in info.values():
                for det in dets:
                    tokens.add(word_tokenize(str(det["ocr"])))
    if vocab_path and os.path.exists(vocab_path):
        with open(vocab_path) as f:
            tokens.update(line.strip() for line in f)
    return sorted(tokens)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="fastText .bin (hashed fallback if absent)")
    ap.add_argument("--ocr_dirs", nargs="*", default=[])
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    vectors_src = load_word_vectors(args.model)
    tokens = collect_tokens(args.ocr_dirs, args.vocab)
    mat = np.stack([vectors_src[t] for t in tokens]).astype(np.float32)
    np.savez_compressed(args.out, tokens=np.array(tokens), vectors=mat)
    print(f"cached {len(tokens)} tokens x {mat.shape[1]} dims -> {args.out}")


if __name__ == "__main__":
    main()
