"""Build a fixed answer vocabulary from annotation files.

(reference: pythia/scripts/extract_vocabulary.py — tokenize answers, count,
threshold by frequency, prepend the special tokens the answer processor
asserts on: <pad> first, then <s>, </s>, <unk>.)

  python tools/extract_vocabulary.py --input_files imdb1.npy [imdb2.npy ...] \
      --out_dir vocab_out [--min_freq 1] [--top_k 5000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from vitxtgqa_tpu.data.text import tokenize

SPECIALS = ["<pad>", "<s>", "</s>", "<unk>"]


def iter_answers(path: str):
    if path.endswith(".npy"):
        rows = np.load(path, allow_pickle=True)
        for row in rows:
            if isinstance(row, dict) and "answers" in row:
                yield from (str(a) for a in row["answers"])
    elif path.endswith(".json"):
        with open(path) as f:
            blob = json.load(f)
        data = blob.get("data", blob) if isinstance(blob, dict) else blob
        for row in data:
            yield from (str(a) for a in row.get("answers", []))
    else:
        raise ValueError(f"unsupported annotation format: {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_files", nargs="+", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--min_freq", type=int, default=1)
    ap.add_argument("--top_k", type=int, default=0, help="0 = no cap")
    ap.add_argument("--vocab_file_name", default="fixed_vocab.txt")
    args = ap.parse_args()

    counts = Counter()
    for path in args.input_files:
        for answer in iter_answers(path):
            counts.update(tokenize(answer))

    words = [w for w, c in counts.most_common() if c >= args.min_freq]
    if args.top_k:
        words = words[: args.top_k]
    words = [w for w in words if w not in SPECIALS]

    os.makedirs(args.out_dir, exist_ok=True)
    out_path = os.path.join(args.out_dir, args.vocab_file_name)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(SPECIALS + words) + "\n")
    print(f"wrote {len(SPECIALS) + len(words)} entries to {out_path}")


if __name__ == "__main__":
    main()
