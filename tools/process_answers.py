"""Offline answer-vocabulary builder for VQA-format annotations.

Rebuild of the reference CLI `pythia/utils/process_answers.py`: reads one
or two VQA annotation JSONs (``{"annotations": [{"multiple_choice_answer",
"question_id"}, ...]}``), normalises each ground-truth answer with the
EvalAI preprocessing (punctuation strip -> digit/article/contraction map,
process_answers.py:186-216 — the same published constants
`metrics/evaluators.py` uses for scoring), keeps answers whose normalised
form occurs for >= ``--min_freq`` distinct questions
(process_answers.py:225-243), sorts, prepends ``<unk>``, and writes
``answers_vqa.txt`` (process_answers.py:246-302).

Usage:
    python tools/process_answers.py --annotation_file train.json \
        [--val_annotation_file val.json] [--out_dir DIR] [--min_freq N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vitxtgqa_tpu.metrics.evaluators import EvalAIAnswerProcessor


def preprocess_answer(answer: str) -> str:
    """reference process_answers.py:211-214: punctuation -> digit/article
    (NO word_tokenize step, unlike the scoring-time processor) -> strip
    residual commas."""
    p = EvalAIAnswerProcessor()
    answer = p.process_digit_article(p.process_punctuation(answer))
    return answer.replace(",", "")


def filter_answers(answers_dset, min_occurence: int):
    """Answers whose normalised form is the GT of >= min_occurence
    distinct questions (reference process_answers.py:222-243)."""
    occurence = {}
    for ans_entry in answers_dset:
        gtruth = preprocess_answer(ans_entry["multiple_choice_answer"])
        occurence.setdefault(gtruth, set()).add(ans_entry["question_id"])
    answer_list = [a for a, qs in occurence.items() if len(qs) >= min_occurence]
    print(
        "Num of answers that appear >= %d times: %d"
        % (min_occurence, len(answer_list))
    )
    return answer_list


def build_answer_list(train_annotations, val_annotations=None, min_freq=0):
    answers = list(train_annotations)
    if val_annotations is not None:
        answers = answers + list(val_annotations)
    answer_list = filter_answers(answers, min_freq)
    answer_list = [t.strip() for t in answer_list if len(t.strip()) > 0]
    answer_list.sort()
    if "<unk>" not in answer_list:
        answer_list = ["<unk>"] + answer_list
    return answer_list


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--annotation_file", type=str, required=True)
    parser.add_argument("--val_annotation_file", type=str, required=False)
    parser.add_argument("--out_dir", type=str, default="./")
    parser.add_argument("--min_freq", type=int, default=0)
    args = parser.parse_args(argv)

    with open(args.annotation_file) as f:
        train_answers = json.load(f)["annotations"]
    val_answers = None
    if args.val_annotation_file:
        with open(args.val_annotation_file) as f:
            val_answers = json.load(f)["annotations"]

    answer_list = build_answer_list(train_answers, val_answers, args.min_freq)

    os.makedirs(args.out_dir, exist_ok=True)
    answer_file = os.path.join(args.out_dir, "answers_vqa.txt")
    with open(answer_file, "w") as f:
        f.writelines([w + "\n" for w in answer_list])
    print(f"wrote {len(answer_list)} answers -> {answer_file}")


if __name__ == "__main__":
    main()
