"""Processor behaviour tests: tokenisers, vocab, m4c_answer target construction."""

import os

import numpy as np
import pytest

from vitxtgqa_tpu.core.config import ConfigNode
from vitxtgqa_tpu.data import processors as procs
from vitxtgqa_tpu.data.text import VocabDict, word_tokenize, tokenize

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_word_tokenize():
    assert word_tokenize("What's UP?") == "what 's up"
    assert word_tokenize("Hello, world") == "hello world"


def test_tokenize_sentence():
    assert tokenize("What does the sign say?") == [
        "what", "does", "the", "sign", "say",
    ]


def test_vocab_dict():
    v = VocabDict(os.path.join(FIX, "vocab_small.txt"))
    assert v.word2idx("<pad>") == 0
    assert v.word2idx("never-seen") == v.UNK_INDEX
    assert v.idx2word(v.word2idx("stop")) == "stop"


def test_simple_word_processor():
    p = procs.SimpleWordProcessor()
    assert p({"text": "Coca-Cola,"})["text"] == "coca-cola"


def test_bert_tokenizer_processor_fallback():
    p = procs.BertTokenizerProcessor(ConfigNode({"max_length": 20}))
    out = p({"question": "what does the sign say?"})
    inds, num = out["token_inds"], out["token_num"]
    assert inds.shape == (20,) and inds.dtype == np.int64
    # CLS + 5 words + '?' + SEP
    assert num == 8
    assert inds[0] == 101 and inds[num - 1] == 102
    assert (inds[num:] == 0).all()
    # deterministic across instances
    p2 = procs.BertTokenizerProcessor(ConfigNode({"max_length": 20}))
    np.testing.assert_array_equal(
        p2({"question": "what does the sign say?"})["token_inds"], inds
    )


def test_copy_processor_pads_and_truncates():
    p = procs.CopyProcessor(ConfigNode({"max_length": 4}))
    blob = np.arange(6, dtype=np.float32).reshape(3, 2)
    out = p({"blob": blob})["blob"]
    assert out.shape == (4, 2)
    np.testing.assert_array_equal(out[:3], blob)
    assert (out[3] == 0).all()
    big = np.ones((9, 2), np.float32)
    assert p({"blob": big})["blob"].shape == (4, 2)


def test_fasttext_processor_hashed_backend():
    cfg = ConfigNode({"max_length": 5, "model_file": "/nonexistent/wiki.en.bin"})
    p = procs.FastTextProcessor(cfg)
    out = p({"tokens": ["stop", "stop", "exit"]})
    feats = out["text"]
    assert feats.shape == (5, 300)
    np.testing.assert_array_equal(feats[0], feats[1])  # deterministic
    assert np.abs(feats[0] - feats[2]).max() > 0  # distinct tokens differ
    assert (feats[3:] == 0).all()  # padding
    assert out["length"] == 3
    assert out["tokens"] == ["stop", "stop", "exit", "<pad>", "<pad>"]


def test_phoc_processor():
    p = procs.PhocProcessor(ConfigNode({"max_length": 3}))
    out = p({"tokens": ["stop", "exit"]})["text"]
    assert out.shape == (3, 604)
    from vitxtgqa_tpu.ops.phoc import phoc_numpy

    np.testing.assert_array_equal(out[0], phoc_numpy("stop"))
    assert (out[2] == 0).all()


def _answer_processor(max_copy_steps=12, max_length=8):
    cfg = ConfigNode(
        {
            "vocab_file": os.path.join(FIX, "vocab_small.txt"),
            "preprocessor": {"type": "simple_word", "params": {}},
            "max_length": max_length,
            "max_copy_steps": max_copy_steps,
            "num_answers": 10,
        }
    )
    return procs.M4CAnswerProcessor(cfg)


def test_m4c_answer_vocab_only_answer():
    p = _answer_processor()
    ans = ["stop"] * 5 + ["exit"] * 5
    out = p({"answers": ans, "context_tokens": ["foo"] * 8})
    scores = out["answers_scores"]
    assert scores.shape == (12, p.answer_vocab.num_vocab + 8)
    stop_idx = p.answer_vocab.word2idx("stop")
    exit_idx = p.answer_vocab.word2idx("exit")
    # VQA soft score with 5/10 answers matching: min(1, 5/3) -> 1.0 on step 0
    assert scores[0, stop_idx] == 1.0 and scores[0, exit_idx] == 1.0
    # teacher forcing: BOS then the sampled sequence, EOS at step len+1
    prev = out["train_prev_inds"]
    assert prev[0] == p.BOS_IDX
    assert prev[1] in (stop_idx, exit_idx)
    assert scores[1, p.EOS_IDX] == 1.0
    np.testing.assert_array_equal(
        out["train_loss_mask"], [1, 1] + [0] * 10
    )


def test_m4c_answer_ocr_copy():
    p = _answer_processor()
    # answer token not in vocab but present twice in OCR -> two copy matches
    ctx = ["zzz", "qqq", "zzz", "<pad>", "<pad>", "<pad>", "<pad>", "<pad>"]
    out = p({"answers": ["zzz"] * 10, "context_tokens": ctx})
    scores = out["answers_scores"]
    nv = p.answer_vocab.num_vocab
    assert scores[0, nv + 0] == 1.0 and scores[0, nv + 2] == 1.0
    assert scores[0, nv + 1] == 0.0
    assert out["train_prev_inds"][1] in (nv + 0, nv + 2)


def test_m4c_answer_no_match():
    p = _answer_processor()
    out = p({"answers": ["zzz"] * 10, "context_tokens": ["aaa"] * 8})
    assert out["train_loss_mask"].sum() == 0
    assert out["answers_scores"].sum() == 0
    assert out["sampled_idx_seq"] == ()


def test_m4c_answer_multiword_and_truncation():
    p = _answer_processor(max_copy_steps=3)
    ans = ["coffee shop open closed sale"] * 10
    out = p({"answers": ans, "context_tokens": ["x"] * 8})
    # sequence longer than max_copy_steps-1: mask saturates, no EOS scored
    np.testing.assert_array_equal(out["train_loss_mask"], [1, 1, 1])
    prev = out["train_prev_inds"]
    assert prev[1] == p.answer_vocab.word2idx("coffee")
    assert prev[2] == p.answer_vocab.word2idx("shop")


def test_m4c_answer_match_cap():
    p = _answer_processor()
    # 30 OCR copies of the answer word -> capped at 20 sequences
    seqs = p.match_answer_to_vocab_ocr_seq(
        "zzz", p.answer_vocab.word2idx_dict, {"zzz": list(range(30))}
    )
    assert len(seqs) == 20


def test_m4c_answer_vocab_and_ocr_sequence_enumeration():
    """Sequence matching order: vocab index first, then OCR positions in
    ascending order; multi-word answers take the cartesian product in
    front-to-back word order (reference: processors.py:1015-1054)."""
    p = _answer_processor()
    nv = p.answer_vocab.num_vocab
    ctx = {"stop": [3, 7], "sign": [1]}
    seqs = p.match_answer_to_vocab_ocr_seq(
        "stop sign", p.answer_vocab.word2idx_dict, ctx
    )
    stop_v = p.answer_vocab.word2idx("stop")
    sign_v = p.answer_vocab.word2idx("sign")
    assert seqs == [
        (stop_v, sign_v), (stop_v, nv + 1),
        (nv + 3, sign_v), (nv + 3, nv + 1),
        (nv + 7, sign_v), (nv + 7, nv + 1),
    ]
    # unmatched word anywhere kills the whole answer
    assert p.match_answer_to_vocab_ocr_seq(
        "stop zzz", p.answer_vocab.word2idx_dict, {"stop": [0], "zzz": []}
    ) == []


def test_m4c_answer_step0_max_over_answers():
    """Step-0 score for a shared first token is the max over answers
    (reference comment: processors.py:1122-1128)."""
    p = _answer_processor()
    # "coffee shop" (5/10) and "coffee" (5/10): both start with "coffee",
    # soft scores are 1.0 each here, so craft an uneven split instead
    ans = ["coffee shop"] * 8 + ["coffee"] * 2
    out = p({"answers": ans, "context_tokens": ["x"] * 8})
    cidx = p.answer_vocab.word2idx("coffee")
    # "coffee shop" scores min(1,7/3)=1.0; "coffee" scores min(1,1/3)=1/3
    # -> step-0 "coffee" entry takes the max = 1.0
    assert out["answers_scores"][0, cidx] == 1.0
