"""WordPiece parity against HuggingFace's implementation on a local vocab.

HF model assets are unavailable offline, but BertTokenizer(vocab_file=...)
constructs from any local vocab.txt — so the tokenization *algorithm*
(BasicTokenizer + greedy longest-match WordPiece) is directly comparable.
"""

import os

import pytest

from vitxtgqa_tpu.data.wordpiece import WordPieceTokenizer

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "what", "does", "the", "sign", "say", "stop", "##ping", "##s",
    "coffee", "shop", "##p", "un", "##believ", "##able", "7", "-", "eleven",
    "##leven", "a", "b", "c", "'", "##'", "s", "é", "e",
]

SENTENCES = [
    "what does the sign say?",
    "stopping stops stop",
    "unbelievable coffee shops",
    "7-eleven",
    "What's THE Sign?",
    "café stop",  # accent stripping
    "   weird   spacing\tand\nnewlines ",
    "!!!",
    "",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("wp") / "vocab.txt"
    path.write_text("\n".join(VOCAB) + "\n")
    return str(path)


def test_wordpiece_matches_hf(vocab_file):
    try:
        from transformers import BertTokenizer
    except ImportError:
        pytest.skip(
            "transformers unavailable (recorded-golden test below still "
            "asserts byte compatibility)"
        )
    hf = BertTokenizer(
        vocab_file=vocab_file, do_lower_case=True, do_basic_tokenize=True
    )
    ours = WordPieceTokenizer(vocab_file)
    for sentence in SENTENCES:
        want = hf.encode(sentence, add_special_tokens=True)
        got = ours.encode(sentence, add_special_tokens=True)
        assert got == want, (sentence, got, want)


def test_wordpiece_matches_recorded_hf_goldens():
    """Asserts unconditionally against token ids recorded from HF
    BertTokenizer (transformers 4.57.6) on the checked-in tiny vocab —
    the byte-compat claim of data/wordpiece.py holds even in images
    without the transformers package (fixture:
    tests/fixtures/bert_tokenizer_goldens.json)."""
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "fixtures", "bert_tokenizer_goldens.json")) as f:
        goldens = json.load(f)
    vocab = os.path.join(here, "fixtures", goldens["vocab_file"])
    ours = WordPieceTokenizer(vocab)
    for entry in goldens["encodings"]:
        got = ours.encode(entry["text"], add_special_tokens=True)
        assert got == entry["ids"], (entry["text"], got, entry["ids"])
