"""CLIP BPE tokenizer parity vs the reference's SimpleTokenizer
(reference: pythia/modules/mist_module/clip/simple_tokenizer.py) on the
standard merge table the reference ships.

The reference module imports ftfy (absent in this image); since
ftfy.fix_text is identity on well-formed text, a pass-through stub is
injected for the comparison.  Skipped when the reference tree isn't mounted.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_TOK = "/root/reference/pythia/modules/mist_module/clip/simple_tokenizer.py"
REF_BPE = "/root/reference/pythia/modules/mist_module/clip/bpe_simple_vocab_16e6.txt.gz"

SAMPLES = [
    "a photo of a cat",
    "What does the sign say?",
    "STOP, Main St. 42nd & 7th!",
    "it's 9:41am -- don't be late...",
    "words-with-hyphens and under_scores plus numb3rs 12345",
    "<|startoftext|> weird input <|endoftext|>",
    "CAFE   multiple   spaces",
    "",
]


@pytest.fixture(scope="module")
def ref_tok():
    if not (os.path.exists(REF_TOK) and os.path.exists(REF_BPE)):
        pytest.skip("reference tree not mounted")
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location("ref_simple_tokenizer", REF_TOK)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer(REF_BPE)


@pytest.fixture(scope="module")
def our_tok():
    if not os.path.exists(REF_BPE):
        pytest.skip("bpe merge table not available")
    from vitxtgqa_tpu.data.clip_tokenizer import ClipBPETokenizer

    return ClipBPETokenizer(REF_BPE)


def test_encode_parity(ref_tok, our_tok):
    for text in SAMPLES:
        assert our_tok.encode(text) == ref_tok.encode(text), text


def test_decode_roundtrip(ref_tok, our_tok):
    for text in SAMPLES:
        ids = our_tok.encode(text)
        assert our_tok.decode(ids) == ref_tok.decode(ids), text


def test_specials_and_vocab_size(our_tok):
    assert len(our_tok.encoder) == 49408
    assert our_tok.sot_token == 49406
    assert our_tok.eot_token == 49407


def test_tokenize_framing(our_tok):
    from vitxtgqa_tpu.data.clip_tokenizer import tokenize

    arr = tokenize(our_tok, ["hello world", "bye"], context_length=8)
    assert arr.shape == (2, 8)
    assert (arr[:, 0] == our_tok.sot_token).all()
    # EOT at the end of each sequence, zero-padded after
    row = arr[1]
    eot_pos = int(np.argmax(row == our_tok.eot_token))
    assert (row[eot_pos + 1 :] == 0).all()

    with pytest.raises(RuntimeError):
        tokenize(our_tok, ["one two three four five six seven"], context_length=4)
    trunc = tokenize(
        our_tok, ["one two three four five six seven"], context_length=4,
        truncate=True,
    )
    assert trunc[0, -1] == our_tok.eot_token
