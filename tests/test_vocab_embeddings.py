"""Vocab-embedding family tests."""

import os

import numpy as np
import pytest

from vitxtgqa_tpu.data.vocab_embeddings import Vocab

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "vocab_small.txt")


def test_random_vocab():
    v = Vocab(type="random", vocab_file=FIX, embedding_dim=16)
    assert v.get_embedding_dim() == 16
    assert v.get_pad_index() == 0
    assert (v.get_vectors()[0] == 0).all()  # pad row zeroed
    assert v.get_size() == len(v.itos)
    assert v.stoi["stop"] == v.vocab.word2idx("stop")


def test_intersected_vocab_hashed_backend():
    v = Vocab(type="intersected", vocab_file=FIX, embedding_dim=32)
    vecs = v.get_vectors()
    assert vecs.shape[1] == 32
    idx = v.stoi["stop"]
    assert np.abs(vecs[idx]).sum() > 0
    # deterministic across constructions
    v2 = Vocab(type="intersected", vocab_file=FIX, embedding_dim=32)
    np.testing.assert_array_equal(vecs, v2.get_vectors())


def test_model_vocab():
    v = Vocab(type="model", embedding_dim=24)
    a = v["coffee shop"]
    assert a.shape == (24,)
    # mean-over-words semantics
    np.testing.assert_allclose(a, (v["coffee"] + v["shop"]) / 2, atol=1e-6)


def test_extracted_vocab(tmp_path):
    emb = np.random.default_rng(0).standard_normal((36 + 0, 8)).astype(np.float32)
    # file has 36 entries incl specials (vocab_small has <pad>/<unk>/<s>/</s>)
    path = tmp_path / "emb.npy"
    np.save(path, emb)
    v = Vocab(type="extracted", vocab_file=FIX, embedding_file=str(path))
    assert v.get_vectors().shape == (36, 8)


def test_unknown_type():
    with pytest.raises(ValueError):
        Vocab(type="nope")
