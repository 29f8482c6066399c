"""Token-exact OCR word-vector paths without external assets.

The reference loads the 8GB fastText wiki.en.bin through the native
fasttext package (reference: pythia/datasets/processors.py:463-491); this
image ships neither the wheel nor the model.  These tests exercise the two
real-asset code paths anyway:

  * CachedVectors: an .npz {tokens, vectors} cache (the format
    tools/extract_word_vectors.py produces offline) must yield token-EXACT
    features through FastTextProcessor, including the reference's
    mean-over-space-split-words rule (vocab.py:379-381);
  * FastTextVectors: a fake `fasttext` module stands in for the wheel, so
    the .bin loader path (load_model, get_dimension, get_word_vector
    per space-split word) runs end to end.

The hashed fallback remains the dependency-free default and is covered in
test_processors.py.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

from vitxtgqa_tpu.core.config import ConfigNode
from vitxtgqa_tpu.data import word_vectors as WV
from vitxtgqa_tpu.data.processors import FastTextProcessor


@pytest.fixture()
def npz_cache(tmp_path):
    rng = np.random.default_rng(3)
    tokens = ["stop", "sign", "7", "coffee", "eleven"]
    vectors = rng.standard_normal((len(tokens), 300)).astype(np.float32)
    path = tmp_path / "wiki_cache.npz"
    np.savez(path, tokens=np.array(tokens), vectors=vectors)
    return str(path), dict(zip(tokens, vectors))


def test_cached_vectors_token_exact(npz_cache):
    path, table = npz_cache
    vv = WV.load_word_vectors(path)
    assert isinstance(vv, WV.CachedVectors)
    for tok, vec in table.items():
        np.testing.assert_array_equal(vv.get_word_vector(tok), vec)
    # phrase = mean over space-split words (reference: vocab.py:379-381)
    np.testing.assert_allclose(
        vv["stop sign"], (table["stop"] + table["sign"]) / 2.0, rtol=1e-6
    )
    # OOV falls back to the deterministic hashed embedding, never zeros
    oov = vv.get_word_vector("zzzunseen")
    assert oov.shape == (300,) and np.abs(oov).sum() > 0


def test_fasttext_processor_consumes_npz_cache(npz_cache):
    path, table = npz_cache
    proc = FastTextProcessor(ConfigNode({"max_length": 4, "model_file": path}))
    out = proc({"tokens": ["stop sign", "7", "zz-oov"]})["text"]
    assert out.shape == (4, 300)
    np.testing.assert_allclose(
        out[0], (table["stop"] + table["sign"]) / 2.0, rtol=1e-6
    )
    np.testing.assert_array_equal(out[1], table["7"])
    assert np.abs(out[2]).sum() > 0  # hashed fallback
    np.testing.assert_array_equal(out[3], np.zeros(300))  # padding


@pytest.fixture()
def fake_fasttext(tmp_path, monkeypatch):
    """Install a deterministic stand-in for the fasttext package and a
    placeholder .bin file; removed on teardown."""
    bin_path = tmp_path / "wiki.en.bin"
    bin_path.write_bytes(b"\x00fakebin")

    class _Model:
        def get_dimension(self):
            return 300

        def get_word_vector(self, word):
            digest = abs(hash(("ft", word))) % (2**32)
            rng = np.random.default_rng(digest)
            return rng.standard_normal(300).astype(np.float32)

    mod = types.ModuleType("fasttext")
    mod.load_model = lambda path: _Model()
    monkeypatch.setitem(sys.modules, "fasttext", mod)
    return str(bin_path), _Model()


def test_fasttext_bin_path_via_fake_package(fake_fasttext):
    bin_path, model = fake_fasttext
    vv = WV.load_word_vectors(bin_path)
    assert isinstance(vv, WV.FastTextVectors)
    np.testing.assert_array_equal(
        vv.get_word_vector("stop"), model.get_word_vector("stop")
    )
    proc = FastTextProcessor(
        ConfigNode({"max_length": 2, "model_file": bin_path})
    )
    out = proc({"tokens": ["stop sign"]})["text"]
    want = (
        model.get_word_vector("stop") + model.get_word_vector("sign")
    ) / 2.0
    np.testing.assert_allclose(out[0], want, rtol=1e-6)


def test_real_fasttext_bin_when_available():
    """Full-asset path: only runs when the real wheel + model exist
    (kept as the optional extra; the fixture tests above cover the code)."""
    try:
        import fasttext  # noqa: F401
    except ImportError:
        pytest.skip("fasttext wheel not in this image (fixture tests cover the path)")
    model_file = os.environ.get("FASTTEXT_BIN", "/data/wiki.en.bin")
    if not os.path.exists(model_file):
        pytest.skip("no real wiki.en.bin available")
    vv = WV.load_word_vectors(model_file)
    assert isinstance(vv, WV.FastTextVectors)
    assert vv.get_word_vector("stop").shape == (vv.dim,)
