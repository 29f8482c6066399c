"""PHOC parity: numpy oracle vs native C++ vs jax batch, plus layout checks."""

import numpy as np
import pytest

from vitxtgqa_tpu.ops import phoc as P

TOKENS = [
    "the", "hello", "stop", "a", "", "7-eleven", "McDonald's", "42",
    "EXIT", "école", "x", "supercalifragilistic", "no2", "<pad>",
    "ll", "coca-cola", "2019", "entrance",
]


def test_dim_and_dtype():
    v = P.phoc_numpy("hello")
    assert v.shape == (604,) and v.dtype == np.float32
    assert set(np.unique(v)) <= {0.0, 1.0}


def test_empty_and_filtered_tokens_are_zero():
    assert P.phoc_numpy("").sum() == 0
    assert P.phoc_numpy("<>?!").sum() == 0  # nothing in [a-z0-9]


def test_known_unigram_positions():
    # single char 'a' spans (0,1); occupies every region with >=50% coverage:
    # level 2: none (each region covers 0.5, 0.5/1 >= 0.5 -> both!)
    v = P.phoc_numpy("a")
    # level-2 regions both cover exactly half the span -> >= 0.5 holds
    assert v[0 * 36 + 0] == 1 and v[1 * 36 + 0] == 1
    # level-3 middle region covers 1/3 < 0.5 -> zero
    assert v[(2 + 1) * 36 + 0] == 0


def test_bigram_section():
    v = P.phoc_numpy("th")
    off = 504
    ti = P.BIGRAMS.index("th")
    # bigram span is (0, 1): both level-2 regions cover half of it
    assert v[off + 0 * 50 + ti] == 1 and v[off + 1 * 50 + ti] == 1
    # unknown bigram contributes nothing
    assert P.phoc_numpy("qq")[off:].sum() == 0


def test_native_matches_numpy():
    native = P._native()
    if native is None:
        pytest.skip("native extension unavailable")
    for t in TOKENS:
        got = np.array(native.build_phoc(t), dtype=np.float32)
        np.testing.assert_array_equal(got, P.phoc_numpy(t), err_msg=t)


def test_native_batch_matches_numpy():
    native = P._native()
    if native is None:
        pytest.skip("native extension unavailable")
    got = P.build_phoc_batch(TOKENS)
    want = P.phoc_batch_numpy(TOKENS)
    np.testing.assert_array_equal(got, want)


def test_jax_batch_matches_numpy():
    ids, lengths = P.encode_tokens_for_jax(TOKENS, max_len=24)
    got = np.asarray(P.phoc_jax(ids, lengths))
    want = P.phoc_batch_numpy(TOKENS)
    np.testing.assert_array_equal(got, want)


def test_jax_jit_and_long_token_truncation():
    import jax

    ids, lengths = P.encode_tokens_for_jax(["abcdef"], max_len=4)
    got = np.asarray(jax.jit(P.phoc_jax)(ids, lengths))
    want = P.phoc_batch_numpy(["abcd"])
    np.testing.assert_array_equal(got, want)


def test_reference_so_parity_if_available():
    """Bit-exactness vs the reference's own compiled extension."""
    import importlib.util
    import glob

    so = glob.glob("/root/reference/pythia/utils/phoc/cphoc.so")
    if not so:
        pytest.skip("reference cphoc.so not present")
    spec = importlib.util.spec_from_file_location("ref_cphoc", so[0])
    try:
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
    except ImportError:
        pytest.skip("reference cphoc.so incompatible with this interpreter")
    for t in TOKENS:
        norm = P.normalize_token(t)
        want = np.array(ref.build_phoc(norm), dtype=np.float32)
        np.testing.assert_array_equal(P.phoc_numpy(t), want, err_msg=t)
