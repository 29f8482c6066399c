"""Native threaded npy reader (_featio) parity vs np.load."""

import os

import numpy as np
import pytest

from vitxtgqa_tpu.native import featio


@pytest.fixture(scope="module")
def built():
    if not featio.available():
        pytest.skip("g++/native build unavailable")
    return True


def test_padded_batch_matches_numpy(built, tmp_path):
    rng = np.random.RandomState(0)
    specs = [
        ("a", rng.randn(5, 16).astype(np.float32)),
        ("b", rng.randn(12, 16).astype(np.float32)),   # truncated to max_rows
        ("c", rng.randn(3, 8).astype(np.float32)),     # narrower than dim
        ("d", rng.randn(16).astype(np.float32)),       # 1-D row
        ("e", rng.randn(4, 16).astype(np.float64)),    # f8 cast
        ("f", rng.randn(4, 16).astype(np.float16)),    # f2 cast
    ]
    for name, arr in specs:
        np.save(tmp_path / f"{name}.npy", arr)
    paths = [str(tmp_path / f"{n}.npy") for n, _ in specs]

    block, counts = featio.read_padded_batch(paths, max_rows=8, dim=16)
    assert block.shape == (len(specs), 8, 16)

    for i, (name, arr) in enumerate(specs):
        a2 = arr[None, :] if arr.ndim == 1 else arr
        rows = min(len(a2), 8)
        cols = min(a2.shape[1], 16)
        assert counts[i] == rows, name
        np.testing.assert_allclose(
            block[i, :rows, :cols], a2[:rows, :cols].astype(np.float32),
            atol=1e-6, err_msg=name,
        )
        # padding stays zero
        assert not block[i, rows:].any()
        assert not block[i, :, cols:].any()


def test_missing_and_unsupported_marked(built, tmp_path):
    np.save(tmp_path / "ok.npy", np.ones((2, 4), np.float32))
    np.save(tmp_path / "obj.npy", np.array([{"x": 1}], dtype=object),
            allow_pickle=True)
    paths = [
        str(tmp_path / "ok.npy"),
        str(tmp_path / "missing.npy"),
        str(tmp_path / "obj.npy"),
    ]
    block, counts = featio.read_padded_batch(paths, max_rows=4, dim=4)
    assert counts[0] == 2 and counts[1] == -1 and counts[2] == -1
    assert not block[1].any() and not block[2].any()


def test_video_feature_reader_native_path(built, tmp_path):
    from vitxtgqa_tpu.data.feature_readers import VideoFeatureReader

    vdir = tmp_path / "vid1"
    os.makedirs(vdir)
    rng = np.random.RandomState(1)
    frames = {i: rng.randn(1, 32).astype(np.float32) for i in (1, 3, 7)}
    for fid, arr in frames.items():
        np.save(vdir / f"{fid}.npy", arr)

    reader = VideoFeatureReader(str(tmp_path), feat_dim=32)
    out = reader.read_frames("vid1", [1, 3, 5, 7], pad_to=5)
    assert out.shape == (5, 32)
    np.testing.assert_allclose(out[0], frames[1].ravel(), atol=1e-6)
    np.testing.assert_allclose(out[1], frames[3].ravel(), atol=1e-6)
    assert not out[2].any()  # missing frame id
    np.testing.assert_allclose(out[3], frames[7].ravel(), atol=1e-6)
    assert not out[4].any()  # padding


def test_padded_reader_batch(built, tmp_path):
    from vitxtgqa_tpu.data.feature_readers import PaddedFeatureReader

    rng = np.random.RandomState(2)
    arrs = {f"item{i}": rng.randn(i + 1, 10).astype(np.float32) for i in range(3)}
    for name, arr in arrs.items():
        np.save(tmp_path / f"{name}.npy", arr)
    reader = PaddedFeatureReader(str(tmp_path), max_loc=4)
    block, counts = reader.read_batch(list(arrs), feat_dim=10)
    assert block.shape == (3, 4, 10) and counts == [1, 2, 3]
    for i, (name, arr) in enumerate(arrs.items()):
        np.testing.assert_allclose(block[i, : len(arr)], arr, atol=1e-6)
