"""ConcatDataset indexing + attr/method fan-out (reference:
pythia/datasets/concat_dataset.py:8-46)."""

import pytest

from vitxtgqa_tpu.data.concat_dataset import ConcatDataset


class _Child:
    def __init__(self, items, tag):
        self.items = items
        self.tag = tag
        self.calls = 0

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]

    def get_item(self, i):
        return (self.tag, self.items[i])

    def touch(self):
        self.calls += 1
        return None

    def first_non_none(self):
        self.calls += 1
        return self.tag if self.tag == "a" else None


def test_index_spans_children():
    ds = ConcatDataset([_Child([1, 2], "a"), _Child([3, 4, 5], "b")])
    assert len(ds) == 5
    assert [ds[i] for i in range(5)] == [1, 2, 3, 4, 5]
    assert ds[-1] == 5
    assert ds.get_item(2) == ("b", 3)
    with pytest.raises(IndexError):
        ds[5]


def test_attr_falls_through_to_first_child():
    ds = ConcatDataset([_Child([1], "a"), _Child([2], "b")])
    assert ds.tag == "a"
    with pytest.raises(AttributeError):
        ds.nope


def test_method_fans_out_and_short_circuits():
    a, b = _Child([1], "a"), _Child([2], "b")
    ds = ConcatDataset([a, b])
    assert ds.touch() is None
    assert a.calls == 1 and b.calls == 1  # None returns -> all children
    # first non-None return short-circuits (reference quirk)
    assert ds.first_non_none() == "a"
    assert a.calls == 2 and b.calls == 1
