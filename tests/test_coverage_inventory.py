"""COVERAGE.md file-level disposition index vs the reference inventory.

Fails loudly when a reference `.py` file has no disposition row (new or
previously-missed files) or when the index lists a file that no longer
exists — so coverage gaps can't go silent (round-3 VERDICT item 5).
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
COVERAGE = os.path.join(REPO, "COVERAGE.md")


def _indexed_files():
    text = open(COVERAGE).read()
    m = re.search(
        r"<!-- BEGIN REFERENCE FILE INDEX -->(.*?)<!-- END REFERENCE FILE INDEX -->",
        text,
        re.S,
    )
    assert m, "COVERAGE.md lacks the reference file index block"
    files = []
    for line in m.group(1).splitlines():
        row = re.match(r"\|\s*([^|]+?)\s*\|\s*(.+?)\s*\|$", line.strip())
        if not row or row.group(1) in ("Reference file", "---"):
            continue
        files.append((row.group(1), row.group(2)))
    return files


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_every_reference_py_file_dispositioned():
    inventory = set()
    for base, _dirs, names in os.walk(REFERENCE):
        for n in names:
            if n.endswith(".py"):
                inventory.add(
                    os.path.relpath(os.path.join(base, n), REFERENCE)
                )
    indexed = {f for f, _ in _indexed_files()}
    missing = sorted(inventory - indexed)
    stale = sorted(indexed - inventory)
    assert not missing, f"reference files with no COVERAGE.md disposition: {missing}"
    assert not stale, f"COVERAGE.md lists nonexistent reference files: {stale}"


def test_dispositions_are_substantive():
    for f, disp in _indexed_files():
        assert len(disp) > 10, f"empty disposition for {f}"
        assert disp.startswith(("->", "omitted", "package marker")), (f, disp)
