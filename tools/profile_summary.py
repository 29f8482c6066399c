"""Summarise a jax.profiler trace: top device ops by self-time.

Usage:
    BENCH_PROFILE_DIR=/tmp/trace python bench.py     # capture
    python tools/profile_summary.py /tmp/trace [N]   # report top-N

Parses the .xplane.pb via xprof/tensorboard-plugin-profile (both in the
image) and prints the framework-op-stats table — the same data the
tensorboard Profile tab shows, without needing a browser on this machine.
Replaces the reference's debug-level phase Timer profiling
(reference: pythia/trainers/base_trainer.py:465-468) with real device-op
attribution.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def find_xplane(root: str) -> str:
    hits = sorted(
        glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise SystemExit(f"no .xplane.pb under {root}")
    return hits[-1]


def summarise(xplane: str, top_n: int = 25):
    # xprof's converter works with the image's protobuf; the older
    # tensorboard-plugin-profile one needs pure-python descriptors
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from xprof.convert import raw_to_tool_data as rttd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data(
        [xplane], "framework_op_stats", {"tqx": "out:json;"}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    obj = json.loads(data)
    # xprof returns a list of gviz tables (device, host); older plugins a
    # single {"table": ...} dict
    tables = obj if isinstance(obj, list) else [obj.get("table", obj)]
    table = tables[0]
    cols = [c["label"] for c in table["cols"]]
    rows = [
        [cell.get("v") if cell else None for cell in r["c"]]
        for r in table["rows"]
    ]
    idx = {c: i for i, c in enumerate(cols)}
    # column labels vary slightly across plugin versions; match loosely
    def col(*names):
        for n in names:
            for label, i in idx.items():
                if n.lower() in label.lower():
                    return i
        return None

    i_type = col("Type", "Operation")
    i_op = col("Op name", "Operation name", "name")
    i_self = col("Total self-time (us)", "self-time")
    i_occ = col("#Occurrences", "occurrence")
    entries = []
    for r in rows:
        try:
            entries.append(
                (
                    float(r[i_self]),
                    r[i_op][:90] if i_op is not None else "?",
                    r[i_type] if i_type is not None else "?",
                    int(float(r[i_occ])) if i_occ is not None else 0,
                )
            )
        except (TypeError, ValueError):
            continue
    entries.sort(reverse=True)
    total = sum(e[0] for e in entries)
    print(f"total device self-time: {total/1000:.1f} ms over {len(entries)} ops")
    print(f"{'self ms':>9} {'%':>5} {'n':>6}  op")
    for self_us, name, typ, occ in entries[:top_n]:
        print(f"{self_us/1000:9.2f} {100*self_us/total:5.1f} {occ:6d}  [{typ}] {name}")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    summarise(find_xplane(root), n)
