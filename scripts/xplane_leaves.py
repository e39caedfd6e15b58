#!/usr/bin/env python
"""Leaf-op aggregation of a saved xplane trace directory.

profile_sweep.xplane_op_table reports every event on the 'XLA Ops'
line, which double-counts control-flow wrappers (a `while` event spans
all its children) and drowns the table in thousand-char tuple type
strings.  This tool reports LEAF ops only, grouped by a short key:
the HLO opcode plus the first named producer inside fusion names
(e.g. 'fusion: dot', 'fusion: exponential'), with wrappers
(while/conditional/call/tuple) excluded from the total.

Usage: python scripts/xplane_leaves.py /tmp/svitrace_xxx [top]
"""

import glob
import json
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

WRAPPERS = ("while", "conditional", "call", "tuple", "get-tuple-element",
            "bitcast", "parameter")


def short_key(name: str) -> str:
    # '%fusion.123 = bf16[...] fusion(...), kind=kLoop ...' -> opcode
    m = re.match(r"%([a-zA-Z-]+)[.\d]*", name)
    op = m.group(1) if m else name[:24]
    if op == "fusion":
        km = re.search(r"kind=k(\w+)", name)
        cm = re.search(r"calls=%?([\w.-]+)", name)
        kind = km.group(1) if km else "?"
        callee = re.sub(r"[\d.]+$", "", cm.group(1)) if cm else ""
        return f"fusion/{kind}:{callee[:40]}"
    return op


def leaf_table(logdir: str, top: int = 30) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(lambda: [0.0, 0])
    total_ps = 0.0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                key = short_key(name)
                base = key.split("/")[0]
                if base in WRAPPERS:
                    continue
                agg[key][0] += ev.duration_ps
                agg[key][1] += 1
                total_ps += ev.duration_ps
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    return {
        "leaf_busy_ms": round(total_ps / 1e9, 3),
        "ops": [
            {"op": k, "total_ms": round(ps / 1e9, 3), "count": n,
             "pct": round(100 * ps / total_ps, 2)}
            for k, (ps, n) in rows[:top]
        ],
    }


if __name__ == "__main__":
    d = sys.argv[1]
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    print(json.dumps(leaf_table(d, t), indent=1))
