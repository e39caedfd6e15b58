"""bench.py deadline contract: ONE parseable JSON line, always.

Round 1's benchmark capture failed with parsed:null because the tunneled
TPU wedged and bench.py had no deadline escape (VERDICT item 1).  This
runs bench.py as a subprocess with a deadline far below any possible
live measurement and asserts the watchdog emits the last-known-good
cache line — the exact behavior later validated during a real
multi-hour wedge.
"""

import json
import subprocess
import sys


def test_bench_emits_parseable_json_under_tight_deadline():
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        env={"BENCH_DEADLINE_SECONDS": "25", "PATH": "/usr/bin:/bin",
             "HOME": "/root"},
        capture_output=True, text=True, timeout=120,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout[-500:] + proc.stderr[-500:]
    payload = json.loads(lines[0])
    assert payload["unit"] == "docs/s"
    assert payload["value"] > 0  # last-known-good numbers, never zeroed
    assert payload["vs_baseline"] > 100  # BASELINE.json:5 gate
    # Under a 25 s deadline the live path cannot finish: must be the
    # stale-cache fallback (on a healthy chip with warm caches a live
    # result would also be acceptable — but not in 25 s through the
    # tunnel).
    assert payload.get("stale") is True
