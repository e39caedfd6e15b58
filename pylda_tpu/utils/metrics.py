"""Structured metrics/logging.

The reference prints iteration index, wall seconds, and log-likelihood to
stdout and encodes config into the output dir name (SURVEY.md section 5
"Metrics / logging").  We keep the stdout lines (host 0 only) and add a
JSONL stream per run for machine consumption.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


def is_host_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class MetricsLogger:
    """Stdout + JSONL metrics, emitted from host 0 only."""

    def __init__(self, output_directory: Optional[str] = None):
        self._jsonl = None
        if output_directory is not None and is_host_zero():
            os.makedirs(output_directory, exist_ok=True)
            self._jsonl = open(
                os.path.join(output_directory, "metrics.jsonl"),
                "a",
                encoding="utf-8",
            )
        self._t0 = time.time()

    def log(self, **fields) -> None:
        if not is_host_zero():
            return
        fields.setdefault("wall_time", round(time.time() - self._t0, 3))
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(fields) + "\n")
            self._jsonl.flush()
        msg = " ".join(f"{k}={v}" for k, v in fields.items())
        print(msg, file=sys.stdout, flush=True)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
