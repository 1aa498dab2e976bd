"""Structured per-iteration metrics and profiling.

The reference's observability is bare prints: a loss string every 100 iters
(optim.py:212-213) and one wall-clock total (optim.py:217). Here every
iteration can emit a JSON line with loss terms, trace statistics (active
rays per bounce, TIR/miss drops, exit occlusions), gradient norms, and
timing — plus a jax.profiler trace helper for kernel-level analysis
(SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import IO, Optional


class MetricsLogger:
    """Append JSON-line metrics to a file (or keep in memory)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            import os
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh: Optional[IO] = open(path, "a") if path else None
        self.history: list[dict] = []
        self._t0 = time.perf_counter()

    def log(self, record: dict) -> None:
        rec = {"t": round(time.perf_counter() - self._t0, 4)}
        for k, v in record.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self.history.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
