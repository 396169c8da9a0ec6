"""Stage timing + device tracing.

The reference measures latency ad hoc inside evaluators (SURVEY.md §5:
"wire jax.profiler traces + per-stage timing into the same report fields").
This module provides:

- ``stage_timer(name)``: context manager accumulating wall-clock per stage
  into a process-global report; CLIs dump it with ``timing_report()``.
- device tracing: when AEP_PROFILE_DIR is set, ``stage_timer`` wraps the
  stage in a ``jax.profiler.trace`` so TensorBoard-compatible traces land
  under that directory.
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from contextlib import contextmanager

logger = logging.getLogger(__name__)

_TIMINGS: dict[str, dict] = defaultdict(lambda: {"calls": 0, "total_s": 0.0})


@contextmanager
def stage_timer(name: str):
    profile_dir = os.environ.get("AEP_PROFILE_DIR")
    tracer = None
    if profile_dir:
        try:
            import jax.profiler

            tracer = jax.profiler.trace(os.path.join(profile_dir, name))
            tracer.__enter__()
        except Exception as exc:
            logger.debug("jax.profiler trace unavailable: %s", exc)
            tracer = None
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if tracer is not None:
            tracer.__exit__(None, None, None)
        rec = _TIMINGS[name]
        rec["calls"] += 1
        rec["total_s"] += dt


def timing_report() -> dict[str, dict]:
    return {
        name: {"calls": rec["calls"], "total_s": round(rec["total_s"], 4),
               "mean_s": round(rec["total_s"] / max(rec["calls"], 1), 4)}
        for name, rec in sorted(_TIMINGS.items())
    }


def log_timing_report() -> None:
    report = timing_report()
    if report:
        logger.info("stage timings: %s", json.dumps(report))


def reset() -> None:
    _TIMINGS.clear()
