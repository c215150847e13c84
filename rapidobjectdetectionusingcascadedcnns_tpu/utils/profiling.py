"""Profiling hooks: per-phase timers + jax.profiler traces.

The reference's only tracing is wall-clock TimeWatchers around phases
(SURVEY.md §5). This module keeps that surface (phase timers with the same
log format) and adds the TPU-native instrument the reference lacks:
``jax.profiler`` trace capture for xprof/tensorboard analysis of the compiled
programs.
"""

from __future__ import annotations

import contextlib
import os
from typing import Dict, Iterator, Optional

from . import log
from .time_watcher import TimeWatcher

_phase_totals: Dict[str, float] = {}


@contextlib.contextmanager
def phase(name: str, quiet: bool = True) -> Iterator[None]:
    """Accumulating phase timer; totals retrievable via :func:`summary`."""
    tw = TimeWatcher(name, quiet=quiet)
    try:
        yield
    finally:
        elapsed = tw.stop()
        _phase_totals[name] = _phase_totals.get(name, 0.0) + elapsed


def summary() -> Dict[str, float]:
    return dict(_phase_totals)


def reset() -> None:
    _phase_totals.clear()


def log_summary() -> None:
    log.log("phase timing summary:")
    for name, total in sorted(_phase_totals.items(), key=lambda kv: -kv[1]):
        log.log("  - {}: {}".format(name, TimeWatcher.seconds_to_str(total)))


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    import jax

    from .. import config as cf

    target = log_dir or os.path.join(cf.get("summary_dir"), "jax_trace")
    os.makedirs(target, exist_ok=True)
    jax.profiler.start_trace(target)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.log("jax profiler trace written to {}".format(target))


def annotate(name: str):
    """Named region visible in profiler traces (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
