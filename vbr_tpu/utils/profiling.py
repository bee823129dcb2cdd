"""Observability: per-stage timing + device tracing + numeric checking.

The reference's only instrumentation is a per-frame ``glGetError`` print
(executable.py:131-132, SURVEY.md §5).  Here:

  * :class:`StageTimer` — named wall-clock stages with true device sync
    (a 1-element transfer — ``block_until_ready`` alone does not flush
    some tunneled runtimes).
  * :func:`trace` — context manager around ``jax.profiler`` for XLA-level
    traces viewable in TensorBoard/XProf.
  * :func:`checked` — wraps a function with ``jax.experimental.checkify``
    NaN/div checks, the functional analog of a sanitizer pass.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import numpy as np


def device_sync(x) -> None:
    """Force true completion of device work feeding ``x``."""
    try:
        np.asarray(x.ravel()[:1] if hasattr(x, "ravel") else x)
    except Exception:
        pass


class StageTimer:
    """Accumulating named-stage timer.

    >>> timer = StageTimer()
    >>> with timer("masks"):
    ...     masks = model.masks(frames)
    >>> timer.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                device_sync(sync_value)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def mean_ms(self, name: str) -> float:
        return 1e3 * self.totals[name] / max(self.counts[name], 1)

    def report(self) -> str:
        lines = [
            f"{name}: {self.mean_ms(name):8.2f} ms/call × {self.counts[name]}"
            for name in sorted(self.totals)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "artifacts/trace"):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def checked(fn):
    """Wrap ``fn`` with checkify NaN/div error tracking.

    Returns a function with the same signature that raises on NaN or
    division errors inside jitted code — the sanitizer analog for the
    functional compute path (SURVEY.md §5 "race detection/sanitizers").
    """
    from jax.experimental import checkify

    checked_fn = checkify.checkify(
        fn, errors=checkify.float_checks
    )

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
