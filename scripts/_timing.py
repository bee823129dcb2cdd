"""Shared marginal-timing protocol for the on-chip bench scripts.

One canonical implementation of the half-vs-full-batch marginal (removes
the tunnel's fixed dispatch/sync overhead) so a protocol fix lands once,
not per script.  ``bench.py`` at the repo root keeps its own private copy
on purpose: the driver runs it standalone and it must not depend on the
``scripts`` package being importable.
"""

import time

import numpy as np


def default_sync(out):
    """Force a real device→host transfer (block_until_ready does not
    actually block over the axon tunnel)."""
    x = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(x.ravel()[:1])


def marginal_ms(fn, sync=default_sync, iters=48, pairs=5, warmup=4):
    """Median steady-state marginal ms/call of ``fn`` over ``pairs``
    half-vs-full batch pairs; falls back to the median MEAN when the
    marginal is noise-dominated (never reports a negative).  Returns ms."""
    iters = max(2, iters)
    half = max(1, iters // 2)

    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    run(warmup)
    run(warmup)
    margs, means = [], []
    for _ in range(pairs):
        t_half = run(half)
        t_full = run(iters)
        margs.append((t_full - t_half) / (iters - half))
        means.append(t_full / iters)
    m = sorted(margs)[len(margs) // 2]
    if m <= 0:  # noise-dominated: median of means, not one leaked sample
        m = sorted(means)[len(means) // 2]
    return m * 1e3
