"""Shared scan-difference timing for the perf harnesses.

Over the tunneled TPU backend, ``block_until_ready`` is a no-op and every
dispatch pays ~30 ms RTT, so valid timing must (a) run the whole measurement
on device as ONE dispatch (``lax.scan`` over iterations reduced to a scalar),
(b) synchronize via host fetch of that scalar, and (c) cancel the fixed
dispatch cost by differencing a long and a short scan:

    per_iter = (T(long) - T(short)) / (long - short)

``scan_diff(go, short, long)`` takes ``go(iters) -> None`` (must host-fetch),
warms each length once, and returns best-of-``reps`` per-iteration seconds.
"""

from __future__ import annotations

import time


def best_time(go, iters: int, reps: int = 3) -> float:
    """Warm once, then best wall time of ``go(iters)`` over ``reps`` runs."""
    go(iters)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        go(iters)
        best = min(best, time.perf_counter() - t0)
    return best


def scan_diff(go, short: int = 2, long: int = 22, reps: int = 3) -> float:
    """Per-iteration seconds via long-minus-short scan differencing."""
    t_short = best_time(go, short, reps)
    t_long = best_time(go, long, reps)
    return (t_long - t_short) / (long - short)
