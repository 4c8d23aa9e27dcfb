"""Shared timing scaffolding for the benchmark scripts.

Every on-chip benchmark in this directory times the same way:

  * each measured step ends with a HOST SCALAR FETCH (``float(...)``) —
    on the axon backend ``block_until_ready`` returns at enqueue, so a
    value fetch is the only reliable device sync (CLAUDE.md trap 3);
  * warmup runs absorb compile + first-dispatch one-time costs;
  * the reported statistic is the median (sometimes min) of sorted reps,
    measured inside ONE session so chip-phase variance (trap 5) cannot
    fake a cross-arm verdict.

Centralizing the loop keeps cross-benchmark numbers methodologically
comparable; the step closure owns state threading (donated buffers,
chunk carries) since that differs per script.
"""

from __future__ import annotations

import time
from typing import Callable, List


def timed_reps(step: Callable[[], None], warmup: int = 2, reps: int = 5) -> List[float]:
    """Run ``step`` (which must END with a host scalar fetch) ``warmup``
    times unmeasured, then ``reps`` timed runs. Returns SORTED wall
    times in seconds: ``ts[0]`` is the min, ``ts[len(ts)//2]`` the median."""
    for _ in range(warmup):
        step()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times


def median_time(step: Callable[[], None], warmup: int = 2, reps: int = 5) -> float:
    """Median wall seconds of ``reps`` synchronized runs of ``step``."""
    ts = timed_reps(step, warmup=warmup, reps=reps)
    return ts[len(ts) // 2]
