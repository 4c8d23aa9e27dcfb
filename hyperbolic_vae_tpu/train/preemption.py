"""Preemption-safe training: graceful-stop signal handling.

TPU capacity in production is routinely preemptible (spot/queued
resources get a SIGTERM shortly before the VM is reclaimed). The
reference has no story for this — an interrupted Lightning run loses
everything since its last (manual) checkpoint. Here the Trainer treats
preemption as a first-class event: ``Trainer(preempt_signals=(SIGTERM,))``
installs flag-setting handlers for the duration of ``fit()``; the fit
loop checks the flag at epoch (K=1) / chunk (K>1) boundaries, saves the
FULL resume state (params, opt state, PRNG key, controller mirrors) and
returns cleanly with ``TrainResult.interrupted=True``. A later
``fit(resume=True)`` continues bit-identically with an uninterrupted
run (tests/test_preemption.py pins this).

``Trainer(max_wall_seconds=...)`` is the sibling mechanism for slot
time budgets (checked at the same boundaries, same clean-stop path).
"""

from __future__ import annotations

import signal
from typing import Sequence


class GracefulShutdown:
    """Context manager that converts the given signals into a polled
    flag instead of process death.

    Handlers are installed on ``__enter__`` and the previous handlers
    restored on ``__exit__`` (so a second signal after fit() returns
    behaves normally). Python delivers signal handlers on the main
    thread only — construct/enter this from the thread running fit().
    """

    def __init__(self, signals: Sequence[int] = (signal.SIGTERM,)):
        self.signals = tuple(signals)
        self.triggered = False
        self.signum = None
        self._prev = {}

    def _handler(self, signum, frame):
        del frame
        self.triggered = True
        self.signum = signum

    def __enter__(self):
        for s in self.signals:
            self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        return False
