"""Preemption-safe training: catch SIGTERM, checkpoint, exit cleanly.

The reference has no failure-recovery story at all — a crashed or
preempted run restarts from epoch 1 (SURVEY.md §5 "Failure detection /
elastic recovery: none"). TPU pods make this a first-class concern:
maintenance events and spot reclaims deliver SIGTERM with a grace window.

:class:`PreemptionGuard` turns that signal into a cooperative flag the
trainer polls at epoch/block boundaries: the run saves a checkpoint
(params + BN stats + optimizer state, the exact resume contract pinned by
``test_resume_reproduces_uninterrupted_run``) and returns normally, so a
relaunch with ``start_epoch`` continues bit-identically.

A second signal restores the previous handler's behavior — if the process
is wedged mid-dispatch (the tunnel-hang failure mode documented in
CLAUDE.md), the second SIGTERM still kills it.
"""

from __future__ import annotations

import signal
from typing import Iterable, Optional


class PreemptionGuard:
    """Context manager: translate termination signals into a poll-able flag.

    Usage::

        with PreemptionGuard() as guard:
            trainer.fit(checkpoint_dir=ckpt, preemption_guard=guard)

    The first caught signal sets :attr:`requested` and re-installs the
    previous handler (second signal = previous behavior, usually death).
    Handlers are always restored on exit.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._previous = {}
        self.requested = False
        self.signum: Optional[int] = None

    def _handle(self, signum, frame):
        self.requested = True
        self.signum = signum
        # one-shot: a second signal falls through to the previous handler
        self._restore()

    def _restore(self):
        for signum, prev in self._previous.items():
            try:
                signal.signal(signum, prev)
            except (ValueError, OSError):  # non-main thread / bad signum
                pass
        self._previous = {}

    def request(self):
        """Set the flag programmatically (tests, external watchdogs)."""
        self.requested = True

    def __enter__(self) -> "PreemptionGuard":
        for signum in self._signals:
            try:
                self._previous[signum] = signal.signal(signum, self._handle)
            except ValueError:
                # signals can only be installed in the main thread; degrade
                # to a programmatic-only guard rather than failing the run
                pass
        return self

    def __exit__(self, *exc):
        self._restore()
        return False
