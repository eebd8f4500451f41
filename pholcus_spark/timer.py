"""Named timers — the reference's spider Timer/Clock aid re-expressed.

Reference semantics (`app/spider/timer.go:10-163`, surfaced to rules
via ``ctx.SetTimer``/``ctx.RunTimer``, `context.go:396-405`):

* ``set(id, tol, bell)`` registers a named clock. With ``bell=None``
  it is a COUNTDOWN: ``tol`` is the sleep duration. With a ``Bell``
  (hour/min/sec time-of-day) it is an ALARM: ``tol`` counts the
  wake-up occurrence — if today's bell is already past, it rings
  ``tol`` days from now, else ``tol - 1`` days after today's bell
  (`timer.go:141-152`).
* ``sleep(id)`` blocks until the clock fires, returning whether the
  timer may still be used (False when unknown or the system was
  dropped — checked BEFORE and AFTER the sleep, `timer.go:23-47`).
* ``drop()`` wakes every sleeper immediately and closes the system
  (`timer.go:69-78`).

Where it sits in the Spark engine: the reference sleeps rule
goroutines mid-parse; a batch engine has no mid-task sleeping — the
Timer paces the DRIVER loop instead (between supersteps, between
scheduled re-crawls of a seed list), which is also where the reference
samples use it (`baidunews.go` re-polls a news index on a timer).
Clock and sleeper are injectable so tests are deterministic.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass


@dataclass(frozen=True)
class Bell:
    """Alarm time-of-day (`timer.go:88-93`)."""

    hour: int
    min: int = 0
    sec: int = 0

    def valid(self) -> bool:
        return (
            0 <= self.hour < 24 and 0 <= self.min < 60 and 0 <= self.sec < 60
        )


class _Clock:
    def __init__(self, cid: str, tol: float, bell: Bell | None, now):
        self.id = cid
        self.tol = tol
        self.bell = bell
        self._now = now
        self._wake = threading.Event()

    def duration(self) -> float:
        """`timer.go:141-157`: countdown → tol seconds; alarm → the
        tol-th occurrence of the bell time-of-day from now."""
        if self.bell is None:
            return float(self.tol)
        now = self._now()
        lt = time.localtime(now)
        midnight = now - (lt.tm_hour * 3600 + lt.tm_min * 60 + lt.tm_sec)
        bell_today = midnight + (
            self.bell.hour * 3600 + self.bell.min * 60 + self.bell.sec
        )
        if bell_today < now:
            return bell_today + 86400.0 * float(self.tol) - now
        return bell_today + 86400.0 * (float(self.tol) - 1.0) - now

    def wake(self) -> None:
        self._wake.set()


class Timer:
    """Collection of named clocks (`timer.go:10-78`). ``now`` returns
    epoch seconds (injectable for deterministic alarm math)."""

    def __init__(self, now=time.time):
        self._now = now
        self._setting: dict[str, _Clock] = {}
        self._closed = False
        self._lock = threading.RLock()

    def set(self, cid: str, tol: float, bell: Bell | None = None) -> bool:
        """Register/replace the named clock; False when the system is
        closed or the parameters are invalid (`timer.go:50-67`)."""
        with self._lock:
            if self._closed:
                return False
            if tol <= 0 or (bell is not None and not bell.valid()):
                return False
            self._setting[cid] = _Clock(cid, tol, bell, self._now)
            return True

    def sleep(self, cid: str) -> bool:
        """Block until the named clock fires; True iff the timer is
        still usable afterwards (`timer.go:23-47`)."""
        with self._lock:
            if self._closed:
                return False
            c = self._setting.get(cid)
            if c is None:
                return False
            # re-arm UNDER the lock: drop() flips _closed before it
            # wakes, so a clear here can never swallow a drop's wake
            # (the unguarded clear-then-wait lost the wake-up when a
            # drop landed between them and slept the full duration)
            c._wake.clear()
        c._wake.wait(c.duration())
        with self._lock:
            return not self._closed and cid in self._setting

    def drop(self) -> None:
        """Wake every sleeper and close (`timer.go:69-78`)."""
        with self._lock:
            self._closed = True
            clocks = list(self._setting.values())
            self._setting = {}
        for c in clocks:
            c.wake()
