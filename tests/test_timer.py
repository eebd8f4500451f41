"""Timer aid (`app/spider/timer.go`) — countdown, alarm math, drop."""

from __future__ import annotations

import threading
import time

from pholcus_spark.timer import Bell, Timer, _Clock


def test_countdown_sleeps_and_stays_usable():
    t = Timer()
    assert t.set("x", 0.05)
    t0 = time.monotonic()
    assert t.sleep("x") is True
    assert time.monotonic() - t0 >= 0.045
    assert t.sleep("x") is True  # reusable (timer.go keeps the clock)


def test_invalid_parameters_rejected():
    t = Timer()
    assert t.set("neg", 0) is False
    assert t.set("neg", -1) is False
    assert t.set("badbell", 1, Bell(24, 0, 0)) is False
    assert t.set("badbell", 1, Bell(1, 60, 0)) is False
    assert t.sleep("unknown") is False


def test_alarm_duration_math():
    """timer.go:141-152: bell already past today → tol days from now;
    bell still ahead → (tol-1) days after today's bell."""
    # freeze "now" at 10:00:00 local on an arbitrary day
    lt = time.localtime()
    midnight = time.mktime(
        (lt.tm_year, lt.tm_mon, lt.tm_mday, 0, 0, 0,
         lt.tm_wday, lt.tm_yday, -1)
    )
    now = midnight + 10 * 3600
    # bell at 09:00 (past): first occurrence = tomorrow 09:00 for tol=1
    c = _Clock("a", 1, Bell(9), lambda: now)
    assert c.duration() == 23 * 3600.0
    # ... and tol=3 → 3 days out
    c = _Clock("a", 3, Bell(9), lambda: now)
    assert c.duration() == 23 * 3600.0 + 2 * 86400.0
    # bell at 11:00 (ahead): tol=1 → today 11:00
    c = _Clock("a", 1, Bell(11), lambda: now)
    assert c.duration() == 3600.0
    # tol=2 → tomorrow 11:00
    c = _Clock("a", 2, Bell(11), lambda: now)
    assert c.duration() == 3600.0 + 86400.0


def test_drop_wakes_sleepers_and_closes():
    t = Timer()
    assert t.set("long", 60.0)
    out = {}

    def sleeper():
        t0 = time.monotonic()
        out["usable"] = t.sleep("long")
        out["waited"] = time.monotonic() - t0

    th = threading.Thread(target=sleeper)
    th.start()
    time.sleep(0.1)
    t.drop()
    th.join(timeout=5)
    assert not th.is_alive()
    assert out["usable"] is False  # closed → unusable (timer.go:40-46)
    assert out["waited"] < 5
    # closed system refuses new clocks
    assert t.set("again", 1.0) is False
    assert t.sleep("long") is False
