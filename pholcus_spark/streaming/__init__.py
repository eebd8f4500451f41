"""Streaming posture (SURVEY.md §2.12): the reference is batch-iterative
(an async goroutine pool, no event time, no watermarks), and the north
rule's determinism + snapshot-resume requirements make the superstep
loop the correct Spark realization — each superstep is effectively a
`foreachBatch` micro-batch whose commit is the checkpoint.

For deployments that want a long-running process, `drive_forever` wraps
the engine in a poll loop (new seeds appended to the frontier between
drains), which is exactly the semantics Structured Streaming's
availableNow trigger would give over a seed source — without giving up
deterministic ordering.
"""

from __future__ import annotations

import time


def drive_forever(engine, seed_poll, interval_s: float = 5.0, max_cycles=None):
    """Run the engine to drain, then poll `seed_poll()` for new seed
    dicts and continue; stop after max_cycles polls (None = forever)."""
    cycles = 0
    while True:
        engine.run()
        seeds = seed_poll()
        if seeds:
            # seed() unions into the existing frontier and clears the
            # stopped flag itself — state, superstep ids, and failure
            # history all survive across poll cycles
            engine.seed(seeds)
        cycles += 1
        if max_cycles is not None and cycles >= max_cycles:
            return
        time.sleep(interval_s)
