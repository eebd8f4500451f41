"""Temporal operators over event streams — as-of join and tumbling
windows.

The as-of join is the classic operator Spark lacks natively (reference
analytics stacks and every market-data system have it): for each left
row, attach the single latest right row at-or-before its timestamp,
per key. The naive formulation is a range join (`l.ts >= r.ts`) that
explodes to O(|L|·|R|) per key before aggregation; this implementation
is the scale-safe composition:

    union(left, right) → one hash exchange on the key
    → per-partition sort (ts, side) → last_value(payload) ignorenulls

One shuffle, no join blow-up — at 100 TB the cost class is a groupBy
on the key, and AQE handles skewed keys like any other exchange. Ties:
right rows sort BEFORE left rows at equal ts (at-or-before semantics);
callers wanting deterministic output should pre-dedupe the right side
to one row per (key, ts) — see `q_asof_join` in __spark_entry__ for
the max-event_id convention the DuckDB ASOF JOIN oracle mirrors.

Tumbling windows use `F.window` (the streaming-ready form: identical
code runs under Structured Streaming with a watermark) rather than a
bare date_trunc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "tumbling_agg"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of LEFT join: every left row, plus the latest right
    row with ``right.ts <= left.ts`` within the same ``on`` key (NULLs
    where no right row precedes). Right payload columns (everything but
    key + ts) return suffixed; the matched right timestamp returns as
    ``ts<suffix>``.

    Plan shape (the reason this beats a range join at scale): the two
    inputs are unioned with a side tag, shuffled ONCE on the key, and
    the match is a running ``last(payload, ignorenulls)`` over the
    per-key (ts, side) sort — right rows carry their payload, left rows
    carry NULL, so the running last at a left row IS its as-of match.
    No per-key cross product ever materializes.
    """
    rcols = [c for c in right.columns if c not in (*on, ts)]
    lcols = [c for c in left.columns if c not in on]
    payload = F.struct(
        *[F.col(c).alias(c) for c in rcols], F.col(ts).alias(ts)
    )
    r2 = right.select(
        *[F.col(k) for k in on],
        F.col(ts).alias("_ats"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
    )
    ptype = r2.schema["_payload"].dataType
    l2 = left.select(
        *[F.col(k) for k in on],
        F.col(ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(ptype).alias("_payload"),
        *[F.col(c) for c in lcols],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("_ats"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    out_cols = [F.col(k) for k in on] + [F.col(c) for c in lcols]
    out_cols += [
        F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in (*rcols, ts)
    ]
    return matched.select(*out_cols)


def tumbling_agg(
    events: DataFrame,
    window: str,
    ts: str = "ts",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Tumbling-window rollup via ``F.window`` — the streaming-ready
    shape (add ``withWatermark`` and the same plan runs under
    Structured Streaming). Output carries ``bucket_start`` /
    ``bucket_end`` timestamps. Partial (map-side) aggregation applies
    as with any groupBy; the only shuffle is on (window, group keys).
    """
    group_cols = group_cols or []
    aggs = aggs or [F.count("*").alias("n")]
    return (
        events.groupBy(F.window(F.col(ts), window).alias("_w"), *group_cols)
        .agg(*aggs)
        .withColumns(
            {
                "bucket_start": F.col("_w.start"),
                "bucket_end": F.col("_w.end"),
            }
        )
        .drop("_w")
    )


def sliding_agg(
    events: DataFrame,
    window: str,
    slide: str,
    ts: str = "ts",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Sliding (hopping) window rollup: each event lands in
    window/slide overlapping buckets. Same `F.window` form as
    `tumbling_agg` (streaming-ready); the deliberate row amplification
    is the window/slide factor — at scale keep that ratio small, the
    shuffle is still one hash exchange on (window, keys)."""
    group_cols = group_cols or []
    aggs = aggs or [F.count("*").alias("n")]
    return (
        events.groupBy(
            F.window(F.col(ts), window, slide).alias("_w"), *group_cols
        )
        .agg(*aggs)
        .withColumns(
            {
                "bucket_start": F.col("_w.start"),
                "bucket_end": F.col("_w.end"),
            }
        )
        .drop("_w")
    )


def session_agg(
    events: DataFrame,
    gap: str,
    ts: str = "ts",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Gap-based session windows via native `F.session_window` — the
    batch twin of `streaming.stateful.sessionize_stream` (and the
    declarative form of gate `q_sessionize`'s lag/cumsum formulation).
    ``session_start`` = first event, ``session_end`` = last event +
    gap (Spark's convention). One shuffle on (keys); merging of
    overlapping per-row [ts, ts+gap) intervals happens inside the
    session-window aggregation."""
    group_cols = group_cols or []
    aggs = aggs or [F.count("*").alias("n")]
    return (
        events.groupBy(
            F.session_window(F.col(ts), gap).alias("_w"), *group_cols
        )
        .agg(*aggs)
        .withColumns(
            {
                "session_start": F.col("_w.start"),
                "session_end": F.col("_w.end"),
            }
        )
        .drop("_w")
    )
