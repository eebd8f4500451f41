"""drive_forever / incremental seeding: seeding a non-empty catalog
UNIONS into the frontier and preserves superstep ids, seq counter,
totals, and failure history (matrix.go:40-46 failure inheritance;
history.go:83-159 success inheritance)."""

from pyspark.sql import functions as F

from pholcus_spark import fixtures, testkit
from pholcus_spark.engine import EngineConfig
from pholcus_spark.spiderspec import SpiderSpec


def test_seed_union_preserves_state_and_history(spark):
    corpus = fixtures.generate(
        fixtures.SiteSpec(n_hosts=1, list_pages=4, flaky_rate=0.0, fail_404_rate=0.2)
    )
    all_seeds = corpus.seeds
    # a later poll delivers the same URL under a different rule — a NEW
    # key (the rule is part of request identity, request.go:139-145)
    new_seed = {**all_seeds[0], "rule": "detail"}
    engines = []
    run = testkit.run_engine(
        spark, corpus, SpiderSpec("site"), EngineConfig(wave_window_ms=6000),
        engine_out=engines,
    )
    try:
        eng = engines[0]
        s1 = dict(run.state)
        assert s1["stopped"]
        seen1 = {r.key for r in run.df("url_seen").select("key").collect()}
        ff1 = run.df("failures_final")
        n_ff1 = ff1.count() if ff1 is not None else 0

        # poll cycle: new seed arrives → union, not reset
        eng.seed([new_seed])
        s2 = eng.catalog.state()
        assert s2["superstep"] == s1["superstep"]  # not reset to 0
        assert s2["next_seq"] == s1["next_seq"] + 1
        assert s2["queued_count"] == 1
        assert not s2["stopped"]
        s3 = eng.run()
        assert s3["stopped"]
        assert s3["superstep"] > s1["superstep"]
        # cumulative totals — first drain's work is preserved
        assert s3["totals"]["fetched"] > s1["totals"]["fetched"]
        seen2 = {r.key for r in run.df("url_seen").select("key").collect()}
        assert seen1 < seen2
        # permanent-failure memory survives the re-seed
        ff2 = run.df("failures_final")
        n_ff2 = ff2.count() if ff2 is not None else 0
        assert n_ff2 >= n_ff1
        # superstep ids in append-only tables never collide
        mdf = run.df("metrics")
        assert (
            mdf.groupBy("superstep").count().where(F.col("count") > 1).count() == 0
        )

        # re-seeding an already-crawled seed is a deduped no-op
        eng.seed([all_seeds[0]])
        s4 = eng.catalog.state()
        assert s4["queued_count"] == 0
        assert s4["stopped"]
    finally:
        run.cleanup()


def test_stream_table_follows_catalog_appends(spark, tmp_path):
    """Structured Streaming over the catalog's append deltas: an
    availableNow drain sees exactly the committed metrics rows, and a
    second drain after more commits sees only/all the new total."""
    from pholcus_spark.streaming import metrics_rate_stream

    corpus = fixtures.generate(
        fixtures.SiteSpec(n_hosts=1, list_pages=4, flaky_rate=0.0, fail_404_rate=0.0)
    )
    engines = []
    run = testkit.run_engine(
        spark, corpus, SpiderSpec("site"), EngineConfig(wave_window_ms=6000),
        engine_out=engines,
    )
    try:
        agg = metrics_rate_stream(spark, run.workdir)
        q = (
            agg.writeStream.format("memory")
            .queryName("mrates")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT sum(fetched) FROM mrates"
        ).first()[0]
        assert got == run.state["totals"]["fetched"]
    finally:
        run.cleanup()


def test_committed_only_stream_ignores_orphan_dirs(spark, tmp_path):
    """A crashed commit's orphan delta dir (written but never published
    in the manifest) is invisible to the committed-only stream — the
    round-2 ADVICE finding against the bare {table}/* glob."""
    import shutil

    from pholcus_spark.streaming import stream_table

    corpus = fixtures.generate(
        fixtures.SiteSpec(n_hosts=1, list_pages=3, flaky_rate=0.0, fail_404_rate=0.0)
    )
    run = testkit.run_engine(
        spark, corpus, SpiderSpec("site"), EngineConfig(wave_window_ms=6000)
    )
    try:
        committed = run.df("metrics").count()
        # simulate a crash between delta write and manifest publish:
        # duplicate a committed dir under an unpublished name
        m = run.catalog.current()
        first = m["tables"]["metrics"]["dirs"][0]
        import os

        src = os.path.join(run.workdir, first)
        shutil.copytree(src, os.path.join(run.workdir, "metrics", "delta-999999"))
        schema = (
            "superstep int, wave_size long, fetched long, failed long, "
            "failed_final long, items long, images long, children long, "
            "seconds double"
        )
        s = stream_table(spark, run.workdir, "metrics", schema)
        q = (
            s.writeStream.format("memory").queryName("orphans")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        assert spark.sql("SELECT count(*) FROM orphans").first()[0] == committed
        # the glob mode DOES see the orphan (documented liveness trade)
        s2 = stream_table(
            spark, run.workdir, "metrics", schema, committed_only=False
        )
        q2 = (
            s2.writeStream.format("memory").queryName("orphans2")
            .trigger(availableNow=True).start()
        )
        q2.awaitTermination(120)
        assert spark.sql("SELECT count(*) FROM orphans2").first()[0] > committed
    finally:
        run.cleanup()


def _pq_events(path, rows, mtime):
    """Write one parquet file of (epoch_s, user_id) event rows with a
    pinned mtime (stable listing order)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "ts": pa.array(
                [int(s * 1_000_000) for s, _ in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([u for _, u in rows], pa.int64()),
        }
    )
    pq.write_table(t, path)
    os.utime(path, (mtime, mtime))


def _drain(df, name, ckpt, mode):
    """One availableNow drain; state + watermark persist in the
    checkpoint across drains (exactly the restart-resume contract), so
    dropping one file per drain gives deterministic micro-batches.
    foreachBatch is the sink: unlike the memory sink it supports
    checkpoint recovery (and update mode). Returns the drained rows."""
    rows = []
    q = (
        df.writeStream.foreachBatch(
            lambda batch, _bid: rows.extend(batch.collect())
        )
        .outputMode(mode)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return rows


def test_windowed_event_agg_drops_late_rows(spark, tmp_path):
    """Streaming twin of gate q_event_windows: watermarked tumbling agg
    over a file stream. A row arriving behind the checkpointed
    watermark is dropped; on-time rows aggregate exactly as the batch
    tumbling_agg."""
    from pyspark.sql import functions as F

    from pholcus_spark.streaming import windowed_event_agg

    src = tmp_path / "events_src"
    src.mkdir()

    def agg_df():
        stream = spark.readStream.schema(
            "ts timestamp, user_id bigint"
        ).parquet(str(src))
        return windowed_event_agg(
            stream, "1 minute", "10 seconds",
            aggs=[F.count("*").alias("n")],
        ).select("bucket_start", "n")

    got = {}

    def take(rows):
        for r in rows:
            b = int(r.bucket_start.timestamp())
            got[b] = max(got.get(b, 0), r.n)

    # drain 1: three events in window [600,660); max ts 650 -> wm 640
    _pq_events(src / "f1.parquet", [(600.0, 1), (630.0, 1), (650.0, 2)], 1000)
    take(_drain(agg_df(), "wagg", tmp_path / "ckpt_wagg", "update"))
    # drain 2: 500 is behind the checkpointed watermark (640) ->
    # dropped (no [480,540) window, no recount); 665 is on-time
    _pq_events(src / "f2.parquet", [(500.0, 1), (665.0, 2)], 2000)
    take(_drain(agg_df(), "wagg", tmp_path / "ckpt_wagg", "update"))

    assert got == {600: 3, 660: 1}


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState gap sessionization: intra-batch closure,
    event-time-timeout closure, late-row drop, cross-key watermark
    flush — closed sessions match the hand-computed batch gap rule."""
    from pholcus_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "sess_src"
    src.mkdir()

    def sess_df():
        stream = spark.readStream.schema(
            "ts timestamp, user_id bigint"
        ).parquet(str(src))
        return sessionize_stream(stream, gap_s=30.0, watermark="10 seconds")

    got = set()

    def take(rows):
        got.update(
            (
                r.user_id,
                int(r.session_start.timestamp()),
                int(r.session_end.timestamp()),
                r.n_events,
            )
            for r in rows
        )

    # gap 30s, watermark delay 10s
    # drain 1 (wm 0 -> 1045): u1 {1000,1010}; u2 {1005}; u3 {1000,1055}
    #   -> u3's intra-batch gap 55 > 30 splits [1000,1000] off as a
    #   separate open session (closed only when the watermark passes
    #   its 1030 horizon — the trailing no-data batch, wm 1045); that
    #   batch also times out u1 (horizon 1040) and u2 (1035); u3's
    #   open [1055] (horizon 1085) survives in state
    _pq_events(
        src / "f1.parquet",
        [(1000.0, 1), (1010.0, 1), (1005.0, 2), (1000.0, 3), (1055.0, 3)],
        1000,
    )
    take(_drain(sess_df(), "sess", tmp_path / "ckpt_sess", "append"))
    # drain 2 (wm 1045 -> 1090): u1's 1100 opens a fresh session; u2's
    # 1020 is behind the watermark -> dropped entirely (no session);
    # the no-data batch times out u3's [1055]
    _pq_events(src / "f2.parquet", [(1100.0, 1), (1020.0, 2)], 2000)
    take(_drain(sess_df(), "sess", tmp_path / "ckpt_sess", "append"))
    # drain 3: a sentinel on an unused key advances the global
    # watermark to 1990 -> flushes u1's [1100] by timeout
    _pq_events(src / "f3.parquet", [(2000.0, 999)], 3000)
    take(_drain(sess_df(), "sess", tmp_path / "ckpt_sess", "append"))

    assert got == {
        (3, 1000, 1000, 1),  # intra-batch gap split, closed at wm 1045
        (1, 1000, 1010, 2),  # two-event session closed by timeout
        (2, 1005, 1005, 1),  # closed by watermark; late 1020 ignored
        (3, 1055, 1055, 1),  # event-time timeout after drain 2
        (1, 1100, 1100, 1),  # flushed by the sentinel's watermark
    }
    # the sentinel's own session is still open: in state, not emitted
    assert not any(u == 999 for (u, *_rest) in got)


def test_sessionize_stream_out_of_order_merge(spark, tmp_path):
    """An on-time event arriving in a LATER micro-batch that precedes
    the open session merges interval-style — extending session_start
    backwards, or bridging two open sessions into one — so the closed
    output equals the batch gap rule on the union of events. (The
    pre-fix operator glued any on-time straggler onto the open session
    without moving its start, and could never re-merge a session it
    had already split off intra-batch.)"""
    from pholcus_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "sess_ooo_src"
    src.mkdir()

    def sess_df():
        stream = spark.readStream.schema(
            "ts timestamp, user_id bigint"
        ).parquet(str(src))
        # long watermark delay: everything below stays on time
        return sessionize_stream(stream, gap_s=30.0, watermark="500 seconds")

    got = set()

    def take(rows):
        got.update(
            (
                r.user_id,
                int(r.session_start.timestamp()),
                int(r.session_end.timestamp()),
                r.n_events,
            )
            for r in rows
        )

    # batch 1: u1 {1000, 1060} -> gap 60 > 30: TWO open sessions
    _pq_events(src / "f1.parquet", [(1000.0, 1), (1060.0, 1)], 1000)
    take(_drain(sess_df(), "sess_ooo", tmp_path / "ckpt_ooo", "append"))
    assert got == set()  # watermark (560) passed nothing yet
    # batch 2: u1's 1030 bridges them (1030-1000 and 1060-1030 both
    # <= 30) -> ONE session [1000,1060]; u2's 990 precedes u2's
    # nothing (fresh key)
    _pq_events(src / "f2.parquet", [(1030.0, 1), (990.0, 2)], 2000)
    take(_drain(sess_df(), "sess_ooo", tmp_path / "ckpt_ooo", "append"))
    # batch 3: sentinel advances the watermark far enough to flush all
    _pq_events(src / "f3.parquet", [(9000.0, 999)], 3000)
    take(_drain(sess_df(), "sess_ooo", tmp_path / "ckpt_ooo", "append"))

    assert got == {
        (1, 1000, 1060, 3),  # bridged across micro-batches
        (2, 990, 990, 1),
    }


def test_sessionize_stream_matches_batch_session_window(spark, tmp_path):
    """The stateful streaming sessionizer and the batch F.session_window
    operator implement the SAME gap rule (merge at diff <= gap): on a
    randomized event set straddling the gap boundary, closed streaming
    sessions == batch sessions, with stream end = last event and batch
    end = last event + gap (Spark's convention)."""
    import random

    from pyspark.sql import functions as F

    from pholcus_spark.ops.temporal import session_agg
    from pholcus_spark.streaming.stateful import sessionize_stream

    rng = random.Random(42)
    rows = []
    for u in range(1, 6):
        t = 1000.0
        for _ in range(40):
            t += rng.choice([1, 5, 10, 29, 30, 31, 45, 70])
            rows.append((t, u))
    src = tmp_path / "par_src"
    src.mkdir()
    _pq_events(src / "f1.parquet", rows, 1000)
    # sentinel far in the future: its watermark flushes every real
    # session out of state at the end of the drain
    sentinel_ts = max(t for t, _ in rows) + 10_000
    _pq_events(src / "f2.parquet", [(sentinel_ts, 999)], 2000)

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint")
        .parquet(str(src))
    )
    sessions = sessionize_stream(stream, gap_s=30.0, watermark="10 seconds")
    out = _drain(sessions, "sess_par", tmp_path / "ckpt_par", "append")
    got = {
        (r.user_id, int(r.session_start.timestamp()), r.n_events):
            int(r.session_end.timestamp())
        for r in out
    }

    batch = session_agg(
        spark.read.parquet(str(src / "f1.parquet")),
        "30 seconds",
        group_cols=["user_id"],
        aggs=[F.count("*").alias("n_events")],
    )
    want = {
        (r.user_id, int(r.session_start.timestamp()), r.n_events):
            int(r.session_end.timestamp())
        for r in batch.collect()
    }
    assert set(got) == set(want) and len(got) > 20
    for k, end in got.items():
        assert want[k] == end + 30  # batch end = last event + gap


def test_dedup_stream_suppresses_duplicates_within_horizon(spark, tmp_path):
    """dedup_stream: first occurrence of a key is emitted, re-arrivals
    within the watermark horizon are suppressed — across micro-batches
    via checkpointed state, not just within one batch."""
    from pholcus_spark.streaming import dedup_stream

    src = tmp_path / "dedup_src"
    src.mkdir()

    def df():
        stream = spark.readStream.schema(
            "ts timestamp, user_id bigint"
        ).parquet(str(src))
        return dedup_stream(stream, "user_id", watermark="1 hour")

    # drain 1: user 1 twice in one batch, user 2 once
    _pq_events(src / "f1.parquet", [(600.0, 1), (610.0, 1), (620.0, 2)], 1000)
    got1 = _drain(df(), "dd", tmp_path / "ckpt_dd", "append")
    assert sorted(r.user_id for r in got1) == [1, 2]
    # drain 2: user 1 again (within the 1h horizon -> suppressed by
    # checkpointed state), user 3 new
    _pq_events(src / "f2.parquet", [(700.0, 1), (710.0, 3)], 2000)
    got2 = _drain(df(), "dd", tmp_path / "ckpt_dd", "append")
    assert sorted(r.user_id for r in got2) == [3]


def test_seenstore_sink_streaming_incremental_dedup(spark, tmp_path):
    """seenstore_sink: a streaming feed probed against the persistent
    SeenStore — only store-unseen rows reach the downstream write, keys
    accumulate across micro-batches, and a replayed batch (same batch
    id after the key commit) is a clean no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pholcus_spark.ops.seenstore import SeenStore
    from pholcus_spark.streaming import seenstore_sink

    src = tmp_path / "feed"
    src.mkdir()

    def _pq_docs(path, keys, mtime):
        import os

        pq.write_table(pa.table({"key": pa.array(keys, pa.string())}), path)
        os.utime(path, (mtime, mtime))

    store = SeenStore.open(spark, str(tmp_path / "seen"), num_buckets=4)
    got: list[tuple[int, list[str]]] = []
    fn = seenstore_sink(
        store, "key",
        lambda df, bid: got.append((bid, sorted(r.key for r in df.collect()))),
    )

    def drain():
        q = (
            spark.readStream.schema("key string")
            .parquet(str(src))
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", str(tmp_path / "ckpt_seen"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _pq_docs(src / "b1.parquet", ["a", "b", "b"], 1000)
    drain()
    # batch-internal dup collapsed, both keys fresh + committed
    assert got[-1][1] == ["a", "b"]
    assert store.count() == 2

    _pq_docs(src / "b2.parquet", ["b", "c"], 2000)
    drain()
    # 'b' is a store member now -> only 'c' reaches downstream
    assert got[-1][1] == ["c"]
    assert store.count() == 3

    # replay simulation: foreachBatch re-runs the LAST batch id after
    # the key commit — the probe finds nothing fresh and the WHOLE
    # batch is skipped: on_fresh must NOT run (an overwrite-by-batch-id
    # downstream sink would erase that batch's earlier output if handed
    # an empty frame for the same batch id — round-4 advice), and no
    # duplicate snapshot is committed
    snap_before = store.catalog.current()["snapshot_id"]
    last_bid = got[-1][0]
    n_calls = len(got)
    fn(spark.createDataFrame([("b",), ("c",)], "key string"), last_bid)
    assert len(got) == n_calls  # downstream write never invoked
    assert store.catalog.current()["snapshot_id"] == snap_before
    assert store.count() == 3

    # checkpoint reset: a NEW query over the same durable store restarts
    # batch ids at 0 — a genuinely-new key must still commit (the guard
    # is the store's contents, not a global batch counter)
    fn(spark.createDataFrame([("c",), ("d",)], "key string"), 0)
    assert got[-1][1] == ["d"]
    assert store.count() == 4
