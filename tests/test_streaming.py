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
