"""Plan-shape guards: the physical plans the 100 TB story depends on.
Regressions here (a filter no longer reaching the parquet scan, a
column-pruned scan going wide, a broadcast join degrading to shuffle)
change no results at test scale but break the engine at target scale —
so they are pinned explicitly."""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plans(df):
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.optimizedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark):
    df = entry_mod.queries()["q1_pricing_summary"](spark, SF_DIR)
    phys, _ = _plans(df)
    # the shipdate filter reaches the parquet scan
    assert "PushedFilters: [" in phys and "l_shipdate" in phys.split(
        "PushedFilters"
    )[1][:200]
    # the scan reads only needed columns, not the 16-column lineitem row
    read_schema = phys.split("ReadSchema")[1][:400]
    assert "l_extendedprice" in read_schema
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_q3_broadcasts_customer_dim(spark):
    df = entry_mod.queries()["q3_shipping_priority"](spark, SF_DIR)
    phys, _ = _plans(df)
    assert "BroadcastHashJoin" in phys  # small dim never shuffles big side


def test_dedup_anti_join_pushdown(spark):
    df = entry_mod.queries()["q_dedup_anti_join"](spark, SF_DIR)
    phys, _ = _plans(df)
    assert "PushedFilters: [" in phys
    assert "CartesianProduct" not in phys


def test_entry_flagship_no_cartesian(spark):
    df = entry_mod.entry(spark)
    phys, _ = _plans(df)
    assert "CartesianProduct" not in phys


def test_two_phase_rank_matches_global_window(spark):
    """two_phase_rank (the seed-merge / requeue / push rank) assigns the
    exact ranks of a global row_number WITHOUT funnelling the data
    through one task: the only full-data exchange is rangepartitioning;
    the SinglePartition window runs over <= `partitions` offset rows."""
    from pyspark.sql import functions as F

    from pholcus_spark.engine import two_phase_rank

    df = (
        spark.range(0, 5000)
        .select((F.col("id") * 7919 % 5000).alias("seq"))
        .persist()
    )
    ranked = two_phase_rank(df, [F.asc("seq")], 8, "_rn")
    phys, _ = _plans(ranked)
    # the window over the DATA is partitioned by _pid (local rank) —
    # the range exchange itself is behind the localCheckpoint scan; the
    # only unpartitioned window runs over the <=8-row offsets frame
    assert "windowspecdefinition(_pid" in phys
    rows = ranked.select("seq", "_rn").collect()
    assert sorted((r.seq, r._rn) for r in rows) == [
        (i, i + 1) for i in range(5000)
    ]
    df.unpersist()


def test_default_wave_plan_has_no_unpartitioned_window(spark, tmp_path):
    """Round-3 verdict item: `record_order` defaulted True, so every
    superstep of a defaults-taking production run paid a SinglePartition
    exchange for the test-only golden-order window. The default is now
    False — the wave-select plan must contain only host/spider
    partitioned windows; the single-partition shape appears only behind
    the explicit record_order opt-in."""
    from pyspark.sql import functions as F

    from pholcus_spark.catalog import SnapshotCatalog
    from pholcus_spark.engine import CrawlEngine, EngineConfig
    from pholcus_spark.fetch import FixtureFetcher
    from pholcus_spark.spiderspec import SpiderSpec

    assert EngineConfig().record_order is False

    pages = spark.createDataFrame(
        [], "url string, status int, flaky boolean, content_type string, body binary"
    )
    robots = spark.createDataFrame(
        [("h0.test", [], 100)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long",
    )
    queued = spark.createDataFrame(
        [
            (f"http://h{i % 4}.test/p/{i}", f"h{i % 4}.test", "list", "site",
             "", 0, i, False, {}, "queued", "GET", "")
            for i in range(64)
        ],
        "url string, host string, rule string, spider string, keyin string, "
        "priority int, seq long, reloadable boolean, temp map<string,string>, "
        "state string, method string, post_data string",
    )

    def wave_phys(cfg):
        eng = CrawlEngine(
            spark, SnapshotCatalog(str(tmp_path / "wp"), spark),
            FixtureFetcher(pages), SpiderSpec("site"), robots, cfg,
        )
        wave, _rest = eng._wave_plan(queued)
        return _plans(wave)[0]

    phys = wave_phys(EngineConfig(per_spider_quota=8))
    assert "SinglePartition" not in phys
    assert "windowspecdefinition(host" in phys
    # the opt-in still produces the golden-order window (test instrument)
    assert "SinglePartition" in wave_phys(
        EngineConfig(per_spider_quota=8, record_order=True)
    )


def test_seed_range_frontier_is_multi_partition(spark, tmp_path):
    """The seed_range -> merge path commits a frontier spread over the
    configured partitions (round-2 verdict item 3: the old global
    Window.orderBy rank funnelled every seed through one task)."""
    from pholcus_spark.catalog import SnapshotCatalog
    from pholcus_spark.engine import CrawlEngine, EngineConfig
    from pholcus_spark.fetch import FixtureFetcher
    from pholcus_spark.spiderspec import SpiderSpec

    pages = spark.createDataFrame(
        [], "url string, status int, flaky boolean, content_type string, body binary"
    )
    robots = spark.createDataFrame(
        [], "host string, disallow_prefixes array<string>, crawl_delay_ms long"
    )
    cat = SnapshotCatalog(str(tmp_path / "seedrange"), spark)
    eng = CrawlEngine(
        spark, cat, FixtureFetcher(pages), SpiderSpec("site"), robots,
        EngineConfig(frontier_partitions=8),
    )
    eng.seed_range("http://h000.test/p/%d", 0, 2000, "list", "site")
    frontier = cat.read("frontier")
    assert frontier.count() == 2000
    lo = frontier.orderBy("seq").limit(3).collect()
    assert [r.url for r in lo] == [
        f"http://h000.test/p/{i}" for i in range(3)
    ]
