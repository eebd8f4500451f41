"""Distributed Bloom sidecar: build via applyInPandas → parquet,
cogrouped per-bucket probe. No bitmap bytes on the driver — the
BloomSidecar handle carries only paths and parameters."""

import dataclasses

import numpy as np
import pytest

from pholcus_spark import bloom
from pholcus_spark.keys import key_bucket, request_key


def keys_df(spark, n, prefix="k", num_buckets=16):
    ks = [request_key("sp", "list", f"http://h.test/{prefix}/{i}") for i in range(n)]
    rows = [(k, key_bucket(k, num_buckets)) for k in ks]
    return ks, spark.createDataFrame(rows, "key string, bucket int")


@pytest.fixture(scope="module")
def sidecar_500(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloom"))
    ks, df = keys_df(spark, 500)
    sc = bloom.build_sidecar(df, 16, f"{root}/v000001", fpp=0.01)
    return root, ks, sc


def test_sidecar_handle_holds_no_bitmaps(sidecar_500):
    _, _, sc = sidecar_500
    # the handle is metadata only — every field is a path/param/scalar
    for f in dataclasses.fields(sc):
        v = getattr(sc, f.name)
        assert isinstance(v, (str, int, float, tuple)), f.name


def test_bloom_no_false_negatives(spark, sidecar_500):
    _, ks, sc = sidecar_500
    cand = spark.createDataFrame([(k,) for k in ks], "key string")
    out = bloom.probe(cand, sc, "key").collect()
    assert len(out) == len(ks) and all(r._maybe_seen for r in out)
    # the point-probe helper agrees with the distributed probe
    assert bloom.contains(spark, sc, ks[0])


def test_bloom_low_false_positive_rate(spark, sidecar_500):
    _, _, sc = sidecar_500
    other = [request_key("sp", "list", f"http://h.test/other/{i}") for i in range(2000)]
    cand = spark.createDataFrame([(k,) for k in other], "key string")
    fp = sum(r._maybe_seen for r in bloom.probe(cand, sc, "key").collect())
    assert fp / len(other) < 0.05  # headroom-sized, generous bound


def test_bloom_probe_column(spark, sidecar_500):
    _, ks, sc = sidecar_500
    cand_keys = ks[:50] + [
        request_key("sp", "list", f"http://h.test/unseen/{i}") for i in range(50)
    ]
    cand = spark.createDataFrame([(k,) for k in cand_keys], "key string")
    probed = {r.key: r._maybe_seen for r in bloom.probe(cand, sc, "key").collect()}
    assert len(probed) == 100  # cogroup passes every candidate through
    # no false negatives — every seen key flagged
    assert all(probed[k] for k in ks[:50])
    # most unseen keys pass as definitely-new
    unseen_flagged = sum(probed[k] for k in cand_keys[50:])
    assert unseen_flagged <= 5


def test_bloom_probe_at_64_buckets(spark, tmp_path):
    """The verdict's scale check: build + probe at 64 buckets, fully
    distributed (parquet sidecar, per-bucket cogroup tasks)."""
    ks, df = keys_df(spark, 2000, num_buckets=64)
    sc = bloom.build_sidecar(df, 64, str(tmp_path / "v1"), fpp=0.01)
    n_filter_rows = spark.read.parquet(sc.path).count()
    assert 1 < n_filter_rows <= 64
    cand = spark.createDataFrame([(k,) for k in ks[::10]], "key string")
    out = bloom.probe(cand, sc, "key").collect()
    assert all(r._maybe_seen for r in out)


def test_sidecar_pointer_roundtrip(spark, sidecar_500):
    root, _, sc = sidecar_500
    loaded = bloom.load_sidecar(root)
    assert loaded == sc


def test_positions_deterministic_and_in_range():
    k = request_key("sp", "list", "http://h.test/x")
    p1 = bloom._positions(k, 1024, 7)
    p2 = bloom._positions(k, 1024, 7)
    assert np.array_equal(p1, p2)
    assert ((p1 >= 0) & (p1 < 1024)).all()


def test_seed_merge_probes_sidecar(spark, tmp_path, monkeypatch):
    """Round-3 verdict item 5: one-time paths (seed merge, requeue) now
    dedup through _dedup_vs_history, so a seed() against a
    sidecar-covered url_seen goes through the Bloom probe instead of a
    full-table exact anti-join — at 10^10 seen keys a seed_range re-run
    must not pay a full url_seen scan."""
    from pholcus_spark import fixtures, testkit
    from pholcus_spark.catalog import SnapshotCatalog
    from pholcus_spark.engine import CrawlEngine, EngineConfig
    from pholcus_spark.fetch import FixtureFetcher
    from pholcus_spark.spiderspec import SpiderSpec

    corpus = fixtures.generate(
        fixtures.SiteSpec(
            n_hosts=1, list_pages=3, details_per_list=2,
            images_per_detail=0, flaky_rate=0.0, fail_404_rate=0.0,
        )
    )
    workdir = str(tmp_path / "probe-seed")
    # bloom_rebuild_min=1: the final flush builds a sidecar covering
    # every url_seen dir
    run = testkit.run_engine(
        spark, corpus, SpiderSpec("site"),
        EngineConfig(bloom_enabled=True, bloom_rebuild_min=1),
        workdir=workdir,
    )
    assert run.state["stopped"]
    # url_seen stores keys, not urls — take crawled list-page urls from
    # the corpus (flaky/404 rates are 0, so every page succeeded)
    crawled = sorted(
        p["url"] for p in corpus.pages if "/p/" in p["url"]
    )[:2]

    calls = []
    real_probe = bloom.probe

    def spy(candidates, sidecar, col):
        calls.append(sidecar.path)
        return real_probe(candidates, sidecar, col)

    monkeypatch.setattr(bloom, "probe", spy)
    pages, _i, _t, _s, robots = fixtures.to_spark(spark, corpus)
    eng = CrawlEngine(
        spark, SnapshotCatalog(workdir, spark), FixtureFetcher(pages),
        SpiderSpec("site"), robots,
        EngineConfig(bloom_enabled=True, bloom_rebuild_min=1),
    )
    eng.seed(
        [{"url": u, "rule": "list", "spider": "site"} for u in crawled]
        + [{"url": "http://h000.test/p/999", "rule": "list",
            "spider": "site"}]
    )
    assert calls, "seed merge must route through the Bloom probe"
    frontier = eng.catalog.read("frontier")
    queued = {r.url for r in frontier.where("state = 'queued'").collect()}
    # the already-crawled urls were deduped by the probe path; only the
    # genuinely new seed survives
    assert queued == {"http://h000.test/p/999"}
