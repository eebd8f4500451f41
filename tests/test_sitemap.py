"""Sitemap ingestion: <loc> extraction (JVM regexp), sitemapindex
expansion through a fetcher, and distributed frontier seeding via
CrawlEngine.seed_urls_df (robots + history dedup apply like any push).
The parse kernel is also oracle-gated (`q_sitemap_parse`)."""

import shutil
import tempfile

from pholcus_spark.sitemap import (
    fetch_sitemap_urls,
    robots_sitemap_urls,
    sitemap_locs,
)

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://h.test/p/0</loc><lastmod>2016-01-01</lastmod></url>
  <url><loc>
     http://h.test/p/1?a=1&amp;b=2
  </loc></url>
  <url><loc>http://h.test/&lt;odd&gt;/&apos;q&quot;</loc></url>
</urlset>"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h.test/sm/a.xml</loc></sitemap>
  <sitemap><loc>http://h.test/sm/b.xml</loc></sitemap>
</sitemapindex>"""


def test_sitemap_locs_extract_and_unescape(spark):
    pages = spark.createDataFrame(
        [("http://h.test/sitemap.xml", URLSET),
         ("http://h.test/sitemap_index.xml", INDEX)],
        "url string, body binary",
    )
    rows = sitemap_locs(pages).collect()
    by_parent = {}
    for r in rows:
        by_parent.setdefault(r.sitemap_url, []).append(r)
    us = sorted(by_parent["http://h.test/sitemap.xml"], key=lambda r: r.ord)
    assert [r.loc for r in us] == [
        "http://h.test/p/0",
        "http://h.test/p/1?a=1&b=2",        # entity + whitespace trim
        "http://h.test/<odd>/'q\"",          # all five XML entities
    ]
    assert all(not r.is_index for r in us)
    ix = sorted(
        by_parent["http://h.test/sitemap_index.xml"], key=lambda r: r.ord
    )
    assert [r.loc for r in ix] == [
        "http://h.test/sm/a.xml", "http://h.test/sm/b.xml"
    ]
    assert all(r.is_index for r in ix)


def test_robots_sitemap_urls_global():
    text = (
        "User-agent: x\nDisallow: /a\n"
        "Sitemap: http://h.test/sm1.xml\n"
        "User-agent: *\nDisallow:\n"
        "sitemap: http://h.test/sm2.xml  # comment\n"
    )
    assert robots_sitemap_urls(text) == [
        "http://h.test/sm1.xml", "http://h.test/sm2.xml"
    ]


def _xml_pages(spark):
    a = (
        b"<urlset><url><loc>http://h000.test/p/0</loc></url>"
        b"<url><loc>http://h000.test/p/1</loc></url></urlset>"
    )
    b = (
        b"<urlset><url><loc>http://h000.test/p/2</loc></url>"
        b"<url><loc>http://h000.test/d/0/0</loc></url></urlset>"
    )
    return spark.createDataFrame(
        [
            ("http://h000.test/sitemap_index.xml", 200, False,
             "application/xml", INDEX.replace(b"h.test", b"h000.test")),
            ("http://h000.test/sm/a.xml", 200, False, "application/xml", a),
            ("http://h000.test/sm/b.xml", 200, False, "application/xml", b),
        ],
        "url string, status int, flaky boolean, content_type string, "
        "body binary",
    )


def test_fetch_sitemap_urls_expands_index(spark):
    from pholcus_spark.fetch import FixtureFetcher

    seeds = spark.createDataFrame(
        [("http://h000.test/sitemap_index.xml",)], "raw_url string"
    )
    out = fetch_sitemap_urls(
        spark, FixtureFetcher(_xml_pages(spark)), seeds
    )
    urls = [r.raw_url for r in out.orderBy("_ord").collect()]
    assert set(urls) == {
        "http://h000.test/p/0", "http://h000.test/p/1",
        "http://h000.test/p/2", "http://h000.test/d/0/0",
    }
    # document order preserved within each sitemap
    assert urls.index("http://h000.test/p/0") < urls.index(
        "http://h000.test/p/1"
    )
    assert urls.index("http://h000.test/p/2") < urls.index(
        "http://h000.test/d/0/0"
    )


def test_seed_urls_df_sitemap_crawl(spark):
    """End-to-end: sitemap locs → seed_urls_df → full crawl. Robots
    disallow applies to sitemap seeds exactly like any push; re-seeding
    the same sitemap into the finished catalog is a deduped no-op."""
    from pholcus_spark import fixtures
    from pholcus_spark.catalog import SnapshotCatalog
    from pholcus_spark.engine import CrawlEngine, EngineConfig
    from pholcus_spark.fetch import FixtureFetcher
    from pholcus_spark.spiderspec import SpiderSpec

    corpus = fixtures.generate(
        fixtures.SiteSpec(
            n_hosts=1, list_pages=5,
            robots_disallow={"h000.test": ["/p/4"]},
            flaky_rate=0.0, fail_404_rate=0.0, gbk_rate=0.0,
        )
    )
    pages, *_r, robots = fixtures.to_spark(spark, corpus)
    # a sitemap listing every list page (incl. the disallowed /p/4)
    sm_urls = spark.createDataFrame(
        [(f"http://h000.test/p/{j}", j) for j in range(5)],
        "raw_url string, _ord long",
    )
    workdir = tempfile.mkdtemp(prefix="pholcus-sitemap-")
    try:
        cat = SnapshotCatalog(workdir, spark)
        eng = CrawlEngine(
            spark, cat, FixtureFetcher(pages), SpiderSpec("site"), robots,
            EngineConfig(wave_window_ms=6000, record_order=True),
        )
        eng.seed_urls_df(sm_urls, rule="list", spider="site")
        state = eng.run()
        assert state["stopped"]
        seen_urls = {r.url for r in cat.read("order").collect()}
        assert "http://h000.test/p/0" in seen_urls
        assert "http://h000.test/p/4" not in seen_urls  # robots held
        assert state["totals"]["fetched"] > 4  # children crawled too
        # idempotent re-seed: everything already in url_seen
        eng.seed_urls_df(sm_urls, rule="list", spider="site")
        s2 = eng.catalog.state()
        assert s2["queued_count"] == 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
