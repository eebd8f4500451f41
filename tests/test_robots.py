"""robots.txt parsing -> engine robots dim (north-rule extension; the
engine-side ENFORCEMENT of the dim is pinned separately by
test_robots_disallow_conformance)."""

from pholcus_spark.robots import parse_robots, robots_dim_from_pages

SIMPLE = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 1.5
"""

GROUPED = """
User-agent: googlebot
Disallow: /nogoogle/

User-agent: pholcus
User-agent: otherbot
Disallow: /nop/
Crawl-delay: 2

User-agent: *
Disallow: /all/
"""

EMPTY_DISALLOW = """
User-agent: *
Disallow:
"""


def test_parse_robots_wildcard_group():
    r = parse_robots(SIMPLE, "pholcus")
    assert r["disallow_prefixes"] == ["/private/", "/tmp/"]
    assert r["crawl_delay_ms"] == 1500


def test_parse_robots_longest_agent_match_and_shared_groups():
    r = parse_robots(GROUPED, "pholcus/1.0")
    assert r["disallow_prefixes"] == ["/nop/"]
    assert r["crawl_delay_ms"] == 2000
    other = parse_robots(GROUPED, "otherbot")
    assert other["disallow_prefixes"] == ["/nop/"]
    google = parse_robots(GROUPED, "googlebot-image")
    assert google["disallow_prefixes"] == ["/nogoogle/"]
    stranger = parse_robots(GROUPED, "unknown")
    assert stranger["disallow_prefixes"] == ["/all/"]


def test_parse_robots_empty_disallow_allows_all():
    r = parse_robots(EMPTY_DISALLOW, "pholcus")
    assert r["disallow_prefixes"] == []
    assert r["crawl_delay_ms"] is None
    assert parse_robots("", "pholcus") == {
        "disallow_prefixes": [], "crawl_delay_ms": None
    }


def test_robots_dim_from_pages_schema_matches_engine(spark):
    pages = spark.createDataFrame(
        [
            ("h000.test", SIMPLE.encode()),
            ("h001.test", GROUPED.encode()),
            ("h002.test", None),
        ],
        "host string, body binary",
    )
    dim = robots_dim_from_pages(pages, agent="pholcus")
    assert dim.columns == ["host", "disallow_prefixes", "crawl_delay_ms"]
    rows = {r.host: r for r in dim.collect()}
    assert rows["h000.test"].disallow_prefixes == ["/private/", "/tmp/"]
    assert rows["h000.test"].crawl_delay_ms == 1500
    assert rows["h001.test"].disallow_prefixes == ["/nop/"]
    assert rows["h002.test"].disallow_prefixes == []
    # the dim drops straight into CrawlEngine(robots=...): same DDL
    from pholcus_spark.engine import CrawlEngine  # noqa: F401  (schema contract)


def test_fetch_robots_dim_scheme_aware(spark):
    """An https-only host must be probed over https (hosts built via
    hosts_from_urls carry the seed's scheme); previously the fetch URL
    hardcoded http:// and such hosts silently got permissive defaults.
    FixtureFetcher's url equi-join stands in for TLS: only the
    https:// robots URL exists."""
    from pholcus_spark.fetch import FixtureFetcher
    from pholcus_spark.robots import fetch_robots_dim, hosts_from_urls

    pages = spark.createDataFrame(
        [
            ("https://secure.test/robots.txt", 200, False, "text/plain",
             b"User-agent: *\nDisallow: /vault/\nCrawl-delay: 1\n"),
            ("http://plain.test/robots.txt", 200, False, "text/plain",
             b"User-agent: *\nDisallow: /old/\n"),
        ],
        "url string, status int, flaky boolean, content_type string, body binary",
    )
    seeds = spark.createDataFrame(
        [
            ("https://secure.test/a",), ("http://plain.test/b",),
            # host under both schemes -> https wins
            ("http://secure.test/c",),
        ],
        "url string",
    )
    hosts = hosts_from_urls(seeds)
    assert {(r.host, r.scheme) for r in hosts.collect()} == {
        ("secure.test", "https"), ("plain.test", "http"),
    }
    dim = fetch_robots_dim(spark, hosts, FixtureFetcher(pages))
    rows = {r.host: r for r in dim.collect()}
    assert rows["secure.test"].disallow_prefixes == ["/vault/"]
    assert rows["secure.test"].crawl_delay_ms == 1000
    assert rows["plain.test"].disallow_prefixes == ["/old/"]
    # plain `host`-only frame (no scheme column) keeps the http default
    dim2 = fetch_robots_dim(
        spark, hosts.select("host"), FixtureFetcher(pages)
    )
    rows2 = {r.host: r for r in dim2.collect()}
    assert rows2["plain.test"].disallow_prefixes == ["/old/"]
    assert rows2["secure.test"].disallow_prefixes == []  # http miss
