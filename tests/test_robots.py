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
