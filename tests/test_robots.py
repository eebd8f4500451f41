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
        "disallow_prefixes": [], "allow_prefixes": [], "crawl_delay_ms": None
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
    assert dim.columns == [
        "host", "disallow_prefixes", "allow_prefixes", "crawl_delay_ms"
    ]
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


ALLOWED = """
User-agent: *
Disallow: /shop/
Allow: /shop/sale/
Allow: /shop/item
Disallow: /shop/item/secret
Disallow: /
Allow: /public
"""


def test_parse_robots_allow_groups():
    r = parse_robots(ALLOWED, "pholcus")
    assert r["disallow_prefixes"] == ["/shop/", "/shop/item/secret", "/"]
    assert r["allow_prefixes"] == ["/shop/sale/", "/shop/item", "/public"]


def test_disallow_filter_longest_match_wins(spark):
    """RFC 9309 precedence drilled through the broadcast-join filter:
    longest matching prefix wins, Allow wins length ties, no-match
    passes, missing host passes, legacy dims (no allow column) keep
    pure-disallow semantics."""
    from pholcus_spark.robots import disallow_filter

    dim = spark.createDataFrame(
        [("h.test", ["/shop/", "/shop/item/secret", "/"],
          ["/shop/sale/", "/shop/item", "/public"])],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>",
    )
    urls = [
        ("http://h.test/public/x", True),    # allow /public > dis /
        ("http://h.test/anything", False),   # dis / only
        ("http://h.test/shop/x", False),     # dis /shop/ > allow none
        ("http://h.test/shop/sale/x", True), # allow /shop/sale/ longest
        ("http://h.test/shop/item/1", True), # allow /shop/item > /shop/
        ("http://h.test/shop/item/secret/1", False),  # dis longest
        ("http://other.test/anything", True),  # host not in dim
    ]
    df = spark.createDataFrame(
        [(u, "h.test" if "h.test" in u else "other.test") for u, _ in urls],
        "url string, host string",
    )
    kept = {r.url for r in disallow_filter(df, dim, "url").collect()}
    for u, want in urls:
        assert (u in kept) == want, u

    # equal-length Allow vs Disallow -> allow (least restrictive)
    tie = spark.createDataFrame(
        [("h.test", ["/a/"], ["/a/"])],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>",
    )
    df2 = spark.createDataFrame([("http://h.test/a/z", "h.test")],
                                "url string, host string")
    assert disallow_filter(df2, tie, "url").count() == 1

    # legacy 3-col dim: everything under a disallow prefix drops
    legacy = spark.createDataFrame(
        [("h.test", ["/a/"], None)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long",
    )
    assert disallow_filter(df2, legacy, "url").count() == 0
