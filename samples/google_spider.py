"""Sample spider: the reference googlesearch rule re-expressed
Spark-first (`sample/static_rules/googlesearch/googlesearch.go`).

The reference flow:

* Root (googlesearch.go:58-85): probe a LIST OF MIRROR IPs
  sequentially, take the first that answers, and AddQueue its search
  URL under "total_pages" with ``Temp{"baseUrl": url}``.
* "total_pages" (googlesearch.go:89-124): ``#resultStats`` text →
  strip commas → first digit run → ``ceil(num/10)`` pages, clamped at
  the LIMIT; Aid pages ``&start=10i`` for i in 1..total-1 under
  "search_results"; ctx.Parse the page itself as "search_results".
* "search_results" (googlesearch.go:126-151): per ``#ires .g`` —
  title/href from ``.r > a`` (href TrimLeft ``"/url?q="`` — Go's
  CUTSET TrimLeft), abstract from ``.st``.

Spark-first mapping:

* the sequential mirror race becomes a PARALLEL probe: every mirror
  is seeded; dead mirrors fail (requeue-once, then the permanent
  failure history) while the live one proceeds. Same reachable-mirror
  outcome, no serial waiting — the distributed form of "first OK
  wins" when downstream URLs are deduped by history anyway.
* the count arithmetic — ``replace ","`` → ``regex_find [\\d]+`` →
  ``ceil_div 10`` → ``int_add -1`` (the ``i < total`` loop bound);
  the LIMIT clamp is ``max_pages = LIMIT - 1`` on the same rule;
  ``page_expr=(10, 0)`` emits the ``start=10i`` offsets.
* ctx.Parse("search_results") — the result rule declared twice, once
  with ``out_rule``.

Run: ``python samples/google_spider.py /tmp/google-run``
"""

from __future__ import annotations

import sys
from urllib.parse import quote_plus

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.keys import canonicalize_url
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import (
    ExtractRule,
    LinkRule,
    PaginateRule,
    SpiderSpec,
)

MIRRORS = ("210.242.125.100", "64.233.189.163", "58.123.102.5")
LIVE_MIRROR = MIRRORS[1]
KEYIN = "spark engine"
TOTAL_RESULTS = 47   # ceil(47/10) = 5 pages
LIMIT = 4            # the reference's SetLimit clamp → pages 1..3
RESULTS_PER_PAGE = 2

_RESULT_FIELDS = ("title", "content", "href")
_RESULT_CSS = (
    ("title", ".r > a@text"),
    ("content", ".st@text"),
    ("href", ".r > a@href"),
)
_RESULT_TF = (("href", (("trim_left", "/url?q="),)),)


def _result_rule(rule: str, out_rule: str | None) -> ExtractRule:
    return ExtractRule(
        rule=rule, kind="css", item_pattern="#ires .g",
        fields=_RESULT_FIELDS, field_css=_RESULT_CSS,
        field_transforms=_RESULT_TF, out_rule=out_rule,
    )


GOOGLE_SPIDER = SpiderSpec(
    "googlesearch",
    link_rules=(LinkRule("&start=", "search_results", priority=0),),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # googlesearch.go:102-109: the resultStats count arithmetic
        ExtractRule(
            rule="total_pages",
            kind="css",
            item_pattern="body",
            fields=("pages", "baseUrl"),
            field_css=(("pages", "#resultStats@text"),),
            field_transforms=(
                ("pages", (
                    ("replace", ",", ""),          # regexp `,+` strip
                    ("regex_find", r"[\d]+"),      # first digit run
                    ("ceil_div", 10),              # math.Ceil(num/10)
                    ("int_add", -1),               # loop i < total
                )),
            ),
            require_fields=("pages",),
            temp_fields=("baseUrl",),
            emit=False,
        ),
        _result_rule("total_pages", "search_results"),
        _result_rule("search_results", None),
    ),
    paginate_rules=(
        # googlesearch.go:95-99 AidFunc: urlBase + "&start=" + 10i
        PaginateRule(
            rule="total_pages", count_field="pages",
            url_template="%s&start=%d", base_field="baseUrl",
            target_rule="search_results", start=1,
            max_pages=LIMIT - 1, page_expr=(10, 0),
        ),
    ),
)


def _search_url(ip: str, start: int | None = None) -> str:
    u = (
        f"http://{ip}/search?q={quote_plus(KEYIN)}"
        "&newwindow=1&biw=1600&bih=398"
    )
    if start is not None:
        u += f"&start={start}"
    return canonicalize_url(u)


def _results_html(page: int) -> str:
    gs = []
    for j in range(RESULTS_PER_PAGE):
        n = page * 10 + j
        gs.append(
            '<div class="g"><h3 class="r">'
            f'<a href="/url?q=http://site{n}.test/doc">Result {n}</a></h3>'
            f'<div class="st">Snippet {n} text.</div></div>'
        )
    return f'<div id="ires">{"".join(gs)}</div>'


def _page_body(start: int) -> bytes:
    # only the page-1 probe carries the count div
    stats = (
        f'<div id="resultStats">About {TOTAL_RESULTS} results</div>'
        if start == 0
        else ""
    )
    html = (
        "<html><body>" + stats + _results_html(start // 10)
        + "</body></html>"
    )
    return html.encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _search_url(LIVE_MIRROR), "host": LIVE_MIRROR,
            "depth": 0, "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _page_body(0), "out_links": [], "image_refs": [],
        }
    ] + [
        {
            "url": _search_url(LIVE_MIRROR, 10 * i), "host": LIVE_MIRROR,
            "depth": 1, "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _page_body(10 * i), "out_links": [], "image_refs": [],
        }
        for i in range(1, LIMIT)
    ]
    # dead mirrors simply have NO fixture page → transport failure →
    # requeue once → permanent failure history
    seeds = [
        {
            "spider": "googlesearch",
            "url": _search_url(ip),
            "rule": "total_pages",
            "priority": 0,
            "temp": {"baseUrl": _search_url(ip)},
        }
        for ip in MIRRORS
    ]
    robots = [
        {"host": ip, "disallow_prefixes": [], "crawl_delay_ms": None}
        for ip in MIRRORS
    ]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark(
            "google-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), GOOGLE_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url.rsplit("&", 1)[-1], dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/google-run")
