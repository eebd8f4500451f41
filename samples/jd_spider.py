"""Sample spider: the reference JD search rule re-expressed Spark-first
(`sample/static_rules/jingdong/jdSpider.go`; `lewa/lewa.go` is a
byte-identical copy of the same spider).

The reference flow:

* Root (jdSpider.go:43-56): seed the keyword's page-1 /Search URL
  under "判断页数".
* "判断页数" (jdSpider.go:60-74): scan EVERY <script> for
  ``page_count:"N"`` (``Find("script").Each`` + two regexes +
  strconv.Atoi), then Aid "生成请求".
* "生成请求" (jdSpider.go:77-97): for i in 1..pageCount-1 enqueue TWO
  URLs per iteration — the odd server-rendered page
  ``/Search?...page=2i-1`` and the even async page
  ``/s_new.php?...page=2i`` — both under "搜索结果".
* "搜索结果" (jdSpider.go:100-145): per ``.gl-item`` — title (tag-strip
  regex + trim), price, comment count, ``"http:" + href``, and the
  ``if title != ""`` skip guard.

Spark-first mapping:

* the script scan — ``script@each()@text`` (goquery multi-selection
  ``.Text()`` over every script) + ``("regex_find",
  'page_count:"(\\d+)"', 1)``; ``("int_add", -1)`` turns the count
  into the loop bound (``i < pageCount``).
* the dual-URL loop — TWO PaginateRules on the same rule with
  ``page_expr=(2,-1)`` and ``(2,0)``: the '%d' receives 2i-1 / 2i
  while i walks 1..count. Page bases ride the seed Temp (the
  keyword-bearing URL prefixes) through ``temp_fields`` →
  ``base_field``.

Run: ``python samples/jd_spider.py /tmp/jd-run``
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
from pholcus_spark.spiderspec import ExtractRule, PaginateRule, SpiderSpec

HOST = "search.jd.test"
KEYIN = "手机"
PAGE_COUNT = 4  # page_count in the page-1 script → pages 1..6 enqueued
ITEMS_PER_PAGE = 2

_Q = quote_plus(KEYIN)
_ODD_BASE = (
    f"http://{HOST}/Search?keyword={_Q}"
    "&enc=utf-8&qrst=1&rt=1&stop=1&vt=2&bs=1&s=1&click=0&page="
)
_EVEN_BASE = (
    f"http://{HOST}/s_new.php?keyword={_Q}"
    "&enc=utf-8&qrst=1&rt=1&stop=1&vt=2&bs=1&s=31&scrolling=y&pos=30&page="
)

JD_SPIDER = SpiderSpec(
    "jd",
    link_rules=(),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # jdSpider.go:60-74: page_count scanned out of ALL script tags
        ExtractRule(
            rule="判断页数",
            kind="css",
            item_pattern="body",
            fields=("pageCount", "base_odd", "base_even"),
            field_css=(("pageCount", "script@each()@text"),),
            field_transforms=(
                ("pageCount", (
                    ("regex_find", r'page_count:"(\d+)"', 1),
                    ("int_add", -1),  # loop runs i < pageCount
                )),
            ),
            temp_fields=("base_odd", "base_even"),
            emit=False,
        ),
        # jdSpider.go:100-145: the result extraction + title guard
        ExtractRule(
            rule="搜索结果",
            kind="css",
            item_pattern=".gl-item",
            fields=("标题", "价格", "评论数", "链接"),
            field_css=(
                ("标题", ".p-name.p-name-type-2 > a@text"),
                ("价格", ".p-price > strong > i@text"),
                ("评论数", ".p-commit > strong > a@text"),
                ("链接", ".p-name.p-name-type-2 > a@href"),
            ),
            field_transforms=(
                # the reference's belt-and-braces tag strip + trim
                ("标题", (
                    ("regex_sub", r"<[\S\s]+?>", " "),
                    ("trim", " \t\n"),
                )),
                ("链接", (("prefix", "http:"),)),
            ),
            require_fields=("标题",),
        ),
    ),
    paginate_rules=(
        # jdSpider.go:84-97: two AddQueues per i in 1..pageCount-1
        PaginateRule(
            rule="判断页数", count_field="pageCount",
            url_template="%s%d", base_field="base_odd",
            target_rule="搜索结果", start=1, page_expr=(2, -1),
        ),
        PaginateRule(
            rule="判断页数", count_field="pageCount",
            url_template="%s%d", base_field="base_even",
            target_rule="搜索结果", start=1, page_expr=(2, 0),
        ),
    ),
)


def _page1_body() -> bytes:
    html = (
        "<html><body><script>var a=1;</script>"
        f'<script>init({{page_count:"{PAGE_COUNT}",other:2}});</script>'
        "</body></html>"
    )
    return html.encode()


def _result_body(page: int) -> bytes:
    items = []
    for j in range(ITEMS_PER_PAGE):
        n = page * 10 + j
        items.append(
            '<li class="gl-item">'
            '<div class="p-name p-name-type-2">'
            f'<a href="//item.jd.test/{n}.html"> <em>商品 {n}</em>\n</a></div>'
            f'<div class="p-price"><strong><i>{n}.90</i></strong></div>'
            f'<div class="p-commit"><strong><a>{n * 5}条</a></strong></div>'
            "</li>"
        )
    # a titleless decoy the require guard must drop
    items.append(
        '<li class="gl-item"><div class="p-name p-name-type-2">'
        '<a href="//item.jd.test/skip.html">  \n </a></div></li>'
    )
    return ("<html><body>" + "".join(items) + "</body></html>").encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": canonicalize_url(_ODD_BASE + "1"), "host": HOST,
            "depth": 0, "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _page1_body(), "out_links": [], "image_refs": [],
        }
    ]
    for i in range(1, PAGE_COUNT):
        for base, page in ((_ODD_BASE, 2 * i - 1), (_EVEN_BASE, 2 * i)):
            if base is _ODD_BASE and page == 1:
                # the odd i=1 expansion re-requests the seed URL (under
                # 搜索结果); its body is the page-1 script page above —
                # one fixture row per URL
                continue
            pages.append(
                {
                    "url": canonicalize_url(f"{base}{page}"),
                    "host": HOST, "depth": 1, "status": 200,
                    "flaky": False,
                    "content_type": "text/html; charset=utf-8",
                    "body": _result_body(page),
                    "out_links": [], "image_refs": [],
                }
            )
    seeds = [
        {
            "spider": "jd",
            "url": _ODD_BASE + "1",
            "rule": "判断页数",
            "priority": 0,
            "temp": {"base_odd": _ODD_BASE, "base_even": _EVEN_BASE},
        }
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("jd-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), JD_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jd-run")
