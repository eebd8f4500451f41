"""Sample spider: the reference's miyabaobei category rule ported with
declarative Aid-loop pagination
(`sample/static_rules/miyabaobei/miyabaobei.go`).

The reference flow (miyabaobei.go:82-135):

* "获取列表页面" (miyabaobei.go:82-107): reads the pager,
  ``urls := query.Find(".Lpage.page p a")`` then
  ``totalPage = urls.Eq(urls.Length() - 2).Text()`` (the tail link is
  the ">" arrow, so the page COUNT is the second-to-last link), and
  calls ``ctx.Aid({"loop": [1, total], "rep": {"Rule": "商品列表"}})``
  to enqueue every page, then ``ctx.Parse("商品列表")`` to parse page 1
  itself under the list rule.
* "商品列表" (miyabaobei.go:109-135): one item per product card —
  name + price pulled with Find/Text.

Maps onto the DSL as:

* the pager pull is the field spec ``".Lpage.page p a@eq(-2)@text"``
  (``@eq(-n)`` = goquery ``Eq(-n)``); the rule also records
  ``".Lpage.page p a@count"`` — the ``urls.Length()`` probe the
  reference branches on (miyabaobei.go:88)
* ``PaginateRule`` replaces the imperative Aid loop: the engine expands
  pages ``start..total`` into "商品列表" requests ENTIRELY JVM-side
  (sequence + format_string — no driver loop)
* ``ctx.Parse("商品列表")`` (re-parsing page 1 under the list rule) is
  expressed by registering the product ExtractRule for BOTH rules

Documented deviations: the reference's ``if urls.Last().Text() == ">"``
conditional (fall back to ``urls.Last()`` when there is no arrow tail)
is imperative control flow the declarative DSL does not express — this
port pins the arrow-tail shape, the branch the live site exercises; and
the reference builds the page URL from a ``baseUrl`` temp — here the
template is a literal (``base_field`` covers the temp-carry form).

Run: ``python samples/miya_paginate_spider.py /tmp/miya-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import (
    ExtractRule,
    LinkRule,
    PaginateRule,
    SpiderSpec,
)

HOST = "miya.test"
TOTAL_PAGES = 7
GOODS_PER_PAGE = 3

# one item per product card (miyabaobei.go:109-135 Find/Text pulls)
_GOODS_FIELDS = dict(
    kind="css",
    item_pattern=".goods",
    fields=("name", "price"),
    field_css=(("name", "p.name@text"), ("price", "span.price@text")),
)

MIYA_SPIDER = SpiderSpec(
    "miyabaobei",
    link_rules=(LinkRule("/cat", "商品列表", priority=0),),
    item_rules=(),  # items come from the css ExtractRules
    image_rule="下载文件",  # unused — no file downloads in this rule
    extract_rules=(
        # the pager probe on the FIRST page (miyabaobei.go:86-95):
        # total = second-to-last pager link, n_links = urls.Length()
        ExtractRule(
            rule="获取列表页面",
            kind="css",
            item_pattern="body",
            fields=("total_pages", "n_links"),
            field_css=(
                ("total_pages", ".Lpage.page p a@eq(-2)@text"),
                ("n_links", ".Lpage.page p a@count"),
            ),
        ),
        # ctx.Parse("商品列表") on page 1: the same body ALSO parses
        # under the list extraction
        ExtractRule(rule="获取列表页面", **_GOODS_FIELDS),
        ExtractRule(rule="商品列表", **_GOODS_FIELDS),
    ),
    paginate_rules=(
        # ctx.Aid({"loop": [1, total], "rep": {"Rule": "商品列表"}})
        PaginateRule(
            rule="获取列表页面",
            count_field="total_pages",
            url_template=f"http://{HOST}/cat?page=%d",
            target_rule="商品列表",
            start=2,
            priority=0,
        ),
    ),
)


def _page_body(page_no: int) -> bytes:
    pager = (
        '<div class="Lpage page"><p>'
        + "".join(f"<a>{i}</a>" for i in range(1, TOTAL_PAGES + 1))
        + "<a>&gt;</a></p></div>"
    )
    goods = "".join(
        f'<div class="goods"><p class="name">item {page_no}-{g}</p>'
        f'<span class="price">{page_no * 100 + g}.00</span></div>'
        for g in range(GOODS_PER_PAGE)
    )
    return (
        '<html><head><meta charset="utf-8"></head><body>'
        + pager
        + goods
        + "</body></html>"
    ).encode()


def build_corpus() -> fixtures.Corpus:
    """The category site: page 1 carries the pager that names the page
    count; pages 2..TOTAL_PAGES exist only through pagination (no
    hrefs anywhere — every child request is Aid-generated)."""
    pages = [
        {
            "url": f"http://{HOST}/cat?page={p}",
            "host": HOST,
            "depth": 0 if p == 1 else 1,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _page_body(p),
            "out_links": [],  # pager <a> have no href: children come
            "image_refs": [],  # solely from PaginateRule expansion
        }
        for p in range(1, TOTAL_PAGES + 1)
    ]
    seeds = [
        {
            "spider": "miyabaobei",
            "url": f"http://{HOST}/cat?page=1",
            "rule": "获取列表页面",
            "priority": 0,
        }
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("miya-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), MIYA_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=2),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for t in ("url_seen", "items"):
            df = catalog.read(t)
            print(t, df.count() if df is not None else 0)
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/miya-run")
