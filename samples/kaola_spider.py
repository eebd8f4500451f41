"""Sample spider: the reference kaola rule re-expressed Spark-first
(`sample/static_rules/kaola/kaola.go`).

The reference flow:

* Root (kaola.go:40-41): seed the home page under "获取版块URL".
* "获取版块URL" (kaola.go:45-57): ``Find("#funcTab li a")`` — the Each
  loop SKIPS i==0 (the "home" tab), then AddQueues each section href
  with ``Temp{"goodsType": s.Text()}``.
* "商品列表" (kaola.go:60-73): every ``.proinfo`` block's first anchor
  href AddQueued as a detail request, RE-CARRYING the inherited
  goodsType temp (``Temp{"goodsType": ctx.GetTemp("goodsType")}``).
* "商品详情" (kaola.go:75-113): title/price via selectors, brand and
  origin via ``.goods_parameter li`` Eq(0)/Eq(1), comment count, and
  类别 = ``ctx.GetTemp("goodsType")``.

Spark-first mapping:

* the i==0 skip — ``item_slice=(1,)`` (Each-loop ordinal gate over the
  raw matches).
* the two-hop goodsType chain — producer ``carry_fields`` on the tab
  rule, ``temp_fields`` + ``carry_fields`` re-carry on the list rule
  (the multi-hop GetTemp→Temp relay), consumer ``temp_fields`` with
  the ``(src, dst)``-style rename landing it as the 类别 column.

Run: ``python samples/kaola_spider.py /tmp/kaola-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.keys import canonicalize_url
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "www.kaola.test"
SECTIONS = ("母婴", "美容", "家居")  # after the skipped home tab
GOODS_PER_SECTION = 2

KAOLA_SPIDER = SpiderSpec(
    "kaola",
    link_rules=(
        LinkRule("/sec/", "商品列表", priority=0),
        LinkRule("/product/", "商品详情", priority=0),
    ),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # kaola.go:45-57: tab anchors, i==0 skipped, text rides as the
        # child's goodsType temp
        ExtractRule(
            rule="获取版块URL",
            kind="css",
            item_pattern="#funcTab li a",
            fields=("url", "goodsType"),
            field_css=(("url", "@href"), ("goodsType", "@text")),
            item_slice=(1,),
            require_fields=("url",),  # if url := s.Attr("href"); IsSome
            link_fields=("url",),
            carry_fields=("goodsType",),
            emit=False,
        ),
        # kaola.go:60-73: .proinfo first anchor → detail, goodsType
        # re-carried (GetTemp → Temp relay)
        ExtractRule(
            rule="商品列表",
            kind="css",
            item_pattern=".proinfo",
            fields=("url", "goodsType"),
            field_css=(("url", "a@href"),),
            temp_fields=("goodsType",),
            require_fields=("url",),
            link_fields=("url",),
            carry_fields=("goodsType",),
            emit=False,
        ),
        # kaola.go:75-113: the detail extraction; 类别 = GetTemp
        ExtractRule(
            rule="商品详情",
            kind="css",
            item_pattern="body",
            fields=("标题", "价格", "品牌", "采购地", "评论数", "goodsType"),
            field_css=(
                ("标题", ".product-title@text"),
                ("价格", "#js_currentPrice span@text"),
                ("品牌", ".goods_parameter li@eq(0)@text"),
                ("采购地", ".goods_parameter li@eq(1)@text"),
                ("评论数", "#commentCounts@text"),
            ),
            temp_fields=("goodsType",),
        ),
    ),
)


def _home_url() -> str:
    return canonicalize_url(f"http://{HOST}/")


def _section_url(i: int) -> str:
    return canonicalize_url(f"http://{HOST}/sec/{i}")


def _product_url(i: int, j: int) -> str:
    return canonicalize_url(f"http://{HOST}/product/{i}{j}.html")


def _home_body() -> bytes:
    tabs = ['<li><a href="/">首页</a></li>']  # i==0, skipped by Go
    tabs += [
        f'<li><a href="/sec/{i}">{name}</a></li>'
        for i, name in enumerate(SECTIONS)
    ]
    # one tab without href — the IsSome() branch drops it in both
    tabs.append("<li><a>无链接</a></li>")
    html = (
        '<html><body><ul id="funcTab">' + "".join(tabs)
        + "</ul></body></html>"
    )
    return html.encode()


def _section_body(i: int) -> bytes:
    blocks = "".join(
        f'<div class="proinfo"><a href="/product/{i}{j}.html">p</a></div>'
        for j in range(GOODS_PER_SECTION)
    )
    return f"<html><body>{blocks}</body></html>".encode()


def _product_body(i: int, j: int) -> bytes:
    n = i * 10 + j
    html = (
        "<html><body>"
        f'<h1 class="product-title">商品 {n}</h1>'
        f'<div id="js_currentPrice"><span>¥{n * 9}.00</span></div>'
        '<ul class="goods_parameter">'
        f"<li>品牌：品牌{n}</li><li>采购地：德国</li><li>规格：大</li></ul>"
        f'<em id="commentCounts">{n * 3}</em>'
        "</body></html>"
    )
    return html.encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _home_url(), "host": HOST, "depth": 0, "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _home_body(), "out_links": [], "image_refs": [],
        }
    ] + [
        {
            "url": _section_url(i), "host": HOST, "depth": 1,
            "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _section_body(i), "out_links": [], "image_refs": [],
        }
        for i in range(len(SECTIONS))
    ] + [
        {
            "url": _product_url(i, j), "host": HOST, "depth": 2,
            "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _product_body(i, j), "out_links": [], "image_refs": [],
        }
        for i in range(len(SECTIONS))
        for j in range(GOODS_PER_SECTION)
    ]
    seeds = [
        {
            "spider": "kaola",
            "url": _home_url(),
            "rule": "获取版块URL",
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
        spark = build_spark(
            "kaola-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), KAOLA_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/kaola-run")
