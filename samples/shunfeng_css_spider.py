"""Sample spider: the reference's shunfenghaitao rule ported with
chained indexed CSS projections (`sample/static_rules/shunfenghaitao/
shunfenghaitao.go`) — the `.Eq(n)` / `.First()` / `.Last()` authoring
surface (53 `.Eq(` + 5 `.Last(` uses across the reference rules).

Reference flow:

* Root → ``http://www.sfht.com`` rule "获取版块URL"
  (shunfenghaitao.go:43-45)
* "获取版块URL" (:49-64): ``query.Find(".nav-c1").First().Find("li a")``
  — every nav entry EXCEPT the first (``i == 0`` skipped) is enqueued
  as a "商品列表" section page.
* "商品列表" (:67-80): ``.cms-src-item`` cards' ``a href`` → "商品详情".
* "商品详情" (:82-117): chained indexed selections —
  ``query.Find("#titleInfo h1").Text()``,
  ``query.Find(".goods-c2 ul").Eq(0).Find("li").Eq(2).Text()`` (brand),
  ``query.Find("#detailattributes li").Eq(0/1).Text()`` (origins).

Maps onto the DSL as:

* nav selection: ``field_css`` chains ``".nav-c1@eq(0) li a@eq(1)@href"``
  / ``...@eq(2)@href`` + ``link_fields`` — `.First()` is ``@eq(0)`` on
  the nav container, the ``i == 0`` skip starts the link chain at
  ``@eq(1)`` (the first entry is the home self-link, exactly why the
  reference skips it).
* detail fields: the SAME chains as the Go code —
  ``".goods-c2 ul@eq(0) li@eq(2)@text"`` etc.
* deviations (documented): the reference strips the "品 牌" label with a
  post-regex and carries 类别 via request Temp; the DSL keeps the label
  (sink-side concern) and reads 类别 from the detail page's breadcrumb
  (``".crumbs a@last@text"`` — `.Last()` surface) instead of a Temp
  carry.

Run: ``python samples/shunfeng_css_spider.py /tmp/sfht-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "sfht.test"
SECTIONS = ("奶粉", "辅食")

SFHT_SPIDER = SpiderSpec(
    "顺丰海淘",
    link_rules=(
        LinkRule("/section/", "商品列表", priority=1),
        LinkRule("/item/", "商品详情", priority=0),
    ),
    item_rules=(),  # items come from the css ExtractRules
    image_rule="下载文件",  # unused — no file downloads in this rule
    extract_rules=(
        # "获取版块URL": .nav-c1 First() li a, skipping entry 0
        ExtractRule(
            rule="获取版块URL",
            kind="css",
            item_pattern="body",
            fields=("s1", "s2"),
            field_css=(
                ("s1", ".nav-c1@eq(0) li a@eq(1)@href"),
                ("s2", ".nav-c1@eq(0) li a@eq(2)@href"),
            ),
            link_fields=("s1", "s2"),
        ),
        # "商品详情": the chained Eq selections of shunfenghaitao.go:95-106
        ExtractRule(
            rule="商品详情",
            kind="css",
            item_pattern="body",
            fields=("标题", "品牌", "原产地", "货源地", "类别"),
            field_css=(
                ("标题", "#titleInfo h1@text"),
                ("品牌", ".goods-c2 ul@eq(0) li@eq(2)@text"),
                ("原产地", "#detailattributes li@eq(0)@text"),
                ("货源地", "#detailattributes li@eq(1)@text"),
                ("类别", ".crumbs a@last@text"),
            ),
        ),
    ),
)


def _home_body() -> tuple[bytes, list[str]]:
    nav = "".join(
        f'<li><a href="http://{HOST}/section/{i}">{name}</a></li>'
        for i, name in enumerate([ "首页", *SECTIONS])
    ).replace(f'href="http://{HOST}/section/0"', f'href="http://{HOST}/"')
    body = (
        '<html><head><meta charset="utf-8"></head><body>'
        f'<div class="nav-c1"><ul>{nav}</ul></div>'
        # a second .nav-c1 the reference's .First() must ignore: its
        # entries route nowhere (no LinkRule matches /about)
        f'<div class="nav-c1"><ul><li><a href="http://{HOST}/about">关于</a>'
        "</li></ul></div>"
        "</body></html>"
    ).encode()
    out_links = [
        f"http://{HOST}/",
        f"http://{HOST}/section/1",
        f"http://{HOST}/section/2",
        f"http://{HOST}/about",
    ]
    return body, out_links


def _section_body(sec: int, n_items: int) -> tuple[bytes, list[str]]:
    cards = "".join(
        f'<div class="cms-src-item"><a href="http://{HOST}/item/{sec}-{j}">'
        f"商品 {sec}-{j}</a></div>"
        for j in range(n_items)
    )
    body = (
        '<html><head><meta charset="utf-8"></head><body>'
        f"{cards}</body></html>"
    ).encode()
    return body, [f"http://{HOST}/item/{sec}-{j}" for j in range(n_items)]


def _detail_body(sec: int, j: int) -> bytes:
    name = SECTIONS[sec - 1]
    return (
        '<html><head><meta charset="utf-8"></head><body>'
        f'<div class="crumbs"><a>首页</a><a>{name}</a></div>'
        f'<div id="titleInfo"><h1>商品 {sec}-{j}</h1></div>'
        f'<div class="goods-c2"><ul><li>产地 美国</li><li>规格 900g</li>'
        f"<li>品 牌 Brand{j}</li></ul><ul><li>促销</li></ul></div>"
        f'<div id="detailattributes"><ul><li>原产地：美国</li>'
        f"<li>货源地：香港</li></ul></div>"
        "</body></html>"
    ).encode()


def build_corpus(n_items: int = 4) -> fixtures.Corpus:
    pages = []
    home_body, home_links = _home_body()
    pages.append(
        {
            "url": f"http://{HOST}/",
            "host": HOST,
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": home_body,
            "out_links": home_links,
            "image_refs": [],
        }
    )
    for sec in (1, 2):
        body, links = _section_body(sec, n_items)
        pages.append(
            {
                "url": f"http://{HOST}/section/{sec}",
                "host": HOST,
                "depth": 1,
                "status": 200,
                "flaky": False,
                "content_type": "text/html; charset=utf-8",
                "body": body,
                "out_links": links,
                "image_refs": [],
            }
        )
        for j in range(n_items):
            pages.append(
                {
                    "url": f"http://{HOST}/item/{sec}-{j}",
                    "host": HOST,
                    "depth": 2,
                    "status": 200,
                    "flaky": False,
                    "content_type": "text/html; charset=utf-8",
                    "body": _detail_body(sec, j),
                    "out_links": [],
                    "image_refs": [],
                }
            )
    seeds = [
        {"spider": "顺丰海淘", "url": f"http://{HOST}/", "rule": "获取版块URL",
         "priority": 2}
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None, n_items: int = 4):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("sfht-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(n_items)
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), SFHT_SPIDER, robots,
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
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfht-run")
