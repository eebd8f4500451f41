"""Sample spider: the reference's jiban news rule ported with the
``@html`` (goquery ``.Html()``) projection
(`sample/static_rules/jiban/jiban.go`).

Reference flow:

* "获取列表" (jiban.go:68-81): ``.article-list ul li .xs-100 div h3 a``
  hrefs enqueued as "news" pages (``Each`` + ``AddQueue``) — here the
  engine's anchor extraction + ``LinkRule("/news/")`` routing.
* "news" (jiban.go:83-114): container ``.article-list-wrap`` with
  - ``jo.Find(".articleTitle-name").Text()`` → title
  - ``jo.Find("span.time").Text()`` → time
  - ``jo.Find(".articleContent img")`` srcs → img_url
  - ``jo.Find(".articleContent").Html()`` → content — THE ``.Html()``
    surface (7 uses across the reference rules: jiban.go:104,
    zhihu_daily.go:108, taobaosearch.go:152, zhihu_bianji.go:163,184,
    187, baidunews.go:203)

Maps onto the DSL as ``field_css`` projections with the SAME
selectors; ``content`` is ``".articleContent@html"``.

Documented deviations: the reference concatenates EVERY img src
(comma-joined) — the DSL projects one value per field, so ``img_url``
takes the first (``@eq(0)``); the reference also mutates the DOM
(``Remove()`` on the imgs) before serializing and rewrites ``"``→``'``
sink-side — the DSL keeps extraction pure, so ``content`` here is the
untouched inner HTML in the canonical serialization both matchers
share.

Run: ``python samples/jiban_css_spider.py /tmp/jiban-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "jiban.test"

JIBAN_SPIDER = SpiderSpec(
    "极贝网",
    link_rules=(
        LinkRule("/list/", "获取列表", priority=1),
        LinkRule("/news/", "news", priority=0),
    ),
    item_rules=(),
    image_rule="下载文件",  # unused — no file downloads in this rule
    extract_rules=(
        # "news": jiban.go:83-114 — one item per .article-list-wrap
        ExtractRule(
            rule="news",
            kind="css",
            item_pattern=".article-list-wrap",
            fields=("title", "time", "img_url", "content"),
            field_css=(
                ("title", ".articleTitle-name@text"),
                ("time", "span.time@text"),
                ("img_url", ".articleContent img@eq(0)@src"),
                ("content", ".articleContent@html"),
            ),
        ),
    ),
)


def _list_body(n_news: int) -> tuple[bytes, list[str]]:
    entries = "".join(
        f'<li><div class="xs-100"><div><h3>'
        f'<a href="http://{HOST}/news/{i}">新闻 {i}</a></h3></div></div></li>'
        for i in range(n_news)
    )
    body = (
        '<html><head><meta charset="utf-8"></head><body>'
        f'<div class="article-list"><ul>{entries}</ul></div>'
        "</body></html>"
    ).encode()
    return body, [f"http://{HOST}/news/{i}" for i in range(n_news)]


def _news_body(i: int) -> bytes:
    # rich inner content: nested markup, an entity, and imgs — the
    # parts a .Html() serialization must round-trip
    return (
        '<html><head><meta charset="utf-8"></head><body>'
        '<div class="article-list-wrap">'
        f'<h1 class="articleTitle-name">新闻标题 {i}</h1>'
        f'<span class="time">2016-07-{i + 1:02d}</span>'
        '<div class="articleContent">'
        f"<p>段落一 {i} &amp; 细节</p>"
        f'<img src="http://{HOST}/img/{i}-a.jpg">'
        f"<p>段落二 <b>重点 {i}</b></p>"
        f'<img src="http://{HOST}/img/{i}-b.jpg">'
        "</div></div></body></html>"
    ).encode()


def build_corpus(n_news: int = 3) -> fixtures.Corpus:
    pages = []
    list_body, list_links = _list_body(n_news)
    pages.append(
        {
            "url": f"http://{HOST}/list/1",
            "host": HOST,
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": list_body,
            "out_links": list_links,
            "image_refs": [],
        }
    )
    for i in range(n_news):
        pages.append(
            {
                "url": f"http://{HOST}/news/{i}",
                "host": HOST,
                "depth": 1,
                "status": 200,
                "flaky": False,
                "content_type": "text/html; charset=utf-8",
                "body": _news_body(i),
                "out_links": [],
                "image_refs": [],
            }
        )
    seeds = [
        {"spider": "极贝网", "url": f"http://{HOST}/list/1", "rule": "获取列表",
         "priority": 1}
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None, n_news: int = 3):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("jiban-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(n_news)
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), JIBAN_SPIDER, robots,
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
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jiban-run")
