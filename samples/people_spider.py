"""Sample spider: the reference people rule re-expressed Spark-first
(`sample/static_rules/people/people.go`).

The reference flow:

* Root (people.go:57-63): seed the JSON news index
  (``index.js?cache=false``) under "新闻列表".
* "新闻列表" (people.go:66-96): ``json.Unmarshal`` the body into
  ``{items: [{id,title,url,date,nodeId,imgCount}]}`` and AddQueue each
  item's url under "热点新闻" with ``Temp{id,title,date,newsType}``.
* "热点新闻" (people.go:98-130): content = ``#p_content`` text; the
  other four output columns come straight from Temp.

Spark-first mapping: a ``kind="json"`` ExtractRule over the ``items``
array with ``link_fields`` + renaming ``carry_fields`` (the AddQueue
Temp map), and a consumer rule whose output columns are
``temp_fields``.

Run: ``python samples/people_spider.py /tmp/people-run``
"""

from __future__ import annotations

import json
import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.keys import canonicalize_url
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "news.people.test"
N_NEWS = 5

PEOPLE_SPIDER = SpiderSpec(
    "people",
    link_rules=(LinkRule("/n1/", "热点新闻", priority=0),),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # people.go:66-96: the JSON index → one detail request per item
        # with the four-temp AddQueue map
        ExtractRule(
            rule="新闻列表",
            kind="json",
            item_pattern="items",
            fields=("id", "title", "url", "date", "nodeId"),
            link_fields=("url",),
            carry_fields=(
                ("id", "ID"),
                ("title", "标题"),
                ("date", "ReleaseTime"),
                ("nodeId", "类别"),
            ),
            emit=False,
        ),
        # people.go:98-130: content + the Temp passthrough columns
        ExtractRule(
            rule="热点新闻",
            kind="css",
            item_pattern="body",
            fields=("ID", "标题", "内容", "类别", "ReleaseTime"),
            field_css=(("内容", "#p_content@text"),),
            temp_fields=("ID", "标题", "类别", "ReleaseTime"),
        ),
    ),
)


def _index_url() -> str:
    return canonicalize_url(
        f"http://{HOST}/210801/211150/index.js?cache=false"
    )


def _detail_url(i: int) -> str:
    return canonicalize_url(f"http://{HOST}/n1/2018/{i}.html")


def _index_body() -> bytes:
    items = [
        {
            "id": str(280 + i),
            "title": f"新闻&nbsp;标题 {i}",
            "url": _detail_url(i),
            "date": f"2018-08-{i + 1:02d}",
            "nodeId": "1001" if i % 2 else "1002",
            "imgCount": str(i),
        }
        for i in range(N_NEWS)
    ]
    return json.dumps({"items": items}, ensure_ascii=False).encode()


def _detail_body(i: int) -> bytes:
    html = (
        "<html><body>"
        f'<div id="p_content"><p>人民网正文 {i} 第一段。</p>'
        f"<p>第二段 {i}。</p></div>"
        "</body></html>"
    )
    return html.encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _index_url(), "host": HOST, "depth": 0, "status": 200,
            "flaky": False, "content_type": "application/json",
            "body": _index_body(), "out_links": [], "image_refs": [],
        }
    ] + [
        {
            "url": _detail_url(i), "host": HOST, "depth": 1, "status": 200,
            "flaky": False, "content_type": "text/html; charset=utf-8",
            "body": _detail_body(i), "out_links": [], "image_refs": [],
        }
        for i in range(N_NEWS)
    ]
    seeds = [
        {
            "spider": "people",
            "url": _index_url(),
            "rule": "新闻列表",
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
            "people-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), PEOPLE_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/people-run")
