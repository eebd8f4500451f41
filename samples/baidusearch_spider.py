"""Sample spider: the reference baidusearch rule re-expressed
Spark-first (`sample/static_rules/baidusearch/baidusearch.go`).

The reference flow:

* Root (baidusearch.go:24-29): one seed per keyin —
  ``https://www.baidu.com/s?wd=<QueryEscape(keyin)>&pn=0``.
* "搜索结果" (baidusearch.go:32-66): ``Find("div.result,div.result-op")``
  result blocks → title / href / abstract per block, the
  ``if title == "" || href == "" { return }`` skip guard, then the
  next-page link ``Find("a.n").Last()`` AddQueued back into the SAME
  rule when present.

Spark-first mapping (every piece is declarative — no imperative
ParseFunc):

* keyin fan-out + QueryEscape — ``seed(keyin="<a><b>")`` clones the
  spider per token and the ``%keyin_esc%`` URL token percent-encodes
  it (Go's ``url.QueryEscape``: space → '+').
* result blocks — ``kind="css"`` ExtractRule over the comma selector
  group ``div.result,div.result-op`` with per-field projections and
  ``("trim",)`` transforms (strings.TrimSpace).
* the skip guard — ``require_fields=("标题", "链接")``: an item with an
  empty required field vanishes (no output row).
* the next-page chain — a SECOND ExtractRule on the same rule name:
  page-level ``body`` container, ``a.n@last@href`` projection,
  ``link_fields`` enqueue, ``require_fields`` expressing the
  ``nextHref != ""`` branch, and ``emit=False`` (the probe Outputs
  nothing — per-ExtractRule emit lets it share the rule name with the
  emitting result rule). Every page's next link fans the walk forward;
  a trailing page's "last a.n" is its PREV link, which history dedup
  collapses exactly like the reference's duplicate-URL filter.

Run: ``python samples/baidusearch_spider.py /tmp/baidu-run``
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
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "baidu.test"
KEYINS = ("spark 引擎", "数据湖")
PAGES = (0, 10, 20)  # pn= offsets, 3 result pages per keyin

BAIDU_SPIDER = SpiderSpec(
    "baidusearch",
    link_rules=(LinkRule("/s?", "搜索结果", priority=0),),
    item_rules=(),
    follow_anchors=False,  # the reference enqueues explicitly
    extract_rules=(
        # baidusearch.go:40-56: one item per result block; TrimSpace on
        # the texts; skip when title or href is empty
        ExtractRule(
            rule="搜索结果",
            kind="css",
            item_pattern="div.result,div.result-op",
            fields=("标题", "链接", "摘要"),
            field_css=(
                ("标题", "h3.t a@text"),
                ("链接", "h3.t a@href"),
                ("摘要", "[data-module=abstract]@text"),
            ),
            field_transforms=(
                ("标题", (("trim",),)),
                ("摘要", (("trim",),)),
            ),
            require_fields=("标题", "链接"),
        ),
        # baidusearch.go:58-65: nextHref := Find("a.n").Last(); enqueue
        # when non-empty — page-level probe, emits no item rows
        ExtractRule(
            rule="搜索结果",
            kind="css",
            item_pattern="body",
            fields=("next",),
            field_css=(("next", "a.n@last@href"),),
            link_fields=("next",),
            require_fields=("next",),
            emit=False,
        ),
    ),
)


def _page_url(keyin: str, pn: int) -> str:
    return canonicalize_url(
        f"http://{HOST}/s?wd={quote_plus(keyin)}&pn={pn}"
    )


def _result(kind: str, title: str, href: str, abstract: str | None) -> str:
    a = f'<a href="{href}">{title}</a>' if href else f"<a>{title}</a>"
    abs_div = (
        f'<div data-module="abstract"> {abstract} </div>'
        if abstract is not None
        else ""
    )
    return f'<div class="{kind}"><h3 class="t">{a}</h3>{abs_div}</div>'


def _page_body(keyin: str, pn: int) -> bytes:
    i = pn // 10
    blocks = []
    # two valid results (one plain, one result-op without abstract)
    blocks.append(
        _result("result", f" {keyin}结果{i}a ", f"http://site{i}.test/a",
                f"摘要 {keyin} {i}a")
    )
    if pn < 20:
        blocks.append(
            _result("result-op", f"{keyin}结果{i}b",
                    f"http://site{i}.test/b", None)
        )
        # decoys the require_fields guard must drop: empty title / no href
        blocks.append(_result("result", "", f"http://site{i}.test/skip", "x"))
        blocks.append(_result("result", f"{keyin}无链接", "", "y"))
    nav = []
    if pn > 0:
        nav.append(f'<a class="n" href="/s?wd={quote_plus(keyin)}&pn={pn - 10}">上一页</a>')
    if pn < PAGES[-1]:
        nav.append(f'<a class="n" href="/s?wd={quote_plus(keyin)}&pn={pn + 10}">下一页</a>')
    html = (
        "<html><body>" + "".join(blocks) + "".join(nav) + "</body></html>"
    )
    return html.encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _page_url(k, pn),
            "host": HOST,
            "depth": pn // 10,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _page_body(k, pn),
            "out_links": [],
            "image_refs": [],
        }
        for k in KEYINS
        for pn in PAGES
    ]
    seeds = [
        {
            "spider": "baidusearch",
            "url": f"http://{HOST}/s?wd=%keyin_esc%&pn=0",
            "rule": "搜索结果",
            "priority": 0,
            "keyin": "<" + "><".join(KEYINS) + ">",
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
            "baidu-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), BAIDU_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.spider, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/baidu-run")
