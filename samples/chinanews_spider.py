"""Sample spider: the reference chinanews rule re-expressed Spark-first
(`sample/static_rules/chinanews/chinanews.go`).

The reference flow:

* Root (chinanews.go:41-46): seed the scroll-news index under
  "滚动新闻".
* "滚动新闻" (chinanews.go:50-66): every ``.pagebox a`` href AddQueued
  under "新闻列表" (the pagination nav — the site-root prefix the Go
  code concatenates is plain absolutization).
* "新闻列表" (chinanews.go:69-99): per ``.content_list li`` — type /
  title / time extracted, and the ``.dd_bt a`` href (protocol-relative
  and site-relative forms both appear; the Go code normalizes
  manually, absolutization covers both) AddQueued under "新闻内容"
  with the three values as Temp.
* "新闻内容" (chinanews.go:101-130): content = ``.left_zw`` text; 来源
  via ``strings.Cut(from, "来源：")`` — everything after the FIRST
  occurrence, ``参与互动`` stripped, trimmed — with the ``else { from
  = "未知" }`` miss fallback; 类别/标题/时间 from Temp.

Spark-first mapping: carry renames land the temps directly under
their output column names; the Cut-with-fallback chain is
``regex_find("来源：(.*)", 1)`` (DOTALL — everything after the first
marker, exactly Cut's after-half) → ``replace`` → ``trim`` →
``default("未知")``.

Fidelity note: when the 来源 marker IS present but cleanup empties the
value, Go keeps "" while ``default`` writes 未知 — the fixture family
keeps sources non-empty, as the real site does.

Run: ``python samples/chinanews_spider.py /tmp/chinanews-run``
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

HOST = "www.chinanews.test"
N_LIST_PAGES = 3
NEWS_PER_PAGE = 2

CHINANEWS_SPIDER = SpiderSpec(
    "chinanews",
    link_rules=(
        LinkRule("/scroll-news/", "新闻列表", priority=0),
        LinkRule("/news-detail/", "新闻内容", priority=1),
    ),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # chinanews.go:50-66: pagination nav → list pages
        ExtractRule(
            rule="滚动新闻",
            kind="css",
            item_pattern=".pagebox a",
            fields=("url",),
            field_css=(("url", "@href"),),
            require_fields=("url",),
            link_fields=("url",),
            emit=False,
        ),
        # chinanews.go:69-99: list rows → detail links + 3-value Temp
        ExtractRule(
            rule="新闻列表",
            kind="css",
            item_pattern=".content_list li",
            fields=("newsType", "newsTitle", "newsTime", "url"),
            field_css=(
                ("newsType", ".dd_lm a@text"),
                ("newsTitle", ".dd_bt a@text"),
                ("newsTime", ".dd_time@text"),
                ("url", ".dd_bt a@href"),
            ),
            require_fields=("url",),  # if url := ...; IsSome
            link_fields=("url",),
            carry_fields=(
                ("newsType", "类别"),
                ("newsTitle", "标题"),
                ("newsTime", "时间"),
            ),
            emit=False,
        ),
        # chinanews.go:101-130: the article extraction
        ExtractRule(
            rule="新闻内容",
            kind="css",
            item_pattern="body",
            fields=("类别", "来源", "标题", "内容", "时间"),
            field_css=(
                ("内容", ".left_zw@text"),
                ("来源", ".left-t@text"),
            ),
            field_transforms=(
                ("来源", (
                    ("regex_find", "来源：(.*)", 1),
                    ("replace", "参与互动", ""),
                    ("trim",),
                    ("default", "未知"),
                )),
            ),
            temp_fields=("类别", "标题", "时间"),
        ),
    ),
)


def _list_url(p: int) -> str:
    return canonicalize_url(f"http://{HOST}/scroll-news/news{p}.html")


def _detail_url(p: int, i: int) -> str:
    return canonicalize_url(f"http://{HOST}/news-detail/{p}-{i}.html")


def _list_body(p: int) -> bytes:
    # the pagebox lists EVERY page including the current one (so the
    # index page itself re-enters under 新闻列表 and its rows parse —
    # under 滚动新闻 only the nav is read, like the reference)
    nav = "".join(
        f'<a href="/scroll-news/news{q}.html">{q}</a>'
        for q in range(1, N_LIST_PAGES + 1)
    )
    rows = []
    for i in range(NEWS_PER_PAGE):
        # alternate protocol-relative and site-relative hrefs — the two
        # forms chinanews.go:83-87 normalizes by hand
        href = (
            f"//{HOST}/news-detail/{p}-{i}.html"
            if i % 2
            else f"/news-detail/{p}-{i}.html"
        )
        rows.append(
            '<li><div class="dd_lm">[<a href="/t">社会</a>]</div>'
            f'<div class="dd_bt"><a href="{href}">标题 {p}-{i}</a></div>'
            f'<div class="dd_time">8-{p}0 1{i}:30</div></li>'
        )
    # a linkless row the IsSome guard drops
    rows.append('<li><div class="dd_bt"><a>无链接</a></div></li>')
    html = (
        f'<html><body><div class="pagebox">{nav}</div>'
        f'<ul class="content_list">{"".join(rows)}</ul></body></html>'
    )
    return html.encode()


def _detail_body(p: int, i: int) -> bytes:
    src = "某社" if i % 2 else "某网"
    left_t = f"2018年08月 来源：{src} 参与互动 "
    html = (
        "<html><body>"
        f'<div class="left-t">{left_t}</div>'
        f'<div class="left_zw"><p>正文 {p}-{i} 第一段。</p>'
        "<p>第二段。</p></div>"
        "</body></html>"
    )
    return html.encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _list_url(p), "host": HOST, "depth": 0, "status": 200,
            "flaky": False, "content_type": "text/html; charset=utf-8",
            "body": _list_body(p), "out_links": [], "image_refs": [],
        }
        for p in range(1, N_LIST_PAGES + 1)
    ] + [
        {
            "url": _detail_url(p, i), "host": HOST, "depth": 1,
            "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _detail_body(p, i), "out_links": [], "image_refs": [],
        }
        for p in range(1, N_LIST_PAGES + 1)
        for i in range(NEWS_PER_PAGE)
    ]
    seeds = [
        {
            "spider": "chinanews",
            "url": _list_url(1),
            "rule": "滚动新闻",
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
            "chinanews-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), CHINANEWS_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/chinanews-run")
