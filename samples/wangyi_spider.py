"""Sample spider: the reference wangyi rule re-expressed Spark-first
(`sample/static_rules/wangyi/wangyi.go` — the 网易 news-rank crawl).

The reference flow:

* "排行榜主页" (wangyi.go:49-57): every ``.subNav a`` href →
  "新闻排行榜".
* "新闻排行榜" (wangyi.go:59-104): the rank-map accumulation — per
  ``.tabContents`` tab n, per row (header row i==0 skipped), collect
  the article href and its ``.cBlue`` rank, ACCUMULATING
  ``urls_top[url] += topTit[n] + ":" + top + ","`` across all six
  tabs (one article often ranks in several), then ONE AddQueue per
  distinct URL with ``Temp{"newsType": page title, "top": joined}``.
* "热点新闻" (wangyi.go:106-152): if an ``.ep-pages-all`` link exists
  AddQueue the full-text page (Temp re-carried) and SKIP output; else
  Output title/content/rank/type/release (release =
  ``Split(.ep-time-soure, "来源:")[0]`` trimmed).

Spark-first mapping:

* the topTit[n] label table — one ExtractRule per tab
  (``.tabContents:nth-child(n) tr``) with the label as a constant
  prefix transform on the rank; ``item_slice=(1,)`` skips each tab's
  header row (the per-tab form of the Each i==0 gate).
* the urls_top map — ``SpiderSpec.carry_concat=("top",)``: the
  driver-local Go map becomes a page-local merge at parse time —
  duplicate links on one page concatenate their "top" carries in
  emission (tab) order onto the surviving frontier row.
* the full-text redirect — the require/forbid branch pair: a probe
  rule (``require_fields`` + Temp re-carry via temp_fields→carry) and
  an output rule with ``forbid_fields`` on the same marker.

Run: ``python samples/wangyi_spider.py /tmp/wangyi-run``
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

HOST = "news.163.test"
TOP_TITLES = (
    "1小时前点击排行", "24小时点击排行", "本周点击排行",
    "今日跟帖排行", "本周跟帖排行", "本月跟贴排行",
)
N_BOARDS = 2      # rank-board pages under the hub
ROWS_PER_TAB = 2  # rank rows per tab (after the header row)


def _tab_rule(n: int) -> ExtractRule:
    """One tab of the rank page: the topTit[n] label is a constant
    prefix on the rank carry (wangyi.go:62-69,87)."""
    return ExtractRule(
        rule="新闻排行榜",
        kind="css",
        item_pattern=f".tabContents:nth-child({n + 1}) tr",
        fields=("url", "top", "newsType"),
        field_css=(
            ("url", "a@href"),
            ("top", ".cBlue@text"),
            # page-level lookup mixed into the row rule (wangyi.go:73):
            # ^-anchored = evaluated from the document root
            ("newsType", "^.titleBar h2@text"),
        ),
        field_transforms=(
            ("top", (("prefix", f"{TOP_TITLES[n]}:"), ("suffix", ","))),
        ),
        item_slice=(1,),           # skip the tab's header row
        require_fields=("url",),   # if url.IsSome()
        link_fields=("url",),
        carry_fields=(("top", "排名"), ("newsType", "类别")),
        emit=False,
    )


WANGYI_SPIDER = SpiderSpec(
    "wangyi",
    link_rules=(
        LinkRule("/rank/", "新闻排行榜", priority=0),
        LinkRule("/article/", "热点新闻", priority=0),
    ),
    item_rules=(),
    follow_anchors=False,
    carry_concat=("排名",),  # urls_top[url] += ... (wangyi.go:87)
    extract_rules=(
        # wangyi.go:49-57: hub → rank boards
        ExtractRule(
            rule="排行榜主页",
            kind="css",
            item_pattern=".subNav a",
            fields=("url",),
            field_css=(("url", "@href"),),
            require_fields=("url",),
            link_fields=("url",),
            emit=False,
        ),
    )
    + tuple(_tab_rule(n) for n in range(len(TOP_TITLES)))
    + (
        # wangyi.go:108-118: the full-text redirect probe (CopyTemps
        # re-carry: the temps ride on to the full page)
        ExtractRule(
            rule="热点新闻",
            kind="css",
            item_pattern="body",
            fields=("pageall", "排名", "类别"),
            field_css=(("pageall", ".ep-pages-all@eq(0)@href"),),
            require_fields=("pageall",),
            temp_fields=("排名", "类别"),
            link_fields=("pageall",),
            carry_fields=("排名", "类别"),
            emit=False,
        ),
        # wangyi.go:120-151: the output branch (suppressed on paged
        # articles by the same marker)
        ExtractRule(
            rule="热点新闻",
            kind="css",
            item_pattern="body",
            fields=("标题", "内容", "排名", "类别", "ReleaseTime", "pageall"),
            field_css=(
                ("标题", "#h1title@text"),
                ("内容", "#endText@text"),
                ("ReleaseTime", ".ep-time-soure@text"),
                ("pageall", ".ep-pages-all@eq(0)@href"),
            ),
            field_transforms=(
                ("ReleaseTime", (
                    ("split_pick", "来源:", 0),
                    ("trim", " \t\n"),
                )),
            ),
            forbid_fields=("pageall",),
            temp_fields=("排名", "类别"),
        ),
    ),
)


def _hub_url() -> str:
    return canonicalize_url(f"http://{HOST}/hub")


def _board_url(b: int) -> str:
    return canonicalize_url(f"http://{HOST}/rank/{b}.html")


def _article_url(b: int, i: int, full: bool = False) -> str:
    sfx = "-all" if full else ""
    return canonicalize_url(f"http://{HOST}/article/{b}{i}{sfx}.html")


def _hub_body() -> bytes:
    links = "".join(
        f'<a href="/rank/{b}.html">榜单{b}</a>' for b in range(N_BOARDS)
    )
    return (
        f'<html><body><div class="subNav">{links}</div></body></html>'
    ).encode()


def _board_body(b: int) -> bytes:
    # article b0 ranks in EVERY tab (the urls_top accumulation), the
    # others appear once per tab
    tabs = []
    for n in range(len(TOP_TITLES)):
        rows = ['<tr><td>排名</td><td>标题</td></tr>']  # header, skipped
        rows.append(
            f'<tr><td><a href="/article/{b}0.html">热文</a></td>'
            f'<td class="cBlue">{n + 1}</td></tr>'
        )
        rows.append(
            f'<tr><td><a href="/article/{b}{n % ROWS_PER_TAB + 1}.html">'
            f'文{n}</a></td><td class="cBlue">{n + 7}</td></tr>'
        )
        tabs.append(f'<table class="tabContents">{"".join(rows)}</table>')
    html = (
        '<html><body><div class="titleBar"><h2>新闻榜单</h2></div>'
        f'<div class="area">{"".join(tabs)}</div></body></html>'
    )
    return html.encode()


def _article_body(b: int, i: int, paged: bool) -> bytes:
    if paged:
        # the multi-page variant: only the full-text link matters
        return (
            "<html><body><a class=\"ep-pages-all\" "
            f'href="/article/{b}{i}-all.html">全文</a>'
            "<div id=\"endText\">partial</div></body></html>"
        ).encode()
    html = (
        "<html><body>"
        f'<h1 id="h1title">网易标题 {b}-{i}</h1>'
        f'<div id="endText">正文 {b}-{i}。</div>'
        f'<div class="ep-time-soure"> 2016-07-0{i + 1} 来源: 网易</div>'
        "</body></html>"
    )
    return html.encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _hub_url(), "host": HOST, "depth": 0, "status": 200,
            "flaky": False, "content_type": "text/html; charset=utf-8",
            "body": _hub_body(), "out_links": [], "image_refs": [],
        }
    ] + [
        {
            "url": _board_url(b), "host": HOST, "depth": 1, "status": 200,
            "flaky": False, "content_type": "text/html; charset=utf-8",
            "body": _board_body(b), "out_links": [], "image_refs": [],
        }
        for b in range(N_BOARDS)
    ]
    for b in range(N_BOARDS):
        for i in range(ROWS_PER_TAB + 1):
            paged = i == 1  # article b1 is the multi-page variant
            pages.append(
                {
                    "url": _article_url(b, i), "host": HOST, "depth": 2,
                    "status": 200, "flaky": False,
                    "content_type": "text/html; charset=utf-8",
                    "body": _article_body(b, i, paged),
                    "out_links": [], "image_refs": [],
                }
            )
            if paged:
                pages.append(
                    {
                        "url": _article_url(b, i, full=True), "host": HOST,
                        "depth": 3, "status": 200, "flaky": False,
                        "content_type": "text/html; charset=utf-8",
                        "body": _article_body(b, i, paged=False),
                        "out_links": [], "image_refs": [],
                    }
                )
    seeds = [
        {
            "spider": "wangyi",
            "url": _hub_url(),
            "rule": "排行榜主页",
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
            "wangyi-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), WANGYI_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/wangyi-run")
