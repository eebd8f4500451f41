"""Sample spider: the reference's zhihu_daily rule ported 1:1
(`sample/static_rules/zhihu_daily/zhihu_daily.go`).

Reference flow and its DSL mapping:

* Root (zhihu_daily.go:40-63): seeds the explore page with
  ``Temp {"target": "first"}`` plus ``ceil(limit/5)-1`` offset pages
  with ``Temp {"target": "next_page"}``. The Temp value exists ONLY to
  pick the selector inside one shared ParseFunc
  (zhihu_daily.go:69-74) — daily pages scope the feed scan to the
  ``[data-type='daily']`` tab, offset pages scan every feed item. The
  engine realization is two RULE NAMES with the reference's two
  selectors verbatim (routing state that picks code paths belongs in
  the rule, not in carried data):

  - ``获取首页结果_daily`` — ``[data-type='daily']
    .explore-feed.feed-item h2 a`` (attribute-scoped compound class
    chain, zhihu_daily.go:70)
  - ``获取首页结果_next`` — ``.explore-feed.feed-item h2 a``
    (zhihu_daily.go:72)

* Each matched anchor's href is enqueued to the landing rule
  (zhihu_daily.go:76-83 ``Each``+``AddQueue``) → ``link_fields`` on the
  href projection; ``changeToAbspath`` (zhihu_daily.go:124-129) is the
  engine's built-in absolutization of relative hrefs.

* "解析落地页" (zhihu_daily.go:86-117): ItemFields 标题/提问内容/回答内容;
  nested ``Find`` chains flattened to single descendant selectors, and
  ``.First().Html()`` on the answer → ``@eq(0)@html``.

Run: ``python samples/zhihu_css_spider.py /tmp/zhihu-run``
"""

from __future__ import annotations

import math
import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "zhihu.test"

_LANDING_CSS = (
    ("标题",
     ".QuestionHeader .QuestionHeader-content .QuestionHeader-main "
     ".QuestionHeader-title@text"),
    ("提问内容",
     ".QuestionHeader .QuestionHeader-content .QuestionHeader-main "
     ".QuestionHeader-detail span@text"),
    # .First().Html() (zhihu_daily.go:108)
    ("回答内容",
     ".Question-main .AnswerCard .QuestionAnswer-content .ContentItem "
     ".RichContent .RichContent-inner@eq(0)@html"),
)

ZHIHU_SPIDER = SpiderSpec(
    "知乎每日推荐",
    link_rules=(
        LinkRule("/explore", "获取首页结果_daily", priority=1),
        LinkRule("/node/", "获取首页结果_next", priority=1),
        LinkRule("/question/", "解析落地页", priority=0),
    ),
    item_rules=(),
    image_rule="下载文件",  # unused — no file downloads in this rule
    # the reference enqueues ONLY via AddQueue inside the ParseFuncs —
    # with automatic anchor following the weekly-tab decoy questions
    # (outside the [data-type='daily'] scope) would be crawled too
    follow_anchors=False,
    extract_rules=(
        ExtractRule(
            rule="获取首页结果_daily",
            kind="css",
            item_pattern="[data-type='daily'] .explore-feed.feed-item h2 a",
            fields=("href",),
            field_css=(("href", "@href"),),
            link_fields=("href",),  # Each + AddQueue, zhihu_daily.go:76-83
        ),
        ExtractRule(
            rule="获取首页结果_next",
            kind="css",
            item_pattern=".explore-feed.feed-item h2 a",
            fields=("href",),
            field_css=(("href", "@href"),),
            link_fields=("href",),
        ),
        ExtractRule(
            rule="解析落地页",
            kind="css",
            item_pattern=".QuestionPage",
            fields=("标题", "提问内容", "回答内容"),
            field_css=_LANDING_CSS,
        ),
    ),
)


def _feed_items(qids: list[int]) -> str:
    return "".join(
        f'<div class="explore-feed feed-item"><h2>'
        f'<a href="/question/{q}">问题 {q}</a></h2></div>'
        for q in qids
    )


def _explore_body(daily: list[int], weekly: list[int]) -> bytes:
    # the weekly tab is the decoy the [data-type='daily'] scope must
    # skip — the whole reason the reference branches on its Temp
    return (
        '<html><head><meta charset="utf-8"></head><body>'
        f'<div class="explore-tab" data-type="daily">{_feed_items(daily)}</div>'
        f'<div class="explore-tab" data-type="weekly">{_feed_items(weekly)}</div>'
        "</body></html>"
    ).encode()


def _offset_body(qids: list[int]) -> bytes:
    return (
        '<html><head><meta charset="utf-8"></head><body>'
        f"{_feed_items(qids)}</body></html>"
    ).encode()


def _question_body(q: int) -> bytes:
    return (
        '<html><head><meta charset="utf-8"></head><body>'
        '<div class="QuestionPage">'
        '<div class="QuestionHeader"><div class="QuestionHeader-content">'
        '<div class="QuestionHeader-side">side</div>'
        '<div class="QuestionHeader-main">'
        f'<h1 class="QuestionHeader-title">问题标题 {q}</h1>'
        '<div class="QuestionHeader-detail">'
        f"<span>问题描述 {q} &amp; 细节</span></div>"
        "</div></div></div>"
        '<div class="Question-main">'
        '<div class="AnswerCard"><div class="QuestionAnswer-content">'
        '<div class="ContentItem"><div class="RichContent">'
        f'<div class="RichContent-inner"><p>答案一 <b>{q}</b></p></div>'
        "</div></div></div></div>"
        '<div class="AnswerCard"><div class="QuestionAnswer-content">'
        '<div class="ContentItem"><div class="RichContent">'
        f'<div class="RichContent-inner"><p>答案二 {q}</p></div>'
        "</div></div></div></div>"
        "</div></div></body></html>"
    ).encode()


def build_corpus(limit: int = 20) -> fixtures.Corpus:
    """Explore page (3 daily questions + 2 weekly decoys) + the
    limit-driven offset pages (5 questions each, one overlapping the
    daily set so the frontier dedup is exercised)."""
    daily = [1, 2, 3]
    weekly = [91, 92]
    pages = [
        {
            "url": f"http://{HOST}/explore",
            "host": HOST, "depth": 0, "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _explore_body(daily, weekly),
            "out_links": [], "image_refs": [],
        }
    ]
    total_times = math.ceil(limit / 5)
    offset_qids: list[list[int]] = []
    for i in range(1, total_times):
        # question 3 reappears on the first offset page (dedup), the
        # rest are new
        qids = ([3] if i == 1 else []) + [100 * i + k for k in range(4)]
        offset_qids.append(qids)
        pages.append(
            {
                "url": f"http://{HOST}/node/ExploreAnswerListV2"
                       f"?params=%7B%22offset%22%3A{i * 5}%2C%22type%22%3A%22day%22%7D",
                "host": HOST, "depth": 0, "status": 200, "flaky": False,
                "content_type": "text/html; charset=utf-8",
                "body": _offset_body(qids),
                "out_links": [], "image_refs": [],
            }
        )
    all_q = sorted(set(daily) | {q for qs in offset_qids for q in qs})
    for q in all_q:
        pages.append(
            {
                "url": f"http://{HOST}/question/{q}",
                "host": HOST, "depth": 1, "status": 200, "flaky": False,
                "content_type": "text/html; charset=utf-8",
                "body": _question_body(q),
                "out_links": [], "image_refs": [],
            }
        )
    # Root: explore page first, then the offset fan-out
    # (zhihu_daily.go:40-63)
    seeds = [
        {"spider": "知乎每日推荐", "url": f"http://{HOST}/explore",
         "rule": "获取首页结果_daily", "priority": 1}
    ] + [
        {"spider": "知乎每日推荐", "url": p["url"],
         "rule": "获取首页结果_next", "priority": 1}
        for p in pages[1:1 + len(offset_qids)]
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None, limit: int = 20):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("zhihu-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(limit)
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), ZHIHU_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=2),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for t in ("url_seen", "items"):
            df = catalog.read(t)
            print(t, df.count() if df is not None else 0)
        print("state:", state)
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/zhihu-run")
