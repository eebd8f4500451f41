"""Sample spider: the reference zhihu_bianji rule re-expressed
Spark-first (`sample/static_rules/zhihu_bianji/zhihu_bianji.go`).

The reference flow:

* Root (zhihu_bianji.go:46-52): GET the explore/recommendations page.
* "知乎编辑推荐" (…:55-77): css-select the recommend list's anchors,
  AddQueue each landing page; then the Aid loop "知乎编辑推荐翻页"
  (…:80-96) POSTs the SAME url ``/node/ExploreRecommendListV2`` once
  per offset with ``method=next&params={"limit":20,"offset":N}`` —
  ``Reloadable: true`` because Unique() hashes url+method only
  (request.go:139-145), so without the opt-out every offset after the
  first would dedup away.
* "知乎编辑推荐翻页" (…:98-141): the response is JSON whose ``msg``
  is an array of HTML-fragment STRINGS; the reference concatenates
  them, re-parses, and AddQueues each fragment's anchor — question
  URLs (regex …/question/\\d+…) to "解析知乎问答落地页", the rest to
  "解析知乎文章落地页".
* Landing rules (…:143-196): css Text()/First().Html() projections.

Spark-first mapping:

* the Aid POST loop — driver-side ``seed()`` dicts with per-seed
  ``method``/``post_data`` (Go's url.Values.Encode() form), the POST
  url in ``reloadable_urls``; the fixture keys those pages by
  ``post_data`` (fixtures PAGES_DDL post_data column) so each offset
  serves its own body, exactly like the reference's server.
* msg fragments — the json kind's scalar-array-element form: a
  single-field rule takes each string element as the field; a
  ``regex_sub`` transform peels the fragment's href, ``link_fields``
  enqueues it, and LinkRule prefixes ``/question/`` vs ``/p/`` replay
  filterZhihuAnswerURL's routing (zhihu_bianji.go:130-136).
* landing extraction — css rules with the reference's own selectors,
  ``@eq(0)@html`` for First().Html().

Run: ``python samples/zhihu_bianji_spider.py /tmp/zhihu-bianji-run``
"""

from __future__ import annotations

import sys
from urllib.parse import urlencode

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.keys import canonicalize_url
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "zhihu.test"
POST_URL = f"http://{HOST}/node/ExploreRecommendListV2"
OFFSETS = (20, 40)


def _post_body(offset: int) -> str:
    # Go url.Values.Encode(): sorted keys, percent-encoded
    # (zhihu_bianji.go:90)
    return urlencode(
        sorted(
            {
                "method": "next",
                "params": '{"limit":20,"offset":%d}' % offset,
            }.items()
        )
    )


ZHIHU_BIANJI_SPIDER = SpiderSpec(
    "zhihu_bianji",
    link_rules=(
        # filterZhihuAnswerURL routing (zhihu_bianji.go:130-136,210-212)
        LinkRule("/question/", "解析知乎问答落地页", priority=0),
        LinkRule("/p/", "解析知乎文章落地页", priority=0),
    ),
    item_rules=(),
    follow_anchors=False,  # the reference enqueues explicitly
    reloadable_urls=frozenset({canonicalize_url(POST_URL)}),
    extract_rules=(
        # zhihu_bianji.go:57-65: recommend-list anchors → landing pages
        ExtractRule(
            rule="知乎编辑推荐",
            kind="css",
            item_pattern=(
                "#zh-recommend-list-full .zh-general-list .zm-item h2 a"
            ),
            fields=("href",),
            field_css=(("href", "@href"),),
            link_fields=("href",),
            emit=False,
        ),
        # zhihu_bianji.go:98-141: msg = array of HTML-fragment strings;
        # one item per fragment, href peeled by transform, enqueued
        ExtractRule(
            rule="知乎编辑推荐翻页",
            kind="json",
            item_pattern="msg",
            fields=("href",),
            field_transforms=(
                ("href", (
                    ("regex_sub", r'^[\s\S]*?href="([^"]*)"[\s\S]*$',
                     r"\1"),
                ),),
            ),
            require_fields=("href",),
            link_fields=("href",),
            emit=False,
        ),
        # zhihu_bianji.go:148-172: question landing page
        ExtractRule(
            rule="解析知乎问答落地页",
            kind="css",
            item_pattern=".QuestionPage",
            fields=("标题", "提问内容", "回答内容"),
            field_css=(
                ("标题",
                 ".QuestionHeader .QuestionHeader-content "
                 ".QuestionHeader-main .QuestionHeader-title@text"),
                ("提问内容",
                 ".QuestionHeader .QuestionHeader-content "
                 ".QuestionHeader-main .QuestionHeader-detail span@text"),
                ("回答内容",
                 ".Question-main .AnswerCard .QuestionAnswer-content "
                 ".ContentItem .RichContent "
                 ".RichContent-inner@eq(0)@html"),
            ),
        ),
        # zhihu_bianji.go:175-196: column-article landing page
        ExtractRule(
            rule="解析知乎文章落地页",
            kind="css",
            item_pattern="body",
            fields=("标题", "内容"),
            field_css=(
                ("标题", ".PostIndex-title.av-paddingSide.av-titleFont@html"),
                ("内容",
                 ".RichText.PostIndex-content.av-paddingSide.av-card@html"),
            ),
        ),
    ),
)


def _explore_body() -> bytes:
    items = (
        '<div class="zm-item"><h2><a href="/question/101/answer/1">q101</a></h2></div>'
        '<div class="zm-item"><h2><a href="/p/201">p201</a></h2></div>'
    )
    return (
        '<html><body><div id="zh-recommend-list-full">'
        f'<div class="zh-general-list">{items}</div>'
        "</div></body></html>"
    ).encode()


def _post_page_body(offset: int) -> bytes:
    import json as json_mod

    if offset == 20:
        frags = [
            '<div class="zm-item"><h2><a href="/question/102">q102</a></h2></div>',
            '<div class="zm-item"><h2><a href="/p/202">p202</a></h2></div>',
        ]
    else:
        frags = [
            '<div class="zm-item"><h2><a href="/question/103">q103</a></h2></div>',
        ]
    return json_mod.dumps({"r": 0, "msg": frags}).encode()


def _question_body(qid: str) -> bytes:
    return (
        '<html><body><div class="QuestionPage">'
        '<div class="QuestionHeader"><div class="QuestionHeader-content">'
        '<div class="QuestionHeader-main">'
        f'<h1 class="QuestionHeader-title">题-{qid}</h1>'
        f'<div class="QuestionHeader-detail"><span>描述-{qid}</span></div>'
        "</div></div></div>"
        '<div class="Question-main"><div class="AnswerCard">'
        '<div class="QuestionAnswer-content"><div class="ContentItem">'
        '<div class="RichContent">'
        f'<div class="RichContent-inner"><p>答-{qid}</p></div>'
        f'<div class="RichContent-inner"><p>次答-{qid}</p></div>'
        "</div></div></div></div></div>"
        "</div></body></html>"
    ).encode()


def _article_body(aid: str) -> bytes:
    return (
        "<html><body>"
        f'<h1 class="PostIndex-title av-paddingSide av-titleFont">文-{aid}</h1>'
        '<div class="RichText PostIndex-content av-paddingSide av-card">'
        f"<p>正文-{aid}</p></div>"
        "</body></html>"
    ).encode()


def build_corpus() -> fixtures.Corpus:
    def page(url, body, ct="text/html; charset=utf-8", post=""):
        return {
            "url": url,
            "host": HOST,
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": ct,
            "body": body,
            "out_links": [],
            "image_refs": [],
            "post_data": post,
        }

    pages = [
        page(f"http://{HOST}/explore/recommendations", _explore_body()),
    ]
    for off in OFFSETS:
        pages.append(
            page(
                POST_URL,
                _post_page_body(off),
                ct="application/json; charset=utf-8",
                post=_post_body(off),
            )
        )
    for qid in ("101/answer/1", "102", "103"):
        pages.append(page(f"http://{HOST}/question/{qid}", _question_body(qid)))
    for aid in ("201", "202"):
        pages.append(page(f"http://{HOST}/p/{aid}", _article_body(aid)))
    seeds = [
        {
            "spider": "zhihu_bianji",
            "url": f"http://{HOST}/explore/recommendations",
            "rule": "知乎编辑推荐",
            "priority": 0,
        }
    ] + [
        {
            "spider": "zhihu_bianji",
            "url": POST_URL,
            "rule": "知乎编辑推荐翻页",
            "priority": 0,
            "method": "POST",
            "post_data": _post_body(off),
        }
        for off in OFFSETS
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark(
            "zhihu-bianji-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), ZHIHU_BIANJI_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/zhihu-bianji-run")
