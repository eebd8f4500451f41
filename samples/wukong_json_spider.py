"""Sample spider: the reference wukongwenda rule re-expressed
Spark-first (`sample/static_rules/wukongwenda/wukongwenda.go`).

The reference flow:

* Root (wukongwenda.go:76-90): one seed per channel id —
  ``…/nativefeed/brow/?concern_id=<id>&t=<millis>`` with a custom
  User-Agent header.
* "获取结果" (wukongwenda.go:100-153): gjson-parse the JSON body —
  every element of ``data`` yields title / description / answer /
  question-url (built from ``question.qid``) via NESTED paths
  (``question.title``, ``question.content.text``, ``answer.content``);
  then, while root ``has_more`` is true, strip any old
  ``&max_behot_time=…`` from the page URL, append the LAST element's
  ``behot_time``, and AddQueue the result back into the same rule —
  cursor pagination.

Spark-first mapping (fully declarative):

* channel fan-out — ``engine.seed()`` over the channel URLs with the
  UA riding as an ``hdr:User-Agent`` temp (the reference's
  header.Add, wukongwenda.go:79-80).
* nested gjson paths — ``field_json`` entries on a ``kind="json"``
  ExtractRule; the question URL derives from the qid with a
  ``regex_sub`` transform (the Go string concat, wukongwenda.go:116).
* the cursor walk — a second, ``emit=False`` ExtractRule sharing the
  rule name (the baidusearch probe idiom) extracts each element's
  ``behot_time`` and declares ``cursor=("offset",
  "max_behot_time")`` + ``cursor_require=("has_more", "true")``: one
  follow-up per page, page URL with the cursor param replaced by the
  last element's offset, gated on the root-level has_more — exactly
  wukongwenda.go:125-141. The follow-up routes through the same
  LinkRule (the URL keeps the API path).

Run: ``python samples/wukong_json_spider.py /tmp/wukong-run``
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

HOST = "wukong.test"
# three channels stand in for the reference's 23 concern ids
DOMAINS = ("6300775428692904450", "6215497896830175745", "6215497726554016258")
N_PAGES = 3  # cursor pages per channel (has_more=false on the last)
PER_PAGE = 2  # questions per page
UA = "Mozilla/5.0 (pholcus-spark sample)"
BASE = f"http://{HOST}/wenda/web/nativefeed/brow/?concern_id=%s&t=1700000000000"

WUKONG_SPIDER = SpiderSpec(
    "wukongwenda",
    link_rules=(LinkRule("/wenda/web/nativefeed/brow/", "获取结果", priority=0),),
    item_rules=(),
    follow_anchors=False,  # the reference enqueues explicitly
    extract_rules=(
        # wukongwenda.go:108-124 + 144-152: one Output per data element,
        # fields via nested gjson paths
        ExtractRule(
            rule="获取结果",
            kind="json",
            item_pattern="data",
            fields=("问题标题", "问题描述", "问题回答", "问题url地址"),
            field_json=(
                ("问题标题", "question.title"),
                ("问题描述", "question.content.text"),
                ("问题回答", "answer.content"),
                ("问题url地址", "question.qid"),
            ),
            field_transforms=(
                # wukongwenda.go:116: url := prefix + qid + "/"
                ("问题url地址", (
                    ("regex_sub", r"^(.+)$",
                     rf"http://{HOST}/question/\1/"),
                ),),
            ),
        ),
        # wukongwenda.go:125-141: the cursor probe — emits nothing,
        # walks max_behot_time forward off the LAST element while the
        # root has_more holds
        ExtractRule(
            rule="获取结果",
            kind="json",
            item_pattern="data",
            fields=("offset",),
            field_json=(("offset", "behot_time"),),
            cursor=("offset", "max_behot_time"),
            cursor_require=("has_more", "true"),
            emit=False,
        ),
    ),
)


def _behot(dom_i: int, page: int) -> int:
    return 1514000000 + dom_i * 1000 + page * 10


def _page_body(dom_i: int, page: int) -> bytes:
    data = []
    for j in range(PER_PAGE):
        qid = f"{dom_i}{page}{j}"
        data.append(
            {
                "question": {
                    "title": f"题-{qid}",
                    "content": {"text": f"描述-{qid}"},
                    "qid": qid,
                },
                "answer": {"content": f"答-{qid}"},
                "behot_time": _behot(dom_i, page) + j,
            }
        )
    return json.dumps(
        {"has_more": page < N_PAGES - 1, "data": data},
        ensure_ascii=False,
    ).encode("utf-8")


def build_corpus() -> fixtures.Corpus:
    def page(url, body):
        return {
            "url": url,
            "host": HOST,
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": "application/json; charset=utf-8",
            "body": body,
            "out_links": [],
            "image_refs": [],
        }

    pages = []
    for i, dom in enumerate(DOMAINS):
        first = BASE % dom
        pages.append(page(first, _page_body(i, 0)))
        for p in range(1, N_PAGES):
            # the cursor of page p-1 is its LAST element's behot_time;
            # the frontier keys requests by CANONICAL url (sorted query
            # params), so the fixture page is keyed the same way
            cur = _behot(i, p - 1) + PER_PAGE - 1
            pages.append(
                page(
                    canonicalize_url(f"{first}&max_behot_time={cur}"),
                    _page_body(i, p),
                )
            )
    seeds = [
        {
            "spider": "wukongwenda",
            "url": BASE % dom,
            "rule": "获取结果",
            "priority": 0,
            "temp": {"hdr:User-Agent": UA},
        }
        for dom in DOMAINS
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark(
            "wukong-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), WUKONG_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/wukong-run")
