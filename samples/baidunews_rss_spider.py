"""Sample spider: the reference's baidunews rule ported 1:1 —
the ``kind="xml"`` (encoding/xml) authoring surface plus the
SubNamespace data-dependent table naming
(`sample/static_rules/baidunews/baidunews.go`).

Reference flow:

* Root (baidunews.go:81-86): one Aid per RSS category from the
  ``rss_BaiduNews`` map (:34-49), each AddQueue'd (:94-103) with
  ``Temp: {"src": <category>}`` and ``Reloadable: true`` — the polling
  loop re-enqueues the same feed URL every 5 min.
* "XML列表页" (:107-137): ``xml.Unmarshal`` of the RSS body into
  ``channel.item`` structs (:51-65); per entry, AddQueue the article
  link as "新闻详情" with the cleaned title/description/pubDate/author
  and the category riding the child's Temp (:123-135,
  ``spidercommon.CleanHtml(v.Title, 4)``). The rule NEVER calls
  ctx.Output — it emits no rows.
* "新闻详情" (:139-166): ItemFields 标题/描述/内容/发布时间/分类/作者;
  content from a body-paragraph heuristic, ``CleanHtml(infoStr, 5)``
  (:183-208); every other field is a ``ctx.GetTemp`` read (:157-164).
* SubNamespace (:77-79): ``dataCell["Data"]["分类"]`` — output tables
  are named by the CATEGORY value, not the rule.

Maps onto the DSL as:

* seeds: one per category, ``temp={"src": <category>}`` (the engine's
  seed Temp carry; the 5-min polling Timer is the reference's live-ops
  loop — a re-seed of the same reloadable URL, out of scope for the
  single-pass sample).
* "XML列表页": ``ExtractRule(kind="xml", item_pattern="channel.item",
  emit=False)`` — ``emit=False`` is the no-ctx.Output ParseFunc;
  ``field_transforms`` apply ``("clean_html", 4)`` exactly where the
  reference calls CleanHtml(·, 4); ``temp_fields=("src",)`` reads the
  seed temp back into each entry; ``link_fields=("link",)`` AddQueues
  each article; aliased ``carry_fields`` pairs rename at AddQueue time
  just like the reference's Temp map keys (pubDate → 发布时间 etc.).
* "新闻详情": css rule — 内容 from ``p@html`` + ``clean_html(5)``
  (the findP heuristic collapsed to the article's paragraph block;
  deviation documented), every other field a ``temp_fields`` read.
* ``sub_namespace_field="分类"`` + ``sinks.export_items_csv(...,
  sub_field=...)`` — one output partition per category value.

Run: ``python samples/baidunews_rss_spider.py /tmp/baidunews-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "news.test"
# category → feed path (the shape of rss_BaiduNews, baidunews.go:34-49)
RSS_FEEDS = {
    "国内最新": f"http://{HOST}/rss/civilnews",
    "体育最新": f"http://{HOST}/rss/sportnews",
    "科技最新": f"http://{HOST}/rss/technnews",
}

BAIDU_NEWS = SpiderSpec(
    "百度RSS新闻",
    link_rules=(
        LinkRule("/rss/", "XML列表页", priority=1),
        LinkRule("/n/", "新闻详情", priority=0),
    ),
    item_rules=(),
    follow_anchors=False,  # every enqueue is an explicit AddQueue
    extract_rules=(
        ExtractRule(
            rule="XML列表页",
            kind="xml",
            item_pattern="channel.item",
            fields=("title", "link", "description", "pubDate", "author"),
            field_transforms=(
                # baidunews.go:128-132: CleanHtml(v.X, 4) on every
                # carried value (link is enqueued verbatim)
                ("title", (("clean_html", 4),)),
                ("description", (("clean_html", 4),)),
                ("pubDate", (("clean_html", 4),)),
                ("author", (("clean_html", 4),)),
            ),
            temp_fields=("src",),  # the seed's category temp
            link_fields=("link",),
            carry_fields=(
                # AddQueue-time Temp keys (baidunews.go:127-133),
                # renamed straight to the detail rule's ItemFields
                ("title", "标题"),
                ("description", "描述"),
                ("pubDate", "发布时间"),
                ("src", "分类"),
                ("author", "作者"),
            ),
            emit=False,  # ParseFunc without ctx.Output (:121-136)
        ),
        ExtractRule(
            rule="新闻详情",
            kind="css",
            item_pattern="body",
            fields=("标题", "描述", "内容", "发布时间", "分类", "作者"),
            field_css=(("内容", "p@html"),),
            # commonPrase: CleanHtml(infoStr, 5) (baidunews.go:203-207)
            field_transforms=(("内容", (("clean_html", 5),)),),
            temp_fields=("标题", "描述", "发布时间", "分类", "作者"),
        ),
    ),
    # output tables named by category value (baidunews.go:77-79)
    sub_namespace_field="分类",
)


def _rss_body(category: str, n_entries: int) -> bytes:
    items = "".join(
        f"<item><title>&lt;b&gt;{category}&lt;/b&gt; 标题 {j}</title>"
        f"<link>http://{HOST}/n/{category}-{j}</link>"
        f"<description>描述&lt;br/&gt;第 {j} 条</description>"
        f"<pubDate>2026-08-{j + 1:02d}</pubDate>"
        f"<author>作者{j}</author></item>"
        for j in range(n_entries)
    )
    return (
        '<?xml version="1.0" encoding="utf-8"?>'
        f"<rss version=\"2.0\"><channel><title>{category}</title>{items}"
        "</channel></rss>"
    ).encode()


def _article_body(category: str, j: int) -> bytes:
    return (
        '<html><head><meta charset="utf-8"></head><body>'
        f"<h1>{category} 标题 {j}</h1>"
        f"<p>正文第一段 <b>{category}</b> {j}。</p>"
        "</body></html>"
    ).encode()


def build_corpus(n_entries: int = 3) -> fixtures.Corpus:
    pages = []
    for category, feed_url in RSS_FEEDS.items():
        pages.append(
            {
                "url": feed_url,
                "host": HOST,
                "depth": 0,
                "status": 200,
                "flaky": False,
                "content_type": "application/xml; charset=utf-8",
                "body": _rss_body(category, n_entries),
                "out_links": [],
                "image_refs": [],
            }
        )
        for j in range(n_entries):
            pages.append(
                {
                    "url": f"http://{HOST}/n/{category}-{j}",
                    "host": HOST,
                    "depth": 1,
                    "status": 200,
                    "flaky": False,
                    "content_type": "text/html; charset=utf-8",
                    "body": _article_body(category, j),
                    "out_links": [],
                    "image_refs": [],
                }
            )
    seeds = [
        # Root's Aid loop (baidunews.go:81-103): one seed per category,
        # the category riding the request Temp
        {"spider": "百度RSS新闻", "url": feed_url, "rule": "XML列表页",
         "priority": 1, "temp": {"src": category}}
        for category, feed_url in RSS_FEEDS.items()
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None, n_entries: int = 3):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark(
            "baidunews-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(n_entries)
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), BAIDU_NEWS, robots,
        EngineConfig(wave_window_ms=6000, commit_every=2),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for t in ("url_seen", "items"):
            df = catalog.read(t)
            print(t, "rows:", df.count() if df is not None else 0)
        spark.stop()
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/baidunews-run")
