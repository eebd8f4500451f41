"""Sample spider: the reference taobao rule's comment-accumulator
chain, re-expressed Spark-first
(`sample/static_rules/taobao/taobao.go:120-292`).

The reference flow:

* "商品列表" (taobao.go:120-172): JSON ``mallItemList`` → one
  ``ctx.CreateItem`` per product, the WHOLE partial item rides
  ``Temp`` into the detail request (``AddQueue{..., Temp: temp}``).
* "商品详情" (taobao.go:174-216): spec ``<li>`` texts collected, merged
  into the carried temps (``temp := ctx.CopyTemps()``), then ONE
  comment-page request with the grown temp.
* "商品评论" (taobao.go:218-259): each page APPENDS its comments to
  the temp list (``discussAll = append(discussAll, ...)``) and chains
  the NEXT page sequentially; only the last page reaches "结果".
* "结果" (taobao.go:261-292): ``ctx.Output(ctx.CopyTemps())``.

Spark-first mapping — the sequential Temp-append chain is the one part
that must NOT be ported literally (it serializes a product's pages
behind one another; at 10^5 products × 10^2 comment pages that is the
whole crawl's critical path):

* 商品列表 — ``kind="json"`` ExtractRule over ``mallItemList``;
  ``link_fields`` enqueue the detail pages, ``carry_fields`` ride the
  partial item (title/itemId/sellerId) as the frontier Temp map
  (CreateItem+Temp ≡ carry).
* 商品详情 — css rule; ``temp_fields`` merge the carried partials back
  into the item (CopyTemps), the spec list lands as one field; the
  rule EMITS the partial row (keyed by itemId) instead of growing a
  mutable temp.
* 商品评论 — every page is fetched IN PARALLEL: page 1 is enqueued by
  the detail rule (``link_fields``) and ``PaginateRule`` expands
  2..maxPage from the ``maxPage`` field each page reports (the
  sequential next-page AddQueue, taobao.go:244-256); duplicate
  expansions from later pages collapse in history dedup. Each page
  emits ``(itemId, page, comments)``.
* "结果" — ``sinks.accumulate_items``: one groupBy merges the comment
  segments IN PAGE ORDER into the detail partial — the relational form
  of the append chain, same final items, no serialization.

Documented deviations: the comment-page URL is assembled from temps by
string concat in the reference (taobao.go:206-211) — here the fixture
detail page carries it as a link (the crawl shape is identical); the
reference's comment JSON root is an object — the fixture wraps it in a
one-element ``data`` array (``kind="json"`` binds to a list, the same
relaxation Go's interface{} decode hides); the spec-map build
(taobao.go:182-199) lands as the li texts, newline-joined via
``@html`` + ``clean_html(5)``.

Run: ``python samples/taobao_accumulate_spider.py /tmp/tao-run``
"""

from __future__ import annotations

import json
import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import (
    ExtractRule,
    LinkRule,
    PaginateRule,
    SpiderSpec,
)

HOST = "tao.test"
# itemId -> (title, sellerId, n_comment_pages)
PRODUCTS = {
    "101": ("袜子", "7", 3),
    "102": ("帽子", "8", 1),
    "103": ("鞋子", "9", 2),
}

TAOBAO_SPIDER = SpiderSpec(
    "taobao",
    link_rules=(
        LinkRule("/d/", "商品详情", priority=1),
        LinkRule("/c", "商品评论", priority=2),
    ),
    item_rules=(),
    image_rule="下载文件",
    follow_anchors=False,  # every child is rule-authored (the reference)
    extract_rules=(
        # taobao.go:120-172 商品列表: CreateItem per mallItemList entry,
        # the partial rides Temp into the detail request
        ExtractRule(
            rule="商品列表",
            kind="json",
            item_pattern="mallItemList",
            fields=("title", "itemId", "sellerId", "href"),
            link_fields=("href",),
            carry_fields=("title", "itemId", "sellerId"),
            emit=False,  # the reference list rule Outputs nothing
        ),
        # taobao.go:174-216 商品详情: CopyTemps + spec list + ONE
        # comment request; emits the keyed PARTIAL row
        ExtractRule(
            rule="商品详情",
            kind="css",
            item_pattern="body",
            fields=("规格参数", "comment1"),
            field_css=(
                ("规格参数", ".attributes-list@html"),
                ("comment1", "a.cmt@href"),
            ),
            field_transforms=(
                ("规格参数", (("clean_html", 5), ("trim",))),
            ),
            temp_fields=("title", "itemId", "sellerId"),
            link_fields=("comment1",),
            carry_fields=("itemId",),
        ),
        # taobao.go:218-259 商品评论: per-page comment segment, keyed by
        # the carried itemId; maxPage drives the parallel fan-out below
        ExtractRule(
            rule="商品评论",
            kind="json",
            item_pattern="data",
            fields=("comments", "maxPage", "page"),
            temp_fields=("itemId",),
            carry_fields=("itemId",),
        ),
    ),
    paginate_rules=(
        # the sequential next-page AddQueue (taobao.go:244-256) as a
        # parallel expansion; pages re-announce maxPage, dedup collapses
        PaginateRule(
            rule="商品评论",
            count_field="maxPage",
            url_template=f"http://{HOST}/c?item=%s&page=%d",
            target_rule="商品评论",
            base_field="itemId",
            start=2,
            priority=2,
            carry_fields=("itemId",),  # Temp: temp (taobao.go:244-250)
        ),
    ),
)


def _list_body() -> bytes:
    return json.dumps(
        {
            "mallItemList": [
                {
                    "title": t,
                    "itemId": iid,
                    "sellerId": s,
                    "href": f"http://{HOST}/d/{iid}",
                }
                for iid, (t, s, _n) in sorted(PRODUCTS.items())
            ]
        },
        ensure_ascii=False,
    ).encode()


def _detail_body(iid: str) -> bytes:
    return (
        '<html><body><ul class="attributes-list">'
        f"<li>品牌: brand-{iid}</li><li>产地: loc-{iid}</li></ul>"
        f'<a class="cmt" href="http://{HOST}/c?item={iid}&page=1">评论</a>'
        "</body></html>"
    ).encode()


def _comment_body(iid: str, page: int) -> bytes:
    _t, _s, n_pages = PRODUCTS[iid]
    return json.dumps(
        {
            "data": [
                {
                    "comments": [f"c{iid}-{page}-{k}" for k in (1, 2)],
                    "maxPage": n_pages,
                    "page": page,
                }
            ]
        }
    ).encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": f"http://{HOST}/list",
            "host": HOST,
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": "application/json; charset=utf-8",
            "body": _list_body(),
            "out_links": [],
            "image_refs": [],
        }
    ]
    for iid, (_t, _s, n_pages) in sorted(PRODUCTS.items()):
        pages.append(
            {
                "url": f"http://{HOST}/d/{iid}",
                "host": HOST,
                "depth": 1,
                "status": 200,
                "flaky": False,
                "content_type": "text/html; charset=utf-8",
                "body": _detail_body(iid),
                "out_links": [],
                "image_refs": [],
            }
        )
        for p in range(1, n_pages + 1):
            pages.append(
                {
                    "url": f"http://{HOST}/c?item={iid}&page={p}",
                    "host": HOST,
                    "depth": 2,
                    "status": 200,
                    "flaky": False,
                    "content_type": "application/json; charset=utf-8",
                    "body": _comment_body(iid, p),
                    "out_links": [],
                    "image_refs": [],
                }
            )
    seeds = [
        {
            "spider": "taobao",
            "url": f"http://{HOST}/list",
            "rule": "商品列表",
            "priority": 0,
        }
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def accumulate(items_df):
    """The final "结果" join (taobao.go:292 Output(CopyTemps)) — one
    relational aggregation over the crawl's partial rows."""
    from pholcus_spark import sinks

    return sinks.accumulate_items(
        items_df,
        key_field="itemId",
        scalar_rule="商品详情",
        list_rule="商品评论",
        list_field="comments",
        page_field="page",
        out_rule="结果",
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("tao-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), TAOBAO_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        final = accumulate(catalog.read("items"))
        for r in final.orderBy("url").collect():
            print(dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tao-run")
