"""Sample spider: the reference taobaosearch rule re-expressed
Spark-first (`sample/static_rules/taobaosearch/taobaosearch.go`).

The reference flow:

* "生成请求" (taobaosearch.go:47-89): regex-carve ``"totalCount":N}``
  out of the page's scripts; ``maxPage = ceil((N-4)/44)``, clamped at
  the LIMIT; Aid pages ``s=44i`` for i in 1..limit-1 under "搜索结果";
  ctx.Parse the page as "搜索结果". A no-results page (the 抱歉 guard)
  simply carries no totalCount.
* "搜索结果" (taobaosearch.go:92-135): carve the ``"auctions":[...]``
  array out of the scripts, json.Unmarshal, and AddQueue each
  auction's ``"http:" + detail_url`` under "商品详情" with
  ``Temp: CreateItem({标题, 价格, 销量, 店铺, 发货地})``.
* "商品详情" (taobaosearch.go:137-198): ``r := ctx.CopyTemps()`` then
  parse the product's attribute (name, value) pairs —
  ``ctx.UpsertItemField(name)`` + ``r[name] = value`` — and Output r:
  RUNTIME columns beyond the declared ItemFields.

Spark-first mapping:

* the script carves — ``ExtractRule.carve`` (regex pre-step before
  kind parsing): the count as a plain regex rule (a no-results page
  has no match → no pages, the 抱歉 branch for free), the auctions
  array as ``carve + kind="json"`` over the root array.
* UpsertItemField — ``dynamic_kv``: the ``.attributes-list`` rows as
  one ``li@each(\\x01)@text`` blob, regex-split into parallel
  key/value lists, zipped into the item's data map at parse time; the
  CSV sink (``dynamic_rules=``) appends the union of runtime columns
  after the declared ItemFields, sorted (the reference's first-upsert
  order is scheduling-dependent — sorted is the deterministic form).
* the css fallback branch is the one ported (the fixture product
  pages carry .attributes-list); the newProGroup JSON branch is the
  same carve+json shape as the auctions rule.

Run: ``python samples/taobaosearch_spider.py /tmp/tbs-run``
"""

from __future__ import annotations

import json
import sys
from urllib.parse import quote_plus

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.keys import canonicalize_url
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import (
    ExtractRule,
    LinkRule,
    PaginateRule,
    SpiderSpec,
)

HOST = "s.taobao.test"
KEYIN = "键盘"
TOTAL_COUNT = 136   # ceil((136-4)/44) = 3 pages
LIMIT = 3           # SetLimit clamp → pages s=44, s=88
AUCTIONS_PER_PAGE = 2

_SEP = "\x01"
_BASE = (
    f"http://{HOST}/search?q={quote_plus(KEYIN)}"
    "&ie=utf8&cps=yes&app=vproduct&cd=false&v=auction&tab=all"
    "&vlist=1&bcoffset=1&s="
)

_ITEM_FIELDS = ("标题", "价格", "销量", "店铺", "发货地")


def _auction_rule(rule: str) -> ExtractRule:
    """The auctions carve+Unmarshal+AddQueue half (shared by the count
    page via ctx.Parse and the generated pages)."""
    return ExtractRule(
        rule=rule,
        kind="json",
        carve=(r'"auctions":(\[.*?\]),"recommendAuctions"', 1),
        item_pattern="",
        fields=(
            "detail_url", "raw_title", "view_price", "view_sales",
            "nick", "item_loc",
        ),
        field_transforms=(("detail_url", (("prefix", "http:"),)),),
        require_fields=("detail_url",),
        link_fields=("detail_url",),
        carry_fields=(
            ("raw_title", "标题"),
            ("view_price", "价格"),
            ("view_sales", "销量"),
            ("nick", "店铺"),
            ("item_loc", "发货地"),
        ),
        emit=False,
    )


TBS_SPIDER = SpiderSpec(
    "taobaosearch",
    link_rules=(LinkRule("//detail.taobao.test/", "商品详情", priority=1),),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # taobaosearch.go:57-76: the totalCount carve + page arithmetic
        # (a no-results page has no totalCount → no match → no pages)
        ExtractRule(
            rule="生成请求",
            kind="regex",
            item_pattern=r'"totalCount":(?P<total>\d+)\}',
            fields=("total", "base"),
            field_transforms=(
                ("total", (
                    ("int_add", -4),
                    ("ceil_div", 44),   # maxPage
                    ("int_add", -1),    # Aid loop [1, limit)
                )),
            ),
            temp_fields=("base",),
            emit=False,
        ),
        _auction_rule("生成请求"),
        _auction_rule("搜索结果"),
        # taobaosearch.go:137-198: CopyTemps + UpsertItemField
        ExtractRule(
            rule="商品详情",
            kind="css",
            item_pattern="body",
            fields=_ITEM_FIELDS + ("_ks", "_vs"),
            field_css=(
                ("_ks", f".attributes-list li@each({_SEP})@text"),
                ("_vs", f".attributes-list li@each({_SEP})@text"),
            ),
            field_transforms=(
                # per li "k:v" → keys list / values list (Go splits
                # each cleaned line on ':' and trims fullwidth spaces)
                ("_ks", (
                    ("regex_sub", f"[\\s　]*:[^{_SEP}]*", ""),
                    ("regex_sub", f"(^|{_SEP})[\\s　]+", r"\1"),
                )),
                ("_vs", (
                    ("regex_sub", f"[^{_SEP}:]*:[\\s　]*", ""),
                    ("regex_sub", f"[\\s　]+({_SEP}|$)", r"\1"),
                )),
            ),
            dynamic_kv=("_ks", "_vs", _SEP),
            temp_fields=_ITEM_FIELDS,
        ),
    ),
    paginate_rules=(
        PaginateRule(
            rule="生成请求", count_field="total",
            url_template="%s%d", base_field="base",
            target_rule="搜索结果", start=1,
            max_pages=LIMIT - 1, page_expr=(44, 0),
        ),
    ),
)


def _search_url(s: int) -> str:
    return canonicalize_url(f"{_BASE}{s}")


def _detail_url(tag: str) -> str:
    return canonicalize_url(f"http://detail.taobao.test/{tag}.html")


def _auctions_json(page: int) -> str:
    auctions = [
        {
            "detail_url": f"//detail.taobao.test/p{page}-{j}.html",
            "raw_title": f"机械键盘 {page}-{j}",
            "view_price": f"{99 + j}.00",
            "view_sales": f"{page * 100 + j}人付款",
            "nick": f"店铺{j}",
            "item_loc": "广东 深圳",
        }
        for j in range(AUCTIONS_PER_PAGE)
    ]
    return json.dumps(auctions, ensure_ascii=False, separators=(",", ":"))


def _search_body(s: int) -> bytes:
    page = s // 44
    count = f'g_page.config={{"totalCount":{TOTAL_COUNT}}};' if s == 0 else ""
    html = (
        "<html><body><script>var x=1;</script>"
        f'<script>{count}data={{"auctions":{_auctions_json(page)},'
        '"recommendAuctions":[]};</script>'
        "</body></html>"
    )
    return html.encode()


def _detail_body(page: int, j: int) -> bytes:
    lis = (
        f"<li>品牌:雷柏{page}{j}</li>"
        "<li>连接方式:有线</li>"
        + (f"<li>　轴体: 红轴{j} </li>" if j % 2 else
           f"<li>键数:{87 + page}</li>")
    )
    html = (
        "<html><body><p>产品参数：</p>"
        f'<ul class="attributes-list">{lis}</ul>'
        "</body></html>"
    )
    return html.encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _search_url(44 * i), "host": HOST, "depth": i and 1,
            "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _search_body(44 * i), "out_links": [], "image_refs": [],
        }
        for i in range(LIMIT)
    ] + [
        {
            "url": _detail_url(f"p{page}-{j}"), "host": "detail.taobao.test",
            "depth": 2, "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _detail_body(page, j), "out_links": [], "image_refs": [],
        }
        for page in range(LIMIT)
        for j in range(AUCTIONS_PER_PAGE)
    ]
    seeds = [
        {
            "spider": "taobaosearch",
            "url": _search_url(0),
            "rule": "生成请求",
            "priority": 0,
            "temp": {"base": _BASE},
        }
    ]
    robots = [
        {"host": h, "disallow_prefixes": [], "crawl_delay_ms": None}
        for h in (HOST, "detail.taobao.test")
    ]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("tbs-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), TBS_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tbs-run")
