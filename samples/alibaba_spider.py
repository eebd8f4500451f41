"""Sample spider: the reference alibaba rule re-expressed Spark-first
(`sample/static_rules/alibaba/alibaba.go`).

The reference flow:

* Root (alibaba.go:41-56): seed the gbk-escaped keyword search URL
  (``spidercommon.EncodeString(keyin, "gbk")``) with a constant
  ``Content-Type: text/html; charset=gbk`` header, under "生成请求".
* "生成请求" (alibaba.go:58-92): TWO branches on the fetched page —
  if ``#sm-pagination div[data-total-page]`` exists, Atoi its value,
  clamp at the LIMIT, Aid pages ``beginPage=2..total`` under
  "搜索结果" and ctx.Parse the page as "搜索结果"; if it does NOT
  (the AJAX-redirect case), AddQueue every
  ``.sm-floorhead-typemore a`` href under "搜索结果" instead.
* "搜索结果" (alibaba.go:95-145): per ``#sm-offer-list > li`` —
  company/title/address from @title attrs, price/sales/level from
  texts, url from @href.

Spark-first mapping:

* gbk keyin — the ``%keyin_gbk%`` seed token (percent-escaped GBK
  bytes); pages are SERVED as gbk too, exercising the transcode path.
* the two branches — structurally exclusive page shapes: the
  PaginateRule fires only when the data-total-page div exists, and
  the typemore fallback rule's container matches only on the
  redirect-shaped page. No imperative if needed.
* ctx.Parse("搜索结果") — the result ExtractRule declared twice, once
  bound to 生成请求 with ``out_rule="搜索结果"``.

Run: ``python samples/alibaba_spider.py /tmp/alibaba-run``
"""

from __future__ import annotations

import sys
from urllib.parse import quote

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

HOST = "s.1688.test"
KEYIN_PAGED = "文具"     # search with a pagination tag: 3 pages
KEYIN_REDIR = "玩具"     # the AJAX-redirect shape: 2 category links
TOTAL_PAGES = 3
ITEMS_PER_PAGE = 2

_QS = (
    "enableAsync=false&earseDirect=false&button_click=top&pageSize=60"
    "&n=y&offset=3&uniqfield=pic_tag_id"
)

_RESULT_FIELDS = ("公司", "标题", "价格", "销量", "星级", "地址", "链接")
_RESULT_CSS = (
    ("公司", "a.sm-offer-companyName@eq(0)@title"),
    ("标题", ".sm-offer-title > a:nth-child(1)@title"),
    ("链接", ".sm-offer-title > a:nth-child(1)@href"),
    ("价格", ".sm-offer-priceNum@eq(0)@text"),
    ("销量", "span.sm-offer-trade > em@eq(0)@text"),
    ("地址", ".sm-offer-location@eq(0)@title"),
    ("星级", "span.sm-offer-companyTag > a.sw-ui-flaticon-cxt16x16@eq(0)@text"),
)


def _result_rule(rule: str, out_rule: str | None) -> ExtractRule:
    return ExtractRule(
        rule=rule, kind="css", item_pattern="#sm-offer-list > li",
        fields=_RESULT_FIELDS, field_css=_RESULT_CSS, out_rule=out_rule,
    )


ALIBABA_SPIDER = SpiderSpec(
    "alibaba",
    link_rules=(
        # the redirect-branch category links (alibaba.go:66-74 route
        # them straight to 搜索结果)
        LinkRule("/selloffer/cat", "搜索结果", priority=0),
    ),
    item_rules=(),
    follow_anchors=False,
    # alibaba.go:52: the constant header on every AddQueue
    headers=(("Content-Type", "text/html; charset=gbk"),),
    extract_rules=(
        # pagination branch: total pages into the PaginateRule
        ExtractRule(
            rule="生成请求",
            kind="css",
            item_pattern="body",
            fields=("total", "base"),
            field_css=(
                ("total", "#sm-pagination div[data-total-page]@eq(0)"
                          "@data-total-page"),
            ),
            field_transforms=(("total", (("trim", " \t\n"),)),),
            require_fields=("total",),
            temp_fields=("base",),
            emit=False,
        ),
        # redirect branch: category links when no pagination tag
        # exists (structurally exclusive page shapes — the reference's
        # len(pageTag.Nodes)==0 if)
        ExtractRule(
            rule="生成请求",
            kind="css",
            item_pattern=".sm-floorhead-typemore a",
            fields=("url",),
            field_css=(("url", "@href"),),
            require_fields=("url",),
            link_fields=("url",),
            emit=False,
        ),
        # ctx.Parse("搜索结果") on the count page + the rule itself
        _result_rule("生成请求", "搜索结果"),
        _result_rule("搜索结果", None),
    ),
    paginate_rules=(
        # alibaba.go:85: Aid loop [1, total) → beginPage 2..total,
        # clamped at the LIMIT (max_pages)
        PaginateRule(
            rule="生成请求", count_field="total",
            url_template="%s&beginPage=%d", base_field="base",
            target_rule="搜索结果", start=2, max_pages=TOTAL_PAGES,
        ),
    ),
)


def _search_url(keyin: str, page: int) -> str:
    k = quote(keyin.encode("gb18030"), safe="")
    return canonicalize_url(
        f"http://{HOST}/selloffer/offer_search.htm?{_QS}"
        f"&keyins={k}&beginPage={page}"
    )


def _category_url(i: int) -> str:
    return canonicalize_url(f"http://{HOST}/selloffer/cat{i}.html")


def _offers_html(tag: str, n: int) -> str:
    lis = []
    for j in range(n):
        lis.append(
            f'<li><a class="sm-offer-companyName" title="公司{tag}{j}">c</a>'
            '<div class="sm-offer-title">'
            f'<a title="商品{tag}{j}" href="http://detail.1688.test/{tag}{j}">'
            "t</a></div>"
            f'<div class="sm-offer-priceNum">¥{j + 1}.50</div>'
            f'<span class="sm-offer-trade"><em>{(j + 1) * 30}笔</em></span>'
            f'<div class="sm-offer-location" title="广东 深圳"></div>'
            '<span class="sm-offer-companyTag">'
            f'<a class="sw-ui-flaticon-cxt16x16">{j + 1}年</a></span></li>'
        )
    return f'<ul id="sm-offer-list">{"".join(lis)}</ul>'


def _paged_body(page: int) -> bytes:
    html = (
        "<html><body>"
        f'<div id="sm-pagination"><div data-total-page=" {TOTAL_PAGES} ">'
        "页</div></div>"
        + _offers_html(f"p{page}-", ITEMS_PER_PAGE)
        + "</body></html>"
    )
    return html.encode("gb18030")


def _redirect_body() -> bytes:
    links = "".join(
        f'<div class="sm-floorhead-typemore"><a href="/selloffer/cat{i}.html">'
        "更多</a></div>"
        for i in range(2)
    )
    return f"<html><body>{links}</body></html>".encode("gb18030")


def _category_body(i: int) -> bytes:
    return (
        "<html><body>" + _offers_html(f"c{i}-", ITEMS_PER_PAGE)
        + "</body></html>"
    ).encode("gb18030")


def build_corpus() -> fixtures.Corpus:
    ct = "text/html; charset=gbk"
    pages = [
        {
            "url": _search_url(KEYIN_PAGED, p), "host": HOST, "depth": 0,
            "status": 200, "flaky": False, "content_type": ct,
            "body": _paged_body(p), "out_links": [], "image_refs": [],
        }
        for p in range(1, TOTAL_PAGES + 1)
    ] + [
        {
            "url": _search_url(KEYIN_REDIR, 1), "host": HOST, "depth": 0,
            "status": 200, "flaky": False, "content_type": ct,
            "body": _redirect_body(), "out_links": [], "image_refs": [],
        }
    ] + [
        {
            "url": _category_url(i), "host": HOST, "depth": 1,
            "status": 200, "flaky": False, "content_type": ct,
            "body": _category_body(i), "out_links": [], "image_refs": [],
        }
        for i in range(2)
    ]
    seeds = [
        {
            "spider": "alibaba",
            "url": f"http://{HOST}/selloffer/offer_search.htm?{_QS}"
                   "&keyins=%keyin_gbk%&beginPage=1",
            "rule": "生成请求",
            "priority": 0,
            "keyin": f"<{KEYIN_PAGED}><{KEYIN_REDIR}>",
            "temp": {
                "base": f"http://{HOST}/selloffer/offer_search.htm?{_QS}"
                        "&keyins=%keyin_gbk%",
            },
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
            "alibaba-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), ALIBABA_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("spider", "url").collect():
            print(r.spider, r.url.split("&")[-1], dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/alibaba-run")
