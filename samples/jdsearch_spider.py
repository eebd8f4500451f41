r"""Sample spider: the reference jdsearch rule re-expressed Spark-first
(`sample/static_rules/jdsearch/jdsearch.go` — the keyin'd JD search
with a ctx.GetLimit() page clamp and a ctx.Parse self re-dispatch;
distinct from `jingdong/jdSpider.go`, which samples/jd_spider.py
ports).

The reference flow:

* Root (jdsearch.go:42-44): ``ctx.Aid({"loop": [0, 1], ...})`` — the
  AidFunc (jdsearch.go:49-66) enqueues pages ``2i+1`` and ``2i+2`` per
  iteration, so the Root seeds exactly pages 1 and 2 of
  ``/Search?keyin=<GetKeyin()>...`` under "生成请求".
* "生成请求" ParseFunc (jdsearch.go:67-88): trailing digits of
  ``Find("#top_pagi span.text").Text()`` (regex ``[\d]+$``) are the
  page total; ``if total > ctx.GetLimit() { total = limit }`` clamps
  it (spider.LIMIT, jdsearch.go:39); ``ctx.Aid({"loop": [1, total],
  "Rule": "搜索结果"})`` expands the dual-URL loop for i in 1..total-1
  → pages 2i+1 / 2i+2 under "搜索结果"; finally ``ctx.Parse("搜索结果")``
  re-parses the SAME page under the result rule.
* "搜索结果" (jdsearch.go:91-137): per ``#plist .list-h:nth-child(1) >
  li`` — title ``.p-name a`` text (tag-strip regex + Trim), price
  ``strong[data-price]`` First attr, comment count ``.extra`` First →
  ``a`` First text digits, star level ``.star span[id]`` First class
  attr digits, href. NO empty-title guard (unlike jdSpider.go:117) —
  Output is unconditional.

Spark-first mapping:

* keyin + QueryEscape — ``%keyin_esc%`` in the seed URL AND in the
  seed Temp's page-base value (keyin tokens substitute in temp values,
  engine.seed); two seeds play the Root's pages-1-and-2 Aid.
* the GetLimit clamp — ``PaginateRule.max_pages = LIMIT - 1``: the
  reference's loop runs i in 1..min(total, limit)-1, and the count
  field carries ``("int_add", -1)``, so capping i at LIMIT-1 is
  exactly the clamp. Fixture pages 7/8 exist with decoy items that an
  UNclamped expansion (total=4 → i=3) would fetch — the conformance
  test asserts their absence.
* the dual-URL loop — TWO PaginateRules with ``page_expr`` (2,1) and
  (2,2) (pages 2i+1 / 2i+2 while i walks 1..count).
* ctx.Parse — ``out_rule="搜索结果"`` on the 生成请求-bound copy of the
  result ExtractRule: seed pages emit their items under the delegated
  rule name; paginated children bind the plain 搜索结果 copy.
* NOT modeled: the ``total == 0 → return`` early-out (jdsearch.go:
  79-82) — a 生成请求 page with NO pagination bar would here still
  emit its items where the reference logs-and-returns before
  ctx.Parse. Every fixture page carries the bar; expressing the guard
  declaratively would need a cross-rule item gate the DSL does not
  have (require_fields can only guard fields the item itself emits).

Run: ``python samples/jdsearch_spider.py /tmp/jdsearch-run``
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
from pholcus_spark.spiderspec import ExtractRule, PaginateRule, SpiderSpec

HOST = "search.jd.test"
KEYINS = ("spark 集群", "笔记本")
TOTAL = 4  # the #top_pagi bar on every page reads "1/4"
LIMIT = 3  # spider.LIMIT: total clamps 4 → 3, so i walks 1..2
ITEMS_PER_PAGE = 2

# GET query layout mirrors jdsearch.go:54 (keyin= param; page= last)
_BASE = f"http://{HOST}/Search?keyin=%keyin_esc%&enc=utf-8&qrst=1&rt=1&stop=1&click=&psort=&page="

_RESULT_FIELDS = ("标题", "价格", "评论数", "星级", "链接")
_RESULT_CSS = (
    ("标题", ".p-name a@text"),
    ("价格", "strong[data-price]@eq(0)@data-price"),
    ("评论数", ".extra@eq(0) a@eq(0)@text"),
    ("星级", ".extra@eq(0) .star span[id]@eq(0)@class"),
    ("链接", ".p-name a@href"),
)
_RESULT_TRANSFORMS = (
    # jdsearch.go:108-111: tag-strip + Trim on the title
    ("标题", (("regex_sub", r"<[\S\s]+?>", " "), ("trim", " \t\n"))),
    # jdsearch.go:117-125: regexp `[\d]+` FindString (first digit run)
    ("评论数", (("regex_find", r"\d+", 0),)),
    ("星级", (("regex_find", r"\d+", 0),)),
)


def _result_rule(bind_rule: str, out_rule: str | None) -> ExtractRule:
    """jdsearch.go:91-137 — once bound to 生成请求 (the ctx.Parse
    re-dispatch on seed pages) and once to 搜索结果 (paginated
    children)."""
    return ExtractRule(
        rule=bind_rule,
        kind="css",
        out_rule=out_rule,
        item_pattern="#plist .list-h:nth-child(1) > li",
        fields=_RESULT_FIELDS,
        field_css=_RESULT_CSS,
        field_transforms=_RESULT_TRANSFORMS,
    )


JDSEARCH_SPIDER = SpiderSpec(
    "京东搜索",
    link_rules=(),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # jdsearch.go:71-75: trailing digits of the pagination bar,
        # minus one (the Aid loop runs i < total)
        ExtractRule(
            rule="生成请求",
            kind="css",
            item_pattern="body",
            fields=("total", "base"),
            field_css=(("total", "#top_pagi span.text@text"),),
            field_transforms=(
                ("total", (("regex_find", r"(\d+)$", 1), ("int_add", -1))),
            ),
            # the seed Temp's page base merges into the probe item so
            # the PaginateRules' base_field can read it (GetTemp carry)
            temp_fields=("base",),
            emit=False,
        ),
        _result_rule("生成请求", "搜索结果"),  # ctx.Parse("搜索结果")
        _result_rule("搜索结果", None),
    ),
    paginate_rules=(
        # jdsearch.go:52-62 dual AddQueue; max_pages = the GetLimit
        # clamp (see module docstring)
        PaginateRule(
            rule="生成请求", count_field="total",
            url_template="%s%d", base_field="base",
            target_rule="搜索结果", start=1, max_pages=LIMIT - 1,
            page_expr=(2, 1),
        ),
        PaginateRule(
            rule="生成请求", count_field="total",
            url_template="%s%d", base_field="base",
            target_rule="搜索结果", start=1, max_pages=LIMIT - 1,
            page_expr=(2, 2),
        ),
    ),
)


def _item(n: int) -> str:
    return (
        "<li>"
        '<div class="p-name">'
        f'<a href="http://item.jd.test/{n}.html"> <em>商品 {n}</em>\n</a>'
        "</div>"
        f'<strong data-price="{n}.90">¥{n}.90</strong><strong>旧价</strong>'
        '<div class="extra">'
        f"<a>{n * 5}条评论</a><a>999</a>"
        f'<div class="star"><span id="star_{n}" class="star{n % 5} lv">'
        '★</span><span class="nostar9">x</span></div>'
        "</div></li>"
    )


def _page_body(keyin: str, page: int) -> bytes:
    items = [_item(page * 10 + j) for j in range(ITEMS_PER_PAGE)]
    # a second .list-h — :nth-child(1) must skip it (jdsearch.go:103)
    decoy_list = (
        '<ul class="list-h"><li><div class="p-name">'
        f'<a href="http://decoy.test/{page}">{keyin}DECOY</a></div></li></ul>'
    )
    html = (
        "<html><body>"
        f'<div id="top_pagi"><b>第</b><span class="text">1/{TOTAL}</span></div>'
        f'<div id="plist"><ul class="list-h">{"".join(items)}</ul>'
        f"{decoy_list}</div>"
        "</body></html>"
    )
    return html.encode()


def _page_url(keyin: str, page: int) -> str:
    return canonicalize_url(
        _BASE.replace("%keyin_esc%", quote_plus(keyin)) + str(page)
    )


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _page_url(k, p),
            "host": HOST,
            "depth": 0 if p <= 2 else 1,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            # pages 7/8 hold clamp decoys: fetched ONLY if the
            # GetLimit clamp were broken (total-1 = 3 → i=3 → 7/8)
            "body": _page_body(k, p),
            "out_links": [],
            "image_refs": [],
        }
        for k in KEYINS
        for p in range(1, 2 * TOTAL + 1)
    ]
    seeds = [
        # Root's Aid {0,1}: pages 2*0+1 and 2*0+2 (jdsearch.go:42-62);
        # the page base rides Temp into the PaginateRule '%s'
        {
            "spider": "京东搜索",
            "url": _BASE + str(p),
            "rule": "生成请求",
            "priority": 0,
            "keyin": "<" + "><".join(KEYINS) + ">",
            "temp": {"base": _BASE},
        }
        for p in (1, 2)
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark(
            "jdsearch-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), JDSEARCH_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jdsearch-run")
