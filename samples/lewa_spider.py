r"""Sample spider: the reference lewa rule re-expressed Spark-first
(`sample/static_rules/lewa/lewa.go` — the "京东搜索new" JD search
variant; distinct from jdsearch.go and jingdong/jdSpider.go, both
already ported).

The reference flow:

* Root (lewa.go:44-46): ``ctx.Aid({"Rule": "判断页数"})`` — the AidFunc
  (lewa.go:52-60) enqueues ONE probe page per keyin:
  ``/Search?keyword=<GetKeyin()>&enc=utf-8&...&page=1`` under 判断页数.
* 判断页数 ParseFunc (lewa.go:61-76): walks EVERY ``<script>`` element
  (``query.Find("script").Each``), and where the text contains
  ``page_count`` applies ``page_count:"\d{1,}"`` FindString then
  ``\d{1,}`` FindString → ``pageCount``; then
  ``ctx.Aid({"PageCount": pageCount}, "生成请求")``.
* 生成请求 AidFunc (lewa.go:80-103): ``for i := 1; i < pageCount; i++``
  enqueues TWO requests per iteration under 搜索结果 — the odd
  synchronous page ``/Search?...&page=(2i-1)`` and the even async page
  ``/s_new.php?...&scrolling=y&pos=30&page=(2i)``.
* 搜索结果 (lewa.go:105-147): per ``.gl-item`` — title
  ``.p-name.p-name-type-2 > a`` Text + tag-strip regex
  (``\<[\S\s]+?\>`` → " ") + ``strings.Trim(" \t\n")``; price
  ``.p-price > strong > i`` Text; comment count
  ``.p-commit > strong > a`` Text; href of the title anchor prefixed
  ``"http:"``; ``if title != ""`` guards Output (lewa.go:135-143).

Spark-first mapping:

* keyin — ``%keyin_esc%`` in the seed URL and in the two Temp page
  bases (keyin tokens substitute in temp values, like the jdsearch
  port).
* the script scan — ``"script@each()@text"`` joins every script's
  text (goquery ``.Each``), then the reference's two FindString
  regexes run verbatim as chained ``regex_find`` transforms, and
  ``("int_add", -1)`` turns pageCount into the loop's iteration count
  (``i < pageCount`` → i walks 1..pageCount-1). NOTE: the Go loop
  overwrites pageCount per matching script (last match wins) where
  the joined-text FindString takes the first — identical whenever the
  page carries one ``page_count`` blob, as the real site and these
  fixtures do.
* the dual-URL loop — TWO PaginateRules on 判断页数 with ``page_expr``
  (2,-1) and (2,0) (pages 2i-1 / 2i while i walks 1..count) and
  DIFFERENT ``base_field`` temps (the two URL shapes share nothing
  but the trailing page number). The regenerated odd page 1 does NOT
  collide with the probe: ``Unique()`` hashes spider+RULE+url+method
  (request.go:139-145) and the rule differs (判断页数 vs 搜索结果), so
  the reference re-fetches page 1 under 搜索结果 and outputs its grid
  — the engine's ``request_key`` reproduces exactly that.
* 判断页数 emits nothing (``emit=False``): the reference's probe
  ParseFunc never calls ctx.Output, so page 1's items are never
  emitted even though the page carries a full result grid — the
  conformance test pins that quirk.
* the empty-title guard — ``require_fields=("标题",)`` after the
  strip+trim transforms.

Run: ``python samples/lewa_spider.py /tmp/lewa-run``
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

HOST = "search.lewa.test"
KEYINS = ("手机", "spark 内存")
PAGE_COUNT = 4  # the probe page's script reads page_count:"4" → i walks 1..3
ITEMS_PER_PAGE = 2  # per result page, after the empty-title drop

# the two URL shapes of lewa.go:85-99 (odd sync /Search, even async
# /s_new.php) — query layouts kept verbatim up to the test host
_BASE_ODD = (
    f"http://{HOST}/Search?keyword=%keyin_esc%"
    "&enc=utf-8&qrst=1&rt=1&stop=1&vt=2&bs=1&s=1&click=0&page="
)
_BASE_EVEN = (
    f"http://{HOST}/s_new.php?keyword=%keyin_esc%"
    "&enc=utf-8&qrst=1&rt=1&stop=1&vt=2&bs=1&s=31&scrolling=y&pos=30&page="
)

LEWA_SPIDER = SpiderSpec(
    "京东搜索new",
    link_rules=(),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # lewa.go:61-76 — the script-scan page-count probe; no Output
        ExtractRule(
            rule="判断页数",
            kind="css",
            item_pattern="body",
            fields=("total", "base_odd", "base_even"),
            field_css=(("total", "script@each()@text"),),
            field_transforms=(
                (
                    "total",
                    (
                        ("regex_find", r'page_count:"\d+"', 0),
                        ("regex_find", r"\d+", 0),
                        ("int_add", -1),  # for i := 1; i < pageCount
                    ),
                ),
            ),
            temp_fields=("base_odd", "base_even"),
            emit=False,
        ),
        # lewa.go:105-147 — the .gl-item result grid
        ExtractRule(
            rule="搜索结果",
            kind="css",
            item_pattern=".gl-item",
            fields=("标题", "价格", "评论数", "链接"),
            field_css=(
                ("标题", ".p-name.p-name-type-2 > a@text"),
                ("价格", ".p-price > strong > i@text"),
                ("评论数", ".p-commit > strong > a@text"),
                ("链接", ".p-name.p-name-type-2 > a@href"),
            ),
            field_transforms=(
                # lewa.go:119-122: tag strip (entities in the anchor
                # text re-surface as <…> after Text() unescapes them)
                # then Trim(" \t\n")
                ("标题", (("regex_sub", r"<[\S\s]+?>", " "), ("trim", " \t\n"))),
                # lewa.go:133: url = "http:" + url
                ("链接", (("prefix", "http:"),)),
            ),
            require_fields=("标题",),  # lewa.go:135 `if title != ""`
        ),
    ),
    paginate_rules=(
        # lewa.go:84-101 dual AddQueue: odd /Search page 2i-1 …
        PaginateRule(
            rule="判断页数", count_field="total",
            url_template="%s%d", base_field="base_odd",
            target_rule="搜索结果", start=1, page_expr=(2, -1),
        ),
        # … and even /s_new.php page 2i
        PaginateRule(
            rule="判断页数", count_field="total",
            url_template="%s%d", base_field="base_even",
            target_rule="搜索结果", start=1, page_expr=(2, 0),
        ),
    ),
)


def _item(n: int, empty_title: bool = False) -> str:
    if empty_title:
        # anchor with no text at all → Text()="" → require_fields drop
        # (lewa.go:135's skipped Output)
        title_html = '<a href="//dead.lewa.test/x.html"><img src="//i/x.png"/></a>'
    else:
        # an <em> child plus an ESCAPED tag in the text: Text()
        # unescapes &lt;热&gt; to <热>, which only the Go-side tag-strip
        # regex removes — the transform is observable, not decorative
        title_html = (
            f'<a href="//item.lewa.test/{n}.html">\n'
            f"<em>商品{n}</em> &lt;热&gt;\t</a>"
        )
    return (
        '<li class="gl-item">'
        f'<div class="p-name p-name-type-2">{title_html}</div>'
        f'<div class="p-price"><strong><i>{n}.00</i></strong></div>'
        f'<div class="p-commit"><strong><a>{n * 7}</a></strong></div>'
        "</li>"
    )


def _grid(page: int, decoy: bool = False) -> str:
    tag = "DECOY" if decoy else ""
    items = [_item(page * 10 + j) for j in range(ITEMS_PER_PAGE)]
    items.append(_item(page * 10 + 9, empty_title=True))
    if decoy:
        items = [i.replace("商品", "DECOY") for i in items]
    return f'<ul class="gl-warp">{"".join(items)}<!--{tag}--></ul>'


def _probe_body() -> bytes:
    # scripts around the page_count blob (the reference's .Each scan
    # must skip the non-matching ones); the grid on page 1 exists but
    # 判断页数 never outputs it
    html = (
        "<html><body>"
        "<script>var skin = {};</script>"
        f'<script>pager.init({{page_count:"{PAGE_COUNT}",cur:1}});</script>'
        "<script>tail();</script>"
        f"{_grid(1)}"
        "</body></html>"
    )
    return html.encode()


def _result_body(page: int, decoy: bool = False) -> bytes:
    return f"<html><body>{_grid(page, decoy)}</body></html>".encode()


def _url(base: str, keyin: str, page: int) -> str:
    return canonicalize_url(
        base.replace("%keyin_esc%", quote_plus(keyin)) + str(page)
    )


def build_corpus() -> fixtures.Corpus:
    pages = []
    for k in KEYINS:
        pages.append({
            "url": _url(_BASE_ODD, k, 1),
            "host": HOST, "depth": 0, "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _probe_body(), "out_links": [], "image_refs": [],
        })
        # odd pages 3,5 + even 2,4,6 are reachable (i walks 1..3);
        # pages 7/8 are off-by-one decoys — fetched ONLY if the
        # int_add(-1) iteration count were broken (i=4 → 7/8)
        for p, base in [(3, _BASE_ODD), (5, _BASE_ODD), (7, _BASE_ODD),
                        (2, _BASE_EVEN), (4, _BASE_EVEN), (6, _BASE_EVEN),
                        (8, _BASE_EVEN)]:
            pages.append({
                "url": _url(base, k, p),
                "host": HOST, "depth": 1, "status": 200, "flaky": False,
                "content_type": "text/html; charset=utf-8",
                "body": _result_body(p, decoy=p >= 7),
                "out_links": [], "image_refs": [],
            })
    seeds = [{
        "spider": "京东搜索new",
        "url": _BASE_ODD + "1",
        "rule": "判断页数",
        "priority": 0,
        "keyin": "<" + "><".join(KEYINS) + ">",
        "temp": {"base_odd": _BASE_ODD, "base_even": _BASE_EVEN},
    }]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("lewa-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), LEWA_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/lewa-run")
