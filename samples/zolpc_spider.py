"""Sample spider: the reference zolpc forum rule re-expressed
Spark-first (`sample/static_rules/zolpc/zolpc.go`).

The reference flow:

* Root (zolpc.go:43): a static Aid loop generates one list-page
  request per page number — ``http://bbs.zol.com.cn/nbbbs/p{N}.html#c``
  into rule "生成请求".
* "生成请求" (zolpc.go:48-66): selects ``Find("tbody").Find("tr[id]")``
  and, PER ROW, stashes the row selection in Temp and calls
  ``ctx.Parse("获取结果")`` — the row is re-parsed under ANOTHER rule.
* "获取结果" (zolpc.go:68-124): 9 declared ItemFields projected from
  the row via chained ``Find().Eq(n)`` steps; the thread URL gets the
  host prefix prepended; ``ctx.Output`` emits under "获取结果".

Spark-first mapping:

* the static page loop — ``engine.seed`` over the generated URLs (the
  distributed form for large ranges is ``seed_range``).
* ctx.Parse — ``ExtractRule.out_rule="获取结果"``: the rule BINDS to
  the page's rule ("生成请求"), its ``item_pattern="tbody tr[id]"``
  plays the per-row Each loop, and the emitted items are relabeled to
  the delegated rule exactly like ``SetRuleName`` (context.go:356-374),
  so sink namespacing and ItemFields ordering key under "获取结果".
* the per-field ``Find("td").Eq(k)...`` chains — ``field_css``
  ``@eq(k)`` projection segments; the URL prefix — a ``regex_sub``
  anchor-prepend transform (zolpc.go:90 ``"http://bbs.zol.com.cn/" +
  outURL``, unconditional: a missing data-url yields the bare prefix,
  matching Go's "" concatenation).

Run: ``python samples/zolpc_spider.py /tmp/zolpc-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, SpiderSpec

HOST = "bbs.zol.com.cn"
PAGES = (1, 2, 3)  # zolpc.go:43 loops 1..720; sample scale

# The three zol forum rules are ONE rule at three board paths — they
# differ ONLY in spider name, list-page path and Aid loop bound
# (diff zolpc.go zolphone.go zolslab.go): 笔记本 /nbbbs/p{N} 1..720,
# 苹果手机 /sjbbs/d544_p{N} 1..950 (zolphone.go:43,52), 平板
# /padbbs/p{N} 1..640 (zolslab.go:43,52). samples/zolphone_spider.py
# and samples/zolslab_spider.py instantiate the variants.
VARIANTS = {
    "中关村笔记本": ("nbbbs/p", 720),
    "中关村手机": ("sjbbs/d544_p", 950),
    "中关村平板": ("padbbs/p", 640),
}


ITEM_FIELDS = (
    "机型", "链接", "主题", "发表者", "发表时间",
    "总回复", "总查看", "最后回复者", "最后回复时间",
)

def make_spider(name: str) -> SpiderSpec:
    """The shared zol rule under a variant's spider name (the three Go
    files carry byte-identical ParseFuncs)."""
    return SpiderSpec(
        name,
        link_rules=(),
        item_rules=(),
        follow_anchors=False,  # the reference never follows page anchors
        extract_rules=(
            # zolpc.go:58-65 (row selection) + 68-124 (per-row
            # projections, emitted under the ctx.Parse'd rule)
            ExtractRule(
                rule="生成请求",
                out_rule="获取结果",
                kind="css",
                item_pattern="tbody tr[id]",
                fields=ITEM_FIELDS,
                field_css=(
                    # outType (zolpc.go:93): td Eq(1) .iclass a Text()
                    ("机型", "td@eq(1) .iclass a@text"),
                    # outURL (zolpc.go:87-90): td Eq(1) data-url attr
                    ("链接", "td@eq(1)@data-url"),
                    # outTitle (zolpc.go:94): td Eq(1) div a Text()
                    ("主题", "td@eq(1) div a@text"),
                    # author/stime (zolpc.go:97-99): td Eq(2) a / span
                    ("发表者", "td@eq(2) a@text"),
                    ("发表时间", "td@eq(2) span@text"),
                    # reply/read (zolpc.go:102-104): td Eq(3) span / i
                    ("总回复", "td@eq(3) span@text"),
                    ("总查看", "td@eq(3) i@text"),
                    # ereply/etime (zolpc.go:107-109): td Eq(4) a Eq(0)/Eq(1)
                    ("最后回复者", "td@eq(4) a@eq(0)@text"),
                    ("最后回复时间", "td@eq(4) a@eq(1)@text"),
                ),
                field_transforms=(
                    # zolpc.go:90 unconditional host prefix
                    ("链接", (("regex_sub", "^", "http://bbs.zol.com.cn/", 1),),),
                ),
            ),
        ),
    )


ZOLPC_SPIDER = make_spider("中关村笔记本")


def _row(tid: str, typ: str, title: str, author: str, stime: str,
         reply: str, read: str, ereply: str, etime: str,
         with_id: bool = True) -> str:
    idattr = f' id="{tid}"' if with_id else ""
    return (
        f"<tr{idattr}>"
        "<td>ico</td>"
        f'<td data-url="sjbbs/d544_{tid}.html">'
        f"<div><a>{title}</a></div>"
        f'<div class="iclass"><a>{typ}</a></div></td>'
        f"<td><a>{author}</a><span>{stime}</span></td>"
        f"<td><span>{reply}</span><i>{read}</i></td>"
        f"<td><a>{ereply}</a><a>{etime}</a></td>"
        "</tr>"
    )


def _list_body(page_no: int) -> bytes:
    rows = [
        _row(f"t{page_no}01", f"类-{page_no}A", f"题-{page_no}01",
             f"user{page_no}a", f"2016-0{page_no}-01",
             str(10 * page_no + 1), str(100 * page_no + 1),
             f"last{page_no}a", f"2016-0{page_no}-02"),
        # header/ad row WITHOUT id — the reference's tr[id] filter
        # must drop it (zolpc.go:60)
        _row("", "广告", "置顶帖", "admin", "-", "-", "-", "-", "-",
             with_id=False),
        _row(f"t{page_no}02", f"类-{page_no}B", f"题-{page_no}02",
             f"user{page_no}b", f"2016-0{page_no}-03",
             str(10 * page_no + 2), str(100 * page_no + 2),
             f"last{page_no}b", f"2016-0{page_no}-04"),
    ]
    if page_no == 3:
        # degenerate row: no data-url, no second reply anchor — every
        # missing projection yields '' like goquery's empty selection
        rows.append(
            '<tr id="t303"><td>ico</td>'
            "<td><div><a>题-303</a></div>"
            '<div class="iclass"><a>类-3C</a></div></td>'
            "<td><a>user3c</a><span>2016-03-05</span></td>"
            "<td><span>33</span><i>333</i></td>"
            "<td><a>last3c</a></td></tr>"
        )
    return (
        f"<html><body><table><tbody>{''.join(rows)}</tbody></table>"
        "</body></html>"
    ).encode()


def page_url(n: int, path: str = "nbbbs/p") -> str:
    return f"http://{HOST}/{path}{n}.html"


def build_corpus(name: str = "中关村笔记本") -> fixtures.Corpus:
    path, _bound = VARIANTS[name]
    pages = [
        {
            "url": page_url(n, path),
            "host": HOST,
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _list_body(n),
            "out_links": [],
            "image_refs": [],
        }
        for n in PAGES
    ]
    seeds = [
        {
            "spider": name,
            "url": page_url(n, path),
            "rule": "生成请求",
            "priority": 0,
        }
        for n in PAGES
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None, name: str = "中关村笔记本"):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark(
            "zolpc-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(name)
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), make_spider(name), robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.rule, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/zolpc-run")
