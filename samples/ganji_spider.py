"""Sample spider: the reference ganji_gongsi rule re-expressed
Spark-first (`sample/static_rules/ganji_gongsi/ganji_gongsi.go` — the
repo's own "典型规则示例", text + file output in one spider).

The reference flow:

* "请求列表" (ganji_gongsi.go:52-68): the conditional page walk —
  ``Find(".linkOn span").Text() != strconv.Itoa(GetTemp("p"))`` stops
  the walk; else AddQueue ``/gongsi/o{p+1}`` with ``Temp{"p": p+1}``
  and ctx.Parse the list.
* "获取列表" (ganji_gongsi.go:70-84): every ``.com-list-2 table a``
  href → "输出结果".
* "输出结果" (ganji_gongsi.go:86-140): the label-dispatch Each loop —
  per ``.c-introduce li``, ``Split(s.Text(), "   ")[0]`` minus the
  ``em`` label text, switched on the label into the
  公司/规模/行业/类型/联系人/地址 columns; 简介 from
  ``#company_description``; the 联系电话 row's <img> AddQueued under
  "联系方式" with ``Temp{"n": 公司+"("+联系人+").png"}``.
* "联系方式" (ganji_gongsi.go:147-155): ``ctx.FileOutput(GetTemp("n"))``.

Spark-first mapping:

* the walk — require_equals + int_add/prefix, exactly the car_home
  pattern (same Go idiom, ganji_gongsi.go:54-63).
* the label dispatch — ONE ``.c-introduce li@each(\\x01)@text`` blob
  per page (every li's text joined on a control char), then per
  COLUMN ``regex_find("<label>：([^\\x01]*)")`` + the reference's
  split/trim chain. Each field re-reads the same blob — the
  switch-statement dispatch becomes six independent projections.
* FileOutput with a Temp-derived name — the phone image enqueues via
  a page-level probe whose carry lands on the typed images table's
  caption/name column. One declared simplification: Go composes
  公司+"("+联系人+")" into the filename; carry_fields rides ONE field,
  so the caption carries 公司 (the identifying half).

Run: ``python samples/ganji_spider.py /tmp/ganji-run``
"""

from __future__ import annotations

import sys

import numpy as np

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.imaging import encode_png, synth_pixels
from pholcus_spark.keys import canonicalize_url
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "sz.ganji.test"
N_LIST_PAGES = 2
COMPANIES_PER_PAGE = 2

_SEP = "\x01"
_BLOB = f".c-introduce li@each({_SEP})@text"


def _label_chain(label: str) -> tuple:
    """The per-column half of the reference's switch: grab this label's
    li from the joined blob, cut at the triple space, trim (the em
    label text never enters the capture — the regex anchors past it,
    the declarative form of ``ReplaceAll(t, em, "")``)."""
    return (
        ("regex_find", f"{label}：([^{_SEP}]*)", 1),
        ("split_pick", "   ", 0),
        ("trim", " "),
    )


GANJI_SPIDER = SpiderSpec(
    "ganji_gongsi",
    link_rules=(
        LinkRule("/gongsi/o", "请求列表", priority=0),
        LinkRule("/gongsi/c", "输出结果", priority=0),
        LinkRule("/phone/", "联系方式", priority=1),
    ),
    item_rules=(),
    image_rule="联系方式",
    follow_anchors=False,
    extract_rules=(
        # ganji_gongsi.go:52-68 — the conditional next-page probe
        ExtractRule(
            rule="请求列表",
            kind="css",
            item_pattern="body",
            fields=("cur", "pnext", "nxt"),
            field_css=(
                ("cur", ".linkOn span@text"),
                ("pnext", ".linkOn span@text"),
                ("nxt", ".linkOn span@text"),
            ),
            field_transforms=(
                ("pnext", (("int_add", 1),)),
                ("nxt", (
                    ("int_add", 1),
                    ("prefix", f"http://{HOST}/gongsi/o"),
                )),
            ),
            require_equals=(("cur", "p"),),
            link_fields=("nxt",),
            carry_fields=(("pnext", "p"),),
            emit=False,
        ),
        # ganji_gongsi.go:70-84 "获取列表" (ctx.Parse on the same page)
        ExtractRule(
            rule="请求列表",
            kind="css",
            item_pattern=".com-list-2 table a",
            fields=("durl",),
            field_css=(("durl", "@href"),),
            link_fields=("durl",),
            emit=False,
        ),
        # ganji_gongsi.go:86-140 "输出结果" — the label-dispatch loop
        ExtractRule(
            rule="输出结果",
            kind="css",
            item_pattern="body",
            fields=("公司", "联系人", "地址", "简介", "行业", "类型", "规模"),
            field_css=(
                ("公司", _BLOB),
                ("联系人", _BLOB),
                ("地址", _BLOB),
                ("简介", "#company_description@text"),
                ("行业", _BLOB),
                ("类型", _BLOB),
                ("规模", _BLOB),
            ),
            field_transforms=(
                ("公司", _label_chain("公司名称")),
                ("联系人", _label_chain("联 系 人")),
                ("地址", _label_chain("公司地址")),
                ("行业", _label_chain("公司行业")),
                ("类型", _label_chain("公司类型")),
                ("规模", _label_chain("公司规模")),
            ),
        ),
        # ganji_gongsi.go:120-128 — the phone-image AddQueue with the
        # Temp-derived file name (公司 rides as the images caption)
        ExtractRule(
            rule="输出结果",
            kind="css",
            item_pattern="body",
            fields=("img", "公司"),
            field_css=(
                ("img", ".c-introduce li img@src"),
                ("公司", _BLOB),
            ),
            field_transforms=(("公司", _label_chain("公司名称")),),
            require_fields=("img",),
            link_fields=("img",),
            carry_fields=(("公司", "caption"),),
            emit=False,
        ),
    ),
)


def _list_url(p: int) -> str:
    return canonicalize_url(f"http://{HOST}/gongsi/o{p}")


def _company_url(p: int, i: int) -> str:
    return canonicalize_url(f"http://{HOST}/gongsi/c{p}{i}")


def _phone_url(p: int, i: int) -> str:
    return canonicalize_url(f"http://{HOST}/phone/{p}{i}.png")


def _list_body(p: int) -> bytes:
    cur = p if p <= N_LIST_PAGES else 1  # redirect past the last page
    rows = "".join(
        f'<table><tr><td><a href="/gongsi/c{p}{i}">公司{p}{i}</a></td>'
        "</tr></table>"
        for i in range(COMPANIES_PER_PAGE)
    )
    return (
        f'<html><body><div class="linkOn"><span>{cur}</span></div>'
        f'<div class="com-list-2">{rows}</div></body></html>'
    ).encode()


def _company_body(p: int, i: int) -> bytes:
    n = p * 10 + i
    lis = (
        f"<li><em>公司名称：</em>晨光文具{n}   推广</li>"
        f"<li><em>公司规模：</em>{n * 7}人   </li>"
        "<li><em>公司行业：</em>文教用品   </li>"
        "<li><em>公司类型：</em>有限公司   </li>"
        f"<li><em>联 系 人：</em>联系人{n}   </li>"
        f'<li><em>联系电话：</em><img src="/phone/{p}{i}.png"></li>'
        f"<li><em>公司地址：</em>深圳市 {n} 号   地图</li>"
    )
    return (
        "<html><body>"
        f'<ul class="c-introduce">{lis}</ul>'
        f'<div id="company_description">主营文具批发 {n}。</div>'
        "</body></html>"
    ).encode()


def build_corpus() -> fixtures.Corpus:
    rng = np.random.default_rng(11)
    pages = [
        {
            "url": _list_url(p), "host": HOST, "depth": p - 1,
            "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _list_body(p), "out_links": [], "image_refs": [],
        }
        for p in range(1, N_LIST_PAGES + 2)
    ]
    for p in range(1, N_LIST_PAGES + 1):
        for i in range(COMPANIES_PER_PAGE):
            pages.append(
                {
                    "url": _company_url(p, i), "host": HOST, "depth": p,
                    "status": 200, "flaky": False,
                    "content_type": "text/html; charset=utf-8",
                    "body": _company_body(p, i),
                    "out_links": [], "image_refs": [],
                }
            )
            pages.append(
                {
                    "url": _phone_url(p, i), "host": HOST, "depth": p + 1,
                    "status": 200, "flaky": False,
                    "content_type": "image/png",
                    "body": encode_png(synth_pixels(rng, 24, 24)),
                    "out_links": [],
                    "image_refs": [f"ph-{p}{i}"],
                }
            )
    seeds = [
        {
            "spider": "ganji_gongsi",
            "url": _list_url(1),
            "rule": "请求列表",
            "priority": 0,
            "temp": {"p": "1"},
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
            "ganji-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), GANJI_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
        for r in catalog.read("images").orderBy("url").collect():
            print("IMG", r.url, r.caption, r.valid)
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ganji-run")
