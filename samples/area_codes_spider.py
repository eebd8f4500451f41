"""Sample spider: the reference area_codes rule re-expressed
Spark-first (`sample/static_rules/area_codes/area_codes.go` — the 2018
statistical division-code walk, 710k rows on the real site).

The reference flow:

* "省" (area_codes.go:68-102): ``tr.provincetr`` rows — each province
  anchor Outputs ``(名称, 代码, 0, 0)`` and AddQueues its page with
  ``Temp{"level": 0, "parent": code}``.
* "市" (area_codes.go:104-155): ONE recursive rule for every deeper
  level — ``level := GetTemp("level") + 1``; the villagetr branch
  (level==4) pairs td triples by ``i%3`` (code, type, name), every
  other level pairs ``tr td a`` anchors by ``i%2`` (code anchor, name
  anchor) and recurses with ``Temp{"level": level, "parent": code}``.

Spark-first mapping (two declared divergences, both documented):

* the single recursive rule with level ARITHMETIC becomes one rule per
  level — LinkRule routing is pattern-based, so each level's pages
  carry a distinguishing path segment and its rule emits the level as
  a ``const_fields`` literal (the fixture compresses the real site's
  5 levels to 省→市→村). The carried ``parent`` relay is unchanged:
  ``carry_fields`` rides the emitting row's short code onto its
  children, ``temp_fields`` lands it as the 上级 column.
* the ``i%2`` / ``i%3`` flattened-anchor pairing becomes per-ROW
  field projections (``td@eq(0) a@text`` / ``td@eq(2)@text``) — the
  same pairs, addressed structurally instead of by flat ordinal.

Run: ``python samples/area_codes_spider.py /tmp/areacodes-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.keys import canonicalize_url
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "stats.test"
N_PROVINCES = 2
CITIES_PER_PROVINCE = 2
VILLAGES_PER_CITY = 3

_FIELDS = ("名称", "代码", "级别", "上级")

AREA_SPIDER = SpiderSpec(
    "area_codes",
    link_rules=(
        LinkRule("/prov/", "市", priority=0),
        LinkRule("/city/", "村", priority=0),
    ),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # area_codes.go:68-102 "省": province rows on the index —
        # Output (名称, code, 0, 0) and enqueue with parent=code
        ExtractRule(
            rule="省",
            kind="css",
            item_pattern="tr.provincetr td a",
            fields=_FIELDS,
            field_css=(("名称", "@text"), ("代码", "@href")),
            field_transforms=(
                # code := strings.Split(href, ".")[0]
                ("代码", (("split_pick", "/", -1), ("split_pick", ".", 0)),),
            ),
            const_fields=(("级别", "0"), ("上级", "0")),
        ),
        ExtractRule(  # the AddQueue half (same anchors)
            rule="省",
            kind="css",
            item_pattern="tr.provincetr td a",
            fields=("url", "pcode"),
            field_css=(("url", "@href"), ("pcode", "@href")),
            field_transforms=(
                ("pcode", (("split_pick", "/", -1), ("split_pick", ".", 0)),),
            ),
            require_fields=("url",),
            link_fields=("url",),
            carry_fields=(("pcode", "上级"),),
            emit=False,
        ),
        # area_codes.go:104-155 anchor-pair branch: city rows on a
        # province page — code anchor + name anchor per tr
        ExtractRule(
            rule="市",
            kind="css",
            item_pattern="tr.citytr",
            fields=_FIELDS,
            field_css=(
                ("名称", "td@eq(1) a@text"),
                ("代码", "td@eq(0) a@text"),
            ),
            const_fields=(("级别", "1"),),
            temp_fields=("上级",),
        ),
        ExtractRule(
            rule="市",
            kind="css",
            item_pattern="tr.citytr",
            fields=("url", "pcode"),
            field_css=(
                ("url", "td@eq(0) a@href"),
                ("pcode", "td@eq(0) a@href"),
            ),
            field_transforms=(
                # parent := Split(Split(u, "/")[1], ".")[0]
                ("pcode", (("split_pick", "/", -1), ("split_pick", ".", 0)),),
            ),
            require_fields=("url",),
            link_fields=("url",),
            carry_fields=(("pcode", "上级"),),
            emit=False,
        ),
        # area_codes.go:113-126 villagetr branch: td triples — code is
        # td[0], name td[2] (the i%3 pairing, per-row form)
        ExtractRule(
            rule="村",
            kind="css",
            item_pattern="tr.villagetr",
            fields=_FIELDS,
            field_css=(
                ("名称", "td@eq(2)@text"),
                ("代码", "td@eq(0)@text"),
            ),
            const_fields=(("级别", "2"),),
            temp_fields=("上级",),
        ),
    ),
)


def _index_url() -> str:
    return canonicalize_url(f"http://{HOST}/2018/index.html")


def _province_url(p: int) -> str:
    return canonicalize_url(f"http://{HOST}/prov/{p}.html")


def _city_url(p: int, c: int) -> str:
    return canonicalize_url(f"http://{HOST}/city/{p}0{c}.html")


def _index_body() -> bytes:
    cells = "".join(
        f'<td><a href="/prov/{p}.html">省份{p}</a></td>'
        for p in range(11, 11 + N_PROVINCES)
    )
    return (
        "<html><body><table>"
        f'<tr class="provincetr">{cells}</tr>'
        "</table></body></html>"
    ).encode()


def _province_body(p: int) -> bytes:
    rows = "".join(
        f'<tr class="citytr"><td><a href="/city/{p}0{c}.html">{p}0{c}00000000'
        f'</a></td><td><a href="/city/{p}0{c}.html">城市{p}-{c}</a></td></tr>'
        for c in range(1, 1 + CITIES_PER_PROVINCE)
    )
    return f"<html><body><table>{rows}</table></body></html>".encode()


def _city_body(p: int, c: int) -> bytes:
    rows = "".join(
        f'<tr class="villagetr"><td>{p}0{c}00{v:03d}</td><td>{v % 2 + 1}'
        f"</td><td>村{p}-{c}-{v}</td></tr>"
        for v in range(1, 1 + VILLAGES_PER_CITY)
    )
    return f"<html><body><table>{rows}</table></body></html>".encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _index_url(), "host": HOST, "depth": 0, "status": 200,
            "flaky": False, "content_type": "text/html; charset=utf-8",
            "body": _index_body(), "out_links": [], "image_refs": [],
        }
    ] + [
        {
            "url": _province_url(p), "host": HOST, "depth": 1,
            "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _province_body(p), "out_links": [], "image_refs": [],
        }
        for p in range(11, 11 + N_PROVINCES)
    ] + [
        {
            "url": _city_url(p, c), "host": HOST, "depth": 2,
            "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _city_body(p, c), "out_links": [], "image_refs": [],
        }
        for p in range(11, 11 + N_PROVINCES)
        for c in range(1, 1 + CITIES_PER_PROVINCE)
    ]
    seeds = [
        {
            "spider": "area_codes",
            "url": _index_url(),
            "rule": "省",
            "priority": 0,
            "temp": {"上级": "0"},
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
            "areacodes-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), AREA_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("rule", "url").collect():
            print(r.rule, r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/areacodes-run")
