"""Sample spider: the reference hollandandbarrett rule re-expressed
Spark-first (`sample/static_rules/hollandandbarrett/hollandandbarrett.go`).

The reference flow:

* "获取版块URL" (hollandandbarrett.go:53-74): every
  ``.footer-links nav.l-one-half a`` href AddQueued as
  ``host + href + "?showAll=1&...&format=json&single=true"`` under
  "获取总数", with ``Temp{"type": title, "baseUrl": href}``.
* "获取总数" (hollandandbarrett.go:77-103): regex-carve
  ``"totalNumRecs":N,`` out of the raw JSON text; when N != "0",
  AddQueue ``host + baseUrl + "?showAll=" + N + ...`` under
  "商品详情" re-carrying the type.
* "商品详情" (hollandandbarrett.go:105-182): json.Unmarshal and walk
  ``contents[0].mainContent[0].records[*].records[0].attributes`` —
  each attribute value prints as a Go slice (``[x]``), bracket-trimmed;
  nil ratingCount defaults to "0"; 分类 = GetTemp("type").

Spark-first mapping: a ``kind="regex"`` count rule with NESTED named
groups (total/next/g capture the same digits — one field builds the
next URL via prefix/suffix + ``temp_prefix baseUrl``, one is blanked
by ``regex_sub ^0$`` to express the N=="0" stop as require_fields);
the deep array walk is gjson numeric ordinals in item/field paths;
the Go ``fmt.Sprint`` bracket trim is ``("trim", '[]"')`` (covers the
JSON-stringified form too).

Run: ``python samples/holland_spider.py /tmp/holland-run``
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

HOST = "www.hollandandbarrett.test"
SECTIONS = (("vitamins", "Vitamins", 3), ("food", "Food", 2),
            ("empty", "Empty", 0))  # (path, type title, record count)

_QS_TAIL = "&pageHa=1&es=true&vm=grid&imd=true&format=json&single=true"

HOLLAND_SPIDER = SpiderSpec(
    "hollandandbarrett",
    link_rules=(
        # probe URLs carry showAll=1; anything else showAll=N (N >= 2)
        # is a detail sweep — first match wins
        LinkRule("showAll=1&", "获取总数", priority=0),
        LinkRule("showAll=", "商品详情", priority=0),
    ),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # hollandandbarrett.go:53-74: footer section links
        ExtractRule(
            rule="获取版块URL",
            kind="css",
            item_pattern=".footer-links nav.l-one-half a",
            fields=("url", "type", "baseUrl"),
            field_css=(
                ("url", "@href"),
                ("type", "@title"),
                ("baseUrl", "@href"),
            ),
            field_transforms=(("url", (("suffix", "?showAll=1" + _QS_TAIL),)),),
            require_fields=("url",),
            link_fields=("url",),
            carry_fields=("type", "baseUrl"),
            emit=False,
        ),
        # hollandandbarrett.go:77-103: the totalNumRecs carve + the
        # N=="0" stop + the showAll=N sweep URL from the carried base
        ExtractRule(
            rule="获取总数",
            kind="regex",
            item_pattern=r'"totalNumRecs":(?P<total>(?P<next>(?P<g>\d+))),',
            fields=("total", "next", "g", "type"),
            field_transforms=(
                ("next", (
                    ("prefix", "?showAll="),
                    ("suffix", _QS_TAIL),
                    ("temp_prefix", "baseUrl"),
                )),
                ("g", (("regex_sub", r"^0$", ""),)),
            ),
            require_fields=("g",),
            temp_fields=("type",),
            link_fields=("next",),
            carry_fields=(("type", "分类"),),
            emit=False,
        ),
        # hollandandbarrett.go:105-182: the deep records walk
        ExtractRule(
            rule="商品详情",
            kind="json",
            item_pattern="contents.0.mainContent.0.records",
            fields=("标题", "原价", "折后价", "打折", "星级", "分类"),
            field_json=(
                ("标题", "records.0.attributes.Name"),
                ("原价", "records.0.attributes.lp"),
                ("折后价", "records.0.attributes.sp"),
                ("打折", "records.0.attributes.prm"),
                ("星级", "records.0.attributes.ratingCount"),
            ),
            field_transforms=(
                ("标题", (("trim", '[]"'),)),
                ("原价", (("trim", '[]"'),)),
                ("折后价", (("trim", '[]"'),)),
                ("打折", (("trim", '[]"'),)),
                ("星级", (("trim", '[]"'), ("default", "0"))),
            ),
            temp_fields=("分类",),
        ),
    ),
)


def _home_url() -> str:
    return canonicalize_url(f"http://{HOST}/")


def _probe_url(path: str) -> str:
    return canonicalize_url(f"http://{HOST}/{path}?showAll=1{_QS_TAIL}")


def _sweep_url(path: str, n: int) -> str:
    return canonicalize_url(f"http://{HOST}/{path}?showAll={n}{_QS_TAIL}")


def _home_body() -> bytes:
    links = "".join(
        f'<nav class="l-one-half"><a href="/{p}" title="{t}">{t}</a></nav>'
        for p, t, _n in SECTIONS
    )
    return (
        f'<html><body><div class="footer-links">{links}</div>'
        "</body></html>"
    ).encode()


def _probe_body(n: int) -> bytes:
    return json.dumps(
        {"meta": {"q": 1}, "totalNumRecs": n, "other": []},
        separators=(",", ":"),
    ).encode()


def _sweep_body(path: str, n: int) -> bytes:
    records = []
    for j in range(n):
        attrs = {
            "Name": [f"{path}-item-{j}"],
            "lp": [f"{j + 3}.49"],
            "sp": [f"{j + 2}.99"],
            "prm": [f"Save {j + 1}0%"] if j % 2 else None,
        }
        if j % 3 != 0:
            attrs["ratingCount"] = [str(j * 5)]
        records.append({"records": [{"attributes": attrs}]})
    doc = {"contents": [{"mainContent": [{"records": records}]}]}
    return json.dumps(doc, separators=(",", ":")).encode()


def build_corpus() -> fixtures.Corpus:
    ct = "application/json"
    pages = [
        {
            "url": _home_url(), "host": HOST, "depth": 0, "status": 200,
            "flaky": False, "content_type": "text/html; charset=utf-8",
            "body": _home_body(), "out_links": [], "image_refs": [],
        }
    ]
    for path, _t, n in SECTIONS:
        pages.append(
            {
                "url": _probe_url(path), "host": HOST, "depth": 1,
                "status": 200, "flaky": False, "content_type": ct,
                "body": _probe_body(n), "out_links": [], "image_refs": [],
            }
        )
        if n:
            pages.append(
                {
                    "url": _sweep_url(path, n), "host": HOST, "depth": 2,
                    "status": 200, "flaky": False, "content_type": ct,
                    "body": _sweep_body(path, n),
                    "out_links": [], "image_refs": [],
                }
            )
    seeds = [
        {
            "spider": "hollandandbarrett",
            "url": _home_url(),
            "rule": "获取版块URL",
            "priority": 0,
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
            "holland-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), HOLLAND_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url.split("/")[3].split("?")[0], dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/holland-run")
