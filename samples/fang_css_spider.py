"""Sample spider: the reference's fang.com resell-house rule ported 1:1
(`sample/static_rules/fang_resell_list/fang_resell_list.go`) — the
canonical extract-then-string-munge ParseFunc shape: every field is a
goquery selection followed by Go string surgery
(``strings.Trim/Replace/Split/Fields``) before ``ctx.Output``
(fang_resell_list.go:74-135).

Maps onto the DSL as:

* ``.Children().Eq(n)`` (fang_resell_list.go:106-108) → the universal
  child chain ``"div.area > *@eq(0)@text"`` etc.
* the string surgery → ``ExtractRule.field_transforms``, op for op:

  - ``address``/``business`` split one extracted string into two
    columns (fang_resell_list.go:77-81 ``strings.Split(address, "-")``
    guarded by ``len(sp) == 2``): both fields project the SAME
    ``span.iconAdress`` text, then ``split_pick("-", 1, 2, "keep")``
    vs ``split_pick("-", 0, 2, "empty")`` — exactly the two mismatch
    branches the Go code takes (address keeps the whole string,
    business stays "").
  - the room line (fang_resell_list.go:83-105): ``strings.Fields``
    then positional picks guarded by ``len(roomLine) == 4`` →
    ``fields_pick(i, 4, "empty")`` feeding ``replace``/``split_pick``
    chains (rooms/halls split on ``室`` after stripping ``厅``;
    locationType/totalFloor split on ``(共``; direction strips
    ``|``/``向``; buildTime strips ``|建筑年代：``).
  - unit suffixes (fang_resell_list.go:127-129): ``replace("㎡","",1)``
    / ``replace("万","",1)`` / ``replace("元/㎡","",1)``.
  - ``remoteId`` (fang_resell_list.go:109-114): href split on ``_``,
    part 1, ``.htm`` stripped; a missing href yields "" through the
    same pipeline (the reference's ``IsSome()`` guard).
  - every field ends with ``trim(" ")`` — the ``strings.Trim(x, " ")``
    wrapping every Output value (fang_resell_list.go:121-134).

* Root seeds the listing URL(s) (fang_resell_list.go:38-45; the
  commented-out ``for i`` loop is the multi-page variant — we seed two
  pages the same way).

Run: ``python samples/fang_css_spider.py /tmp/fang-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, SpiderSpec

HOST = "esf.zz.fang.test"

# the room-line pipelines share a prefix: pick word i of 4 (blank when
# the line is degenerate — the reference's len(roomLine) == 4 guard)
_TRIM = ("trim", " ")

FANG_SPIDER = SpiderSpec(
    "resell house of fang.com",
    link_rules=(),  # pure item extraction — no child navigation
    item_rules=(),
    image_rule="下载文件",  # unused
    extract_rules=(
        ExtractRule(
            rule="fang_collection",
            kind="css",
            item_pattern=".houseList dl",
            fields=(
                "communityName", "totalFloor", "rooms", "halls",
                "buildTime", "address", "direction", "area", "price",
                "unitPrice", "locationType", "remoteId", "business",
            ),
            field_css=(
                ("communityName", ".info p.mt10 a span@text"),
                ("address", ".info p.mt10 span.iconAdress@text"),
                # same projection as address — transforms diverge
                ("business", ".info p.mt10 span.iconAdress@text"),
                ("rooms", "dd.info p.mt12@text"),
                ("halls", "dd.info p.mt12@text"),
                ("locationType", "dd.info p.mt12@text"),
                ("totalFloor", "dd.info p.mt12@text"),
                ("direction", "dd.info p.mt12@text"),
                ("buildTime", "dd.info p.mt12@text"),
                # .Children().Eq(n) → universal child chain
                ("area", "dd.info div.area > *@eq(0)@text"),
                ("price", "dd.info div.moreInfo > *@eq(0)@text"),
                ("unitPrice", "dd.info div.moreInfo > *@eq(1)@text"),
                ("remoteId", "dd.info p.title a@href"),
            ),
            field_transforms=(
                ("communityName", (_TRIM,)),
                ("address", (("split_pick", "-", 1, 2, "keep"), _TRIM)),
                ("business", (("split_pick", "-", 0, 2, "empty"), _TRIM)),
                ("rooms", (
                    ("fields_pick", 0, 4, "empty"),
                    ("replace", "厅", "", 1),
                    ("split_pick", "室", 0, 2, "empty"),
                    _TRIM,
                )),
                ("halls", (
                    ("fields_pick", 0, 4, "empty"),
                    ("replace", "厅", "", 1),
                    ("split_pick", "室", 1, 2, "empty"),
                    _TRIM,
                )),
                ("locationType", (
                    ("fields_pick", 1, 4, "empty"),
                    ("split_pick", "(共", 0, 2, "empty"),
                    ("replace", "|", "", 1),
                    _TRIM,
                )),
                ("totalFloor", (
                    ("fields_pick", 1, 4, "empty"),
                    ("split_pick", "(共", 1, 2, "empty"),
                    ("replace", "层)", "", 1),
                    _TRIM,
                )),
                ("direction", (
                    ("fields_pick", 2, 4, "empty"),
                    ("replace", "|", "", 1),
                    ("replace", "向", "", 1),
                    _TRIM,
                )),
                ("buildTime", (
                    ("fields_pick", 3, 4, "empty"),
                    ("replace", "|建筑年代：", "", 1),
                    _TRIM,
                )),
                ("area", (("replace", "㎡", "", 1), _TRIM)),
                ("price", (("replace", "万", "", 1), _TRIM)),
                ("unitPrice", (("replace", "元/㎡", "", 1), _TRIM)),
                ("remoteId", (
                    ("split_pick", "_", 1, None, "empty"),
                    ("replace", ".htm", "", 1),
                    _TRIM,
                )),
            ),
        ),
    ),
)

# (community, biz-addr, roomline, area, price, unitPrice, href) — house
# 1 exercises every mismatch branch: no "-" in the address, a
# degenerate room line, and a missing title href
HOUSES = [
    ("雅居乐花园", "金水-未来路", "3室2厅 高层(共24层) |南向 |建筑年代：2008",
     "89㎡", "95万", "10674元/㎡", "/chushou/3_94028391.htm"),
    ("绿城小区", "郑东新区", "独栋别墅",
     "260㎡", "420万", "16153元/㎡", None),
    ("正商城", "管城-南三环", "2室1厅 低层(共6层) |东北向 |建筑年代：1999",
     "61㎡", "38.5万", "6311元/㎡", "/chushou/3_70211002.htm"),
]


def _dl(house: tuple) -> str:
    name, addr, roomline, area, price, unit, href = house
    title_a = f'<a href="{href}">{name} 出售</a>' if href else f"<a>{name} 出售</a>"
    return (
        "<dl><dd class=\"info\">"
        f'<p class="title">{title_a}</p>'
        f'<p class="mt10"><a><span>{name}</span></a>'
        f'<span class="iconAdress">{addr}</span></p>'
        f'<p class="mt12">{roomline}</p>'
        f'<div class="area"><p>{area}</p><p>建筑面积</p></div>'
        f'<div class="moreInfo"><p class="mt5">{price}</p><p>{unit}</p></div>'
        "</dd></dl>"
    )


def build_corpus(n_pages: int = 2) -> fixtures.Corpus:
    pages, seeds = [], []
    for p in range(1, n_pages + 1):
        url = f"http://{HOST}/house/i3{p}/"
        body = (
            "<html><body><div class=\"houseList\">"
            + "".join(_dl(h) for h in HOUSES)
            + "</div></body></html>"
        ).encode()
        pages.append(
            {
                "url": url, "host": HOST, "depth": 0, "status": 200,
                "flaky": False,
                "content_type": "text/html; charset=utf-8",
                "body": body, "out_links": [], "image_refs": [],
            }
        )
        seeds.append(
            {"spider": FANG_SPIDER.name, "url": url,
             "rule": "fang_collection", "priority": 0}
        )
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None, n_pages: int = 2):
    owns = spark is None
    if owns:
        spark = build_spark("fang-sample", parallelism=8, shuffle_partitions=8)
    corpus = build_corpus(n_pages)
    pages, _images, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), FANG_SPIDER, robots,
        EngineConfig(),
    )
    if catalog.current() is None:
        engine.seed(corpus.seeds)
    state = engine.run()
    if owns:
        items = catalog.read("items")
        print("state:", state)
        print("items:", items.count() if items is not None else 0)
    return state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fang-run")
