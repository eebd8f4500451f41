"""Sample spider: the reference weibo_fans rule re-expressed
Spark-first (`sample/static_rules/weibo_fans/weibo_fans.go`).

The reference flow:

* Root (weibo_fans.go:40-73): the keyin is ``"ID::Cookie"``; a driver
  loop AddQueues up to 250 fans-list pages, EACH carrying the
  keyin-sourced session cookie as a request header
  (``Header: http.Header{"Cookie": {cookie}}``, weibo_fans.go:62).
* "好友列表" (weibo_fans.go:77-112): per ``.follow_list .mod_info``
  block — name/href/certified flag via attr probes,
  关注/粉丝/微博 via ``Find(".info_connect em a").Eq(0/1/2)``,
  the uid derived from the href by string replaces, the profile URL
  assembled from the uid, and the WHOLE partial row rides ``Temp``
  into the profile request. Outputs nothing.
* "好友资料" (weibo_fans.go:109-151): ``.li_1`` title/detail pairs
  merged with the six carried temps, one Output per fan.

Spark-first mapping:

* the Root loop — ``engine.seed_range(..., temp={"hdr:Cookie": c})``:
  the page range is generated EXECUTOR-side (``spark.range`` +
  ``format_string``; the reference's 250-iteration driver loop would
  be a 10^10-row driver list at web scale) and the cookie rides every
  generated request as an ``hdr:`` temp, which ``fetch.headers_col``
  merges into the wire headers JVM-side.
* the cookie chain — the list rule re-carries ``hdr:Cookie`` to its
  profile children (``temp_fields`` merge + ``carry_fields`` re-carry,
  the shunfenghaitao multi-hop idiom), so every profile fetch passes
  the cookie wall too. The fixture gates ALL pages on the header
  (``require_header``), modeling the login wall.
* ``.Eq(0/1/2)`` — ``@eq(n)`` projection segments; ``strconv``-free.
* uid/url derivation — ``field_transforms`` replace/regex_sub chains
  (the strings.ReplaceAll pair, weibo_fans.go:85-87); the certified
  flag's attr-presence test is a ``regex_sub("^.+$", "认证")``.
* Deprive2 on the profile pairs — whitespace-strip ``regex_sub``.

Documented deviations: the profile page's dynamic attribute keys
(``UpsertItemField``, weibo_fans.go:142-145) are projected as two
declared fields (the fixture's 性别/所在地) — the relational model
declares its columns; the profile URL drops the reference's
``?mod=pedit_more`` decoration.

Run: ``python samples/weibo_fans_spider.py /tmp/weibo-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

HOST = "weibo.test"
KEYIN = "1234::sid=s3cret"  # the reference's "ID"::"Cookie" format
N_PAGES = 3
FANS_PER_PAGE = 2

WEIBO_SPIDER = SpiderSpec(
    "weibo_fans",
    link_rules=(LinkRule("/p/100505", "好友资料", priority=1),),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # weibo_fans.go:77-108 好友列表: per-fan partials, profile URL
        # derived from the href, everything rides Temp; Outputs nothing
        ExtractRule(
            rule="好友列表",
            kind="css",
            item_pattern=".follow_list .mod_info",
            fields=("好友名", "好友ID", "认证", "关注", "粉丝", "微博",
                    "详情页"),
            field_css=(
                ("好友名", ".info_name a@title"),
                ("好友ID", ".info_name a@href"),
                ("认证", ".info_name i@title"),
                ("关注", ".info_connect em a@eq(0)@text"),
                ("粉丝", ".info_connect em a@eq(1)@text"),
                ("微博", ".info_connect em a@eq(2)@text"),
                ("详情页", ".info_name a@href"),
            ),
            field_transforms=(
                # uid := ReplaceAll(url, "/u", ""); ReplaceAll(uid, "/", "")
                ("好友ID", (("replace", "/u", ""), ("replace", "/", ""))),
                # url := "http://weibo.com/p/100505" + uid + "/info..."
                ("详情页", (
                    ("replace", "/u", ""),
                    ("replace", "/", ""),
                    ("regex_sub", r"^(.+)$",
                     rf"http://{HOST}/p/100505\1/info"),
                )),
                # `if s.Find(".info_name i").Attr("title").IsSome()`:
                # any non-empty title → the literal flag
                ("认证", (("regex_sub", r"^.+$", "认证"),)),
            ),
            temp_fields=("hdr:Cookie",),  # inherit the session header...
            link_fields=("详情页",),
            carry_fields=(  # ...and re-carry it with the partial row
                "好友名", "好友ID", "认证", "关注", "粉丝", "微博",
                "hdr:Cookie",
            ),
            emit=False,
        ),
        # weibo_fans.go:109-151 好友资料: profile attrs + carried temps
        ExtractRule(
            rule="好友资料",
            kind="css",
            item_pattern="body",
            fields=("好友名", "好友ID", "认证", "关注", "粉丝", "微博",
                    "性别", "所在地"),
            field_css=(
                ("性别", ".li_1@eq(0) .pt_detail@text"),
                ("所在地", ".li_1@eq(1) .pt_detail@text"),
            ),
            field_transforms=(
                # spidercommon.Deprive2 (whitespace strip) on the pairs
                ("性别", (("regex_sub", r"\s+", ""),)),
                ("所在地", (("regex_sub", r"\s+", ""),)),
            ),
            temp_fields=("好友名", "好友ID", "认证", "关注", "粉丝",
                         "微博"),
        ),
    ),
)


def _uid(page: int, j: int) -> str:
    return f"1000{page}{j}"


def _fans_body(page: int) -> bytes:
    blocks = []
    for j in range(FANS_PER_PAGE):
        uid = _uid(page, j)
        cert = '<i title="微博个人认证"></i>' if j == 0 else "<i></i>"
        blocks.append(
            f'<div class="mod_info"><div class="info_name">'
            f'<a title="fan-{uid}" href="/u{uid}">fan-{uid}</a>{cert}</div>'
            f'<div class="info_connect">'
            f"<em><a>{page}{j}1</a></em>"
            f"<em><a>{page}{j}2</a></em>"
            f"<em><a>{page}{j}3</a></em>"
            f"</div></div>"
        )
    return (
        '<html><body><div class="follow_list">'
        + "".join(blocks)
        + "</div></body></html>"
    ).encode()


def _profile_body(uid: str) -> bytes:
    return (
        '<html><body>'
        f'<div class="li_1"><span class="pt_title">性别：</span>'
        f'<span class="pt_detail"> {"男" if uid[-1] == "0" else "女"} </span></div>'
        f'<div class="li_1"><span class="pt_title">所在地：</span>'
        f'<span class="pt_detail"> 城市-{uid} </span></div>'
        "</body></html>"
    ).encode()


def build_corpus(cookie: str = "sid=s3cret") -> fixtures.Corpus:
    gate = f"Cookie: {cookie}"  # every page sits behind the login wall

    def page(path, body):
        return {
            "url": f"http://{HOST}{path}",
            "host": HOST,
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": body,
            "out_links": [],
            "image_refs": [],
            "require_header": gate,
        }

    uid_id = KEYIN.split("::")[0]
    pages = [
        page(f"/{uid_id}/fans?page={p}", _fans_body(p))
        for p in range(1, N_PAGES + 1)
    ]
    for p in range(1, N_PAGES + 1):
        for j in range(FANS_PER_PAGE):
            uid = _uid(p, j)
            pages.append(page(f"/p/100505{uid}/info", _profile_body(uid)))
    # conformance seeds: the oracle replays the seed_range output as an
    # explicit list (same URLs, same temp)
    seeds = [
        {
            "spider": "weibo_fans",
            "url": f"http://{HOST}/{uid_id}/fans?page={p}",
            "rule": "好友列表",
            "priority": 0,
            "temp": {"hdr:Cookie": cookie},
        }
        for p in range(1, N_PAGES + 1)
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark(
            "weibo-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    # Root: split the "ID::Cookie" keyin like the reference
    # (weibo_fans.go:41-47), then seed the page range DISTRIBUTED with
    # the cookie riding as an hdr: temp
    uid_id, _, cookie = KEYIN.partition("::")
    corpus = build_corpus(cookie.strip())
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), WEIBO_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed_range(
        f"http://{HOST}/{uid_id.strip()}/fans?page=%d",
        1,
        N_PAGES + 1,
        rule="好友列表",
        spider="weibo_fans",
        temp={"hdr:Cookie": cookie.strip()},
    )
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/weibo-run")
