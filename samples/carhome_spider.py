"""Sample spider: the reference car_home rule re-expressed Spark-first
(`sample/static_rules/car_home/car_home.go`).

The reference flow:

* Root (car_home.go:44-49): one seed —
  ``forum-o-200042-1.html?qaType=-1`` under rule "请求列表" with
  ``Temp{"p": 1}``.
* "请求列表" (car_home.go:53-68): the conditional page walk — if
  ``Find(".pages .cur").Text() != strconv.Itoa(GetTemp("p"))`` the
  rule RETURNS (the site redirected past the last page); else it
  AddQueues page p+1 with ``Temp{"p": p+1}`` and ``ctx.Parse``s the
  list rule.
* "获取列表" (car_home.go:71-84): every ``.list_dl`` row's ``dt a``
  href AddQueued as a detail request at priority 1.
* "输出结果" (car_home.go:86-155): per-profile fields — 当前积分 via
  ``strings.Split(..., "当前积分：")[1]``; 帖子数 via
  ``info.Eq(3).Find("a")`` then ``Split(..., "帖")[0]``; 关注的车 via
  the i>=6 Each loop accumulating anchor titles joined with "|";
  注册时间 via ``info.Eq(4)`` + ``Split(..., "注册：")[1]``; 作者 via
  goquery multi-selection ``Find("a").Text()`` (ALL anchors
  concatenated).

Spark-first mapping (all declarative):

* the conditional walk — a probe ExtractRule with
  ``require_equals=(("cur", "p"),)`` (extracted current-page marker
  must equal the carried Temp) whose next-page URL is DERIVED from the
  marker itself: ``("int_add", 1)`` then prefix/suffix rebuild the
  forum URL (car_home.go:60's ``strconv.Itoa(curr+1)`` splice);
  ``carry_fields=(("pnext", "p"),)`` rides p+1 onto the child.
* 关注的车 — ``li@each(|) a@last@title`` + collapse-empties
  transforms. Two documented fixture-family bounds vs the imperative
  Go loop: (a) Go picks anchor ``Eq(1)`` when a li has >1 anchors,
  else First — ``@last`` is identical for ≤2 anchors per li (the
  shape the real page and this fixture have); (b) Go skips li rows by
  text content ("所属：") and stops at ``.leftimgs`` — here those rows
  simply expose no non-empty ``a@title``, so their join slots are
  empty and the ``regex_sub("\\|{2,}", "|")`` + ``trim("|")`` chain
  collapses them exactly like Go's append-only-nonempty + Trim.
* 作者 — ``a@each()@text``: goquery multi-selection ``.Text()``
  concatenates EVERY matched anchor's text (car_home.go:141).

Run: ``python samples/carhome_spider.py /tmp/carhome-run``
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

HOST = "club.autohome.test"
N_LIST_PAGES = 3  # real forum pages; page 4 redirects back to cur=1
THREADS_PER_PAGE = 2

_FORUM_PREFIX = f"http://{HOST}/bbs/forum-o-200042-"
_FORUM_SUFFIX = ".html?qaType=-1"

CARHOME_SPIDER = SpiderSpec(
    "car_home",
    link_rules=(
        LinkRule("/bbs/forum-", "请求列表", priority=0),
        LinkRule("/bbs/thread-", "输出结果", priority=1),
    ),
    item_rules=(),
    follow_anchors=False,  # the reference enqueues explicitly
    extract_rules=(
        # car_home.go:53-67 — the conditional next-page probe:
        # current-page marker must equal the carried Temp p, the next
        # URL is rebuilt from marker+1, and p+1 rides the child's Temp
        ExtractRule(
            rule="请求列表",
            kind="css",
            item_pattern="body",
            fields=("cur", "pnext", "nxt"),
            field_css=(
                ("cur", ".pages .cur@text"),
                ("pnext", ".pages .cur@text"),
                ("nxt", ".pages .cur@text"),
            ),
            field_transforms=(
                ("pnext", (("int_add", 1),)),
                ("nxt", (
                    ("int_add", 1),
                    ("prefix", _FORUM_PREFIX),
                    ("suffix", _FORUM_SUFFIX),
                )),
            ),
            require_equals=(("cur", "p"),),
            link_fields=("nxt",),
            carry_fields=(("pnext", "p"),),
            emit=False,
        ),
        # car_home.go:71-84 "获取列表" (reached via ctx.Parse on the
        # same fetched page): each .list_dl row's dt a href → detail
        ExtractRule(
            rule="请求列表",
            kind="css",
            item_pattern=".list_dl",
            fields=("durl",),
            field_css=(("durl", "dt a@href"),),
            link_fields=("durl",),
            emit=False,
        ),
        # car_home.go:86-155 "输出结果" — the profile extraction
        ExtractRule(
            rule="输出结果",
            kind="css",
            item_pattern="body",
            fields=("当前积分", "帖子数", "关注的车", "注册时间", "作者"),
            field_css=(
                # Split(Find(".lv-curr").First().Text(), "当前积分：")[1]
                ("当前积分", ".lv-curr@eq(0)@text"),
                # info.Eq(3).Find("a").Text() then Split("帖")[0]
                ("帖子数", ".conleft@eq(0) .leftlist li@eq(3) a@text"),
                # the i>=6 Each loop joining anchor titles with "|"
                ("关注的车", ".conleft@eq(0) .leftlist li@each(|) a@last@title"),
                # info.Eq(4).Text() then Split("注册：")[1]
                ("注册时间", ".conleft@eq(0) .leftlist li@eq(4)@text"),
                # goquery multi-selection Text(): ALL anchors' texts
                ("作者", ".conleft@eq(0) a@each()@text"),
            ),
            field_transforms=(
                ("当前积分", (("split_pick", "当前积分：", 1, None, "empty"),)),
                ("帖子数", (("split_pick", "帖", 0),)),
                ("关注的车", (
                    ("regex_sub", r"\|{2,}", "|"),
                    ("trim", "|"),
                )),
                ("注册时间", (("split_pick", "注册：", 1, None, "empty"),)),
            ),
        ),
    ),
)


def _list_url(p: int) -> str:
    return canonicalize_url(f"{_FORUM_PREFIX}{p}{_FORUM_SUFFIX}")


def _thread_url(p: int, i: int) -> str:
    return canonicalize_url(f"http://{HOST}/bbs/thread-{p}{i}.html")


def _list_body(p: int) -> bytes:
    # page N_LIST_PAGES+1 exists but the site shows cur=1 again (the
    # redirect-past-last-page behavior the reference's guard catches)
    cur = p if p <= N_LIST_PAGES else 1
    rows = "".join(
        f'<dl class="list_dl"><dt><a href="/bbs/thread-{p}{i}.html">'
        f"帖子{p}{i}</a></dt></dl>"
        for i in range(THREADS_PER_PAGE)
    )
    html = (
        '<html><body><div class="pages"><span class="cur">'
        f"{cur}</span></div>{rows}</body></html>"
    )
    return html.encode()


def _thread_body(p: int, i: int) -> bytes:
    n = p * 10 + i
    # .leftlist layout mirroring the real page: 6 stat rows (no titled
    # anchors), then car rows with a@title, a 所属 row whose anchor
    # title is EMPTY (Go skips it by text; here its slot joins empty
    # and collapses), then .leftimgs
    stat_rows = "".join(
        f"<li>统计{j}</li>" for j in range(3)
    ) + (
        f'<li>回复 <a href="/u/{n}">{n * 3}帖子</a></li>'
        f"<li>注册：2015-{(n % 12) + 1:02d}-01</li>"
        "<li>地址：北京</li>"
    )
    car_rows = (
        f'<li><a href="/car/1" title="车型A{n}">A</a></li>'
        '<li>所属：<a href="/brand/x" title="">品牌</a></li>'
        f'<li><a href="/car/2">文字</a>'
        f'<a href="/car/3" title="车型B{n}">B</a></li>'
    )
    html = (
        "<html><body>"
        f'<div class="lv-curr">等级 当前积分：{n * 7}</div>'
        '<div class="conleft">'
        f'<a href="/space/{n}">用户{n}</a>'
        f'<ul class="leftlist">{stat_rows}{car_rows}'
        '<li class="leftimgs"><img src="/x.png"></li></ul>'
        "</div>"
        '<div class="conleft">decoy second conleft <a>ignored</a></div>'
        "</body></html>"
    )
    return html.encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _list_url(p),
            "host": HOST,
            "depth": p - 1,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _list_body(p),
            "out_links": [],
            "image_refs": [],
        }
        for p in range(1, N_LIST_PAGES + 2)
    ] + [
        {
            "url": _thread_url(p, i),
            "host": HOST,
            "depth": p,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _thread_body(p, i),
            "out_links": [],
            "image_refs": [],
        }
        for p in range(1, N_LIST_PAGES + 1)
        for i in range(THREADS_PER_PAGE)
    ]
    seeds = [
        {
            "spider": "car_home",
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
            "carhome-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), CARHOME_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/carhome-run")
