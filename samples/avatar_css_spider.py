"""Sample spider: the reference's qq_avatar rule ported 1:1 with CSS
selectors (`sample/static_rules/qq_avatar/avatar.go`).

The reference rule (avatar.go:86-108):

* rule "搜索结果" with ItemFields ["avatar", "nickname"]
* ``query.Find(".txList").Each(...)`` — one result card per selection
* ``selection.Find("a.img>img").First().Attr("src")`` → avatar URL
* ``selection.Find("p>a").Text()`` → nickname
* ``ctx.AddQueue(&request.Request{URL: src, Rule: "下载文件"})`` —
  the selected avatar URL is enqueued for download

Maps onto the DSL as:

* ``ExtractRule(kind="css")`` with the SAME selectors —
  ``item_pattern=".txList"``, ``field_css`` projections
  ``a.img > img@src`` / ``p > a@text``
* ``link_fields=("avatar",)`` — the extracted src values are enqueued
  as child requests (the AddQueue-from-rule-data surface), routed to
  the image rule by ``LinkRule("/img/", ...)``
* ctx.FileOutput → the typed images table, decode-validated

Run: ``python samples/avatar_css_spider.py /tmp/avatar-run``
"""

from __future__ import annotations

import sys

import numpy as np

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.imaging import encode_png, synth_pixels
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

AVATAR_SPIDER = SpiderSpec(
    "qq_avatar",
    link_rules=(
        LinkRule("/s/", "搜索结果", priority=0),
        LinkRule("/img/", "下载文件", priority=1),
    ),
    item_rules=(),  # items come from the css ExtractRule, not figures
    image_rule="下载文件",
    extract_rules=(
        ExtractRule(
            rule="搜索结果",
            kind="css",
            item_pattern=".txList",
            fields=("avatar", "nickname"),
            field_css=(("avatar", "a.img > img@src"), ("nickname", "p > a@text")),
            link_fields=("avatar",),
        ),
    ),
)

HOST = "avatar.test"


def build_corpus(n_avatars: int = 6) -> fixtures.Corpus:
    """A tiny avatar-search site in the reference markup shape: one
    search-result page of ``.txList`` cards + the avatar PNGs."""
    rng = np.random.default_rng(7)
    cards, pages = [], []
    for i in range(n_avatars):
        image_id = f"av-{i:03d}"
        iurl = f"http://{HOST}/img/{image_id}.png"
        px = synth_pixels(rng, 24, 24)
        cards.append(
            f'<div class="txList"><a class="img"><img src="{iurl}"></a>'
            f"<p><a>nick {i}</a></p></div>"
        )
        pages.append(
            {
                "url": iurl,
                "host": HOST,
                "depth": 1,
                "status": 200,
                "flaky": False,
                "content_type": "image/png",
                "body": encode_png(px),
                "out_links": [],
                "image_refs": [image_id],
            }
        )
    body = (
        '<html><head><meta charset="utf-8"></head><body>'
        + "".join(cards)
        + "</body></html>"
    ).encode()
    pages.insert(
        0,
        {
            "url": f"http://{HOST}/s/0",
            "host": HOST,
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": body,
            "out_links": [],  # no anchors route anywhere: children come
            "image_refs": [],  # solely from link_fields (AddQueue)
        },
    )
    seeds = [
        {"spider": "qq_avatar", "url": f"http://{HOST}/s/0", "rule": "搜索结果",
         "priority": 0}
    ]
    robots = [{"host": HOST, "disallow_prefixes": [], "crawl_delay_ms": None}]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None, n_avatars: int = 6):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("avatar-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus(n_avatars)
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), AVATAR_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=2),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for t in ("url_seen", "items", "images"):
            df = catalog.read(t)
            print(t, df.count() if df is not None else 0)
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/avatar-run")
