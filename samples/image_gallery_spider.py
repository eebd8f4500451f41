"""Sample spider: how a reference rule ports to pholcus_spark.

Mirrors the shape of the reference's image-gallery rule
(`sample/static_rules/qq_avatar/avatar.go`):

* **Root + AidFunc page-range loop** (`avatar.go:39-62`: enqueue
  ``index_0..index_n`` from a URL template) → ``engine.seed_range`` —
  the same loop, generated executor-side with ``spark.range``.
* **ParseFunc extraction** (`avatar.go:66-98`: per-page selector pulls
  img src + title, enqueues file downloads) → declarative ``LinkRule``
  routing (image URLs go to the FileOutput-style ``image`` rule) plus a
  user ``ExtractRule`` whose named capture groups are the rule's
  ordered ItemFields (`spider.go:53-58`).
* **ctx.FileOutput** → the typed images table
  ``(image_id, bytes, w, h, fmt, caption, phash, ...)`` written by the
  engine, validated with the Arrow decode+phash UDF (python-sink mode
  writes it inside the body-read task).

Run it (any parquet-capable fetcher works; here the network-free
fixture corpus):

    python samples/image_gallery_spider.py /tmp/gallery-run
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import ExtractRule, LinkRule, SpiderSpec

GALLERY_SPIDER = SpiderSpec(
    "gallery",
    link_rules=(
        LinkRule("/p/", "list", priority=0),     # gallery index pages
        LinkRule("/d/", "detail", priority=1),   # per-image detail pages
        LinkRule("/img/", "image", priority=2),  # binary downloads
    ),
    item_rules=("detail",),
    image_rule="image",
    extract_rules=(
        # ItemFields in declared order, like Rule.ItemFields — the CSV
        # sink emits exactly (href, anchor_text) columns for this rule
        ExtractRule(
            rule="list",
            item_pattern=r'<a href="(?P<href>[^"]*)">(?P<anchor_text>[^<]*)</a>',
            fields=("href", "anchor_text"),
        ),
    ),
)


def run(workdir: str, spark=None, pages=None, robots=None, n_index_pages: int = 3):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("gallery-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    if pages is None:
        corpus = fixtures.generate(
            fixtures.SiteSpec(n_hosts=1, list_pages=5, flaky_rate=0.0,
                              fail_404_rate=0.0)
        )
        pages, _i, _t, _s, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), GALLERY_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=2),
    )
    # the aid-loop: index_0..index_{n-1} from a template, no driver list
    engine.seed_range("http://h000.test/p/%d", 0, n_index_pages, "list", "gallery")
    state = engine.run()
    if owns_spark:
        for t in ("url_seen", "items", "images"):
            df = catalog.read(t)
            print(t, df.count() if df is not None else 0)
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gallery-run")
