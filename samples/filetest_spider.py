"""Sample spider: the reference's file-download test ported 1:1
(`sample/static_rules/filetest/filetest.go`).

The reference spider (filetest.go:38-67):

* Root AddQueues two URLs — a PNG routed to rule "百度图片" and an
  extension-less project page routed to rule "Pholcus页面"
* "百度图片"'s ParseFunc is just ``ctx.FileOutput("baidu")`` — collect
  the raw body as a FileCell named ``baidu`` + the URL's extension
  (→ ``baidu.png``, context.go:259-279)
* "Pholcus页面"'s is ``ctx.FileOutput()`` — URL-derived name, and with
  no extension anywhere the default ``.html`` applies (→ ``pholcus.html``)

Maps onto the DSL as:

* two seeds, one per AddQueue, each naming its rule directly
* ``file_rules=(FileRule("百度图片", "baidu"), FileRule("Pholcus页面"))``
  — matched fetches bypass page parsing and land raw in the typed
  ``files`` table (spider, rule, url, name, bytes, size)
* ``sinks.export_files`` then writes the reference's on-disk layout
  ``FileDir/FNR(namespace)/<name>`` (output_file.go:20-73)

Run: ``python samples/filetest_spider.py /tmp/filetest-run``
"""

from __future__ import annotations

import sys

from pholcus_spark import fixtures, sinks
from pholcus_spark.catalog import SnapshotCatalog
from pholcus_spark.engine import CrawlEngine, EngineConfig
from pholcus_spark.fetch import FixtureFetcher
from pholcus_spark.session import build_spark
from pholcus_spark.spiderspec import FileRule, LinkRule, SpiderSpec

FILETEST_SPIDER = SpiderSpec(
    "文件下载测试",
    link_rules=(
        LinkRule("/img/", "百度图片", priority=0),
        LinkRule("/andeya/", "Pholcus页面", priority=0),
    ),
    item_rules=(),
    image_rule="__unused__",  # FileOutput, not the typed image pipeline
    file_rules=(
        FileRule("百度图片", "baidu"),  # ctx.FileOutput("baidu")
        FileRule("Pholcus页面"),  # ctx.FileOutput()
    ),
)

PNG_URL = "http://www.baidu.test/img/bd_logo1.png"
DOC_URL = "http://github.test/andeya/pholcus"
PNG_BODY = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
DOC_BODY = b"<html><body>Pholcus project page</body></html>"


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": PNG_URL,
            "host": "www.baidu.test",
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": "image/png",
            "body": PNG_BODY,
            "out_links": [],
            "image_refs": [],
        },
        {
            "url": DOC_URL,
            "host": "github.test",
            "depth": 0,
            "status": 200,
            "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": DOC_BODY,
            "out_links": [],
            "image_refs": [],
        },
    ]
    seeds = [
        {"spider": "文件下载测试", "url": PNG_URL, "rule": "百度图片",
         "priority": 0},
        {"spider": "文件下载测试", "url": DOC_URL, "rule": "Pholcus页面",
         "priority": 0},
    ]
    robots = [
        {"host": "www.baidu.test", "disallow_prefixes": [],
         "crawl_delay_ms": None},
        {"host": "github.test", "disallow_prefixes": [],
         "crawl_delay_ms": None},
    ]
    return fixtures.Corpus(
        pages=pages, images=[], images_truth=[], seeds=seeds, robots=robots
    )


def run(workdir: str, spark=None):
    owns_spark = spark is None
    if spark is None:
        spark = build_spark("filetest-spider", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), FILETEST_SPIDER, robots,
        EngineConfig(wave_window_ms=6000),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    files = catalog.read("files")
    sinks.export_files(files, f"{workdir}/filedir")
    if owns_spark:
        for r in files.select("rule", "url", "name", "size").collect():
            print(r.rule, r.name, r.size, r.url)
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/filetest-run")
