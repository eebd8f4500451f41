"""Sample spider: the reference IJGUC journal rule re-expressed
Spark-first (`sample/static_rules/IJGUC/IJGUC.go`).

The reference flow:

* "期刊列表" (IJGUC.go:52-65): ``for i := 1..7`` over the
  ``#eventbody{i} a`` ids, every href → "文章列表".
* "文章列表" (IJGUC.go:67-86): the triple-nested ordinal walk —
  td Each keeps ``i == 1`` (2nd td), inner table Each keeps ``j == 1``
  (2nd table), its anchors Each keeps ``k%2 == 0`` (every 2nd) →
  "文章页".
* "文章页" (IJGUC.go:88-158): ``#col1`` text, tag-stripped, then a
  ladder of ``Label:(.*?)NextLabel:`` regexes into the seven columns —
  with the Author/Addresses fallback pair (``Addresses:`` vs
  ``Address:``) and the DOI rune-slice.

Spark-first mapping:

* the id loop — one selector GROUP
  (``#eventbody1 a, #eventbody2 a, ...``).
* the ordinal walk — ``td:nth-child(2) table:nth-child(2) a`` as the
  container plus ``item_slice=(0, None, 2)`` for ``k%2 == 0``.
* the label ladder — every column reads the same ``#col1@text``
  projection with a per-field ``regex_find``; the Address(es)
  fallback pair collapses into ``Address(?:es)?:`` alternations.
  One declared simplification: the reference's DOI rune arithmetic
  (``left = idx-8; right = left+43``) becomes
  ``regex_find("DOI: (\\S+)")`` — the token itself, without the
  3 leading junk runes the Go slice happens to include.

Run: ``python samples/ijguc_spider.py /tmp/ijguc-run``
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

HOST = "www.inderscience.test"
N_ISSUES = 3          # of the 7 eventbody slots, how many carry links
ARTICLES_PER_ISSUE = 2  # kept anchors per issue page (k%2==0)

_COL1 = "#col1@text"


def _label(pat: str) -> tuple:
    return (("regex_sub", r"<[\S\s]+?>", ""), ("regex_find", pat, 1))


IJGUC_SPIDER = SpiderSpec(
    "IJGUC",
    link_rules=(
        LinkRule("/toc/", "文章列表", priority=0),
        LinkRule("/article/", "文章页", priority=0),
    ),
    item_rules=(),
    follow_anchors=False,
    extract_rules=(
        # IJGUC.go:52-65: the 1..7 id loop as one selector group
        ExtractRule(
            rule="期刊列表",
            kind="css",
            item_pattern=", ".join(f"#eventbody{i} a" for i in range(1, 8)),
            fields=("url",),
            field_css=(("url", "@href"),),
            require_fields=("url",),
            link_fields=("url",),
            emit=False,
        ),
        # IJGUC.go:67-86: td Eq(1) → table Eq(1) → every 2nd anchor
        ExtractRule(
            rule="文章列表",
            kind="css",
            item_pattern=(
                "#journalcol1 article table tbody tr "
                "td:nth-child(2) table:nth-child(2) a"
            ),
            fields=("url",),
            field_css=(("url", "@href"),),
            item_slice=(0, None, 2),
            require_fields=("url",),
            link_fields=("url",),
            emit=False,
        ),
        # IJGUC.go:88-158: the label ladder over #col1
        ExtractRule(
            rule="文章页",
            kind="css",
            item_pattern="body",
            fields=(
                "Title", "Author", "Addresses", "Journal", "Abstract",
                "Keywords", "DOI",
            ),
            field_css=tuple(
                (f, _COL1)
                for f in (
                    "Title", "Author", "Addresses", "Journal",
                    "Abstract", "Keywords", "DOI",
                )
            ),
            field_transforms=(
                ("Title", _label(r"Title:(.*?)Author:")),
                ("Author", _label(r"Author:(.*?)Address(?:es)?:")),
                ("Addresses", _label(r"Address(?:es)?:(.*?)Journal:")),
                ("Journal", _label(r"Journal:(.*?)Abstract:")),
                ("Abstract", _label(r"Abstract:(.*?)Keywords:")),
                ("Keywords", _label(r"Keywords:(.*?)DOI:")),
                ("DOI", (
                    ("regex_sub", r"<[\S\s]+?>", ""),
                    ("regex_find", r"DOI: (\S+)", 1),
                )),
            ),
        ),
    ),
)


def _index_url() -> str:
    return canonicalize_url(
        f"http://{HOST}/info/inarticletoc.php?jcode=ijguc&year=2016"
        "&vol=7&issue=1"
    )


def _toc_url(i: int) -> str:
    return canonicalize_url(f"http://{HOST}/toc/{i}.php")


def _article_url(i: int, k: int) -> str:
    return canonicalize_url(f"http://{HOST}/article/{i}-{k}.php")


def _index_body() -> bytes:
    divs = "".join(
        f'<div id="eventbody{i}"><a href="/toc/{i}.php">Issue {i}</a></div>'
        for i in range(1, N_ISSUES + 1)
    ) + "".join(  # empty slots 4..7, plus a hrefless anchor
        f'<div id="eventbody{i}"><a>tba</a></div>'
        for i in range(N_ISSUES + 1, 8)
    )
    return f"<html><body>{divs}</body></html>".encode()


def _toc_body(i: int) -> bytes:
    # td 1: decoy anchors; td 2: table 1 decoy, table 2 the article
    # list where EVEN ordinals are title links and odd are PDF links
    anchors = "".join(
        f'<a href="/article/{i}-{k}.php">Art {i}-{k}</a>'
        f'<a href="/pdf/{i}-{k}.pdf">PDF</a>'
        for k in range(ARTICLES_PER_ISSUE)
    )
    html = (
        '<html><body><div id="journalcol1"><article><table><tbody><tr>'
        '<td><a href="/decoy/x">decoy</a></td>'
        "<td><table><tr><td><a href=\"/decoy/y\">toc head</a></td></tr>"
        f"</table><table><tr><td>{anchors}</td></tr></table></td>"
        "</tr></tbody></table></article></div></body></html>"
    )
    return html.encode()


def _article_body(i: int, k: int) -> bytes:
    html = (
        '<html><body><div id="col1">'
        f"Title: Grid Paper {i}-{k} Author: A. Researcher{k} "
        f"{'Addresses' if k % 2 else 'Address'}: Univ {i} "
        f"Journal: IJGUC Vol 7 Abstract: We study topic {i}-{k}. "
        f"Keywords: grid; utility DOI: 10.1504/IJGUC.2016.{i}{k:03d}"
        "</div></body></html>"
    )
    return html.encode()


def build_corpus() -> fixtures.Corpus:
    pages = [
        {
            "url": _index_url(), "host": HOST, "depth": 0, "status": 200,
            "flaky": False, "content_type": "text/html; charset=utf-8",
            "body": _index_body(), "out_links": [], "image_refs": [],
        }
    ] + [
        {
            "url": _toc_url(i), "host": HOST, "depth": 1, "status": 200,
            "flaky": False, "content_type": "text/html; charset=utf-8",
            "body": _toc_body(i), "out_links": [], "image_refs": [],
        }
        for i in range(1, N_ISSUES + 1)
    ] + [
        {
            "url": _article_url(i, k), "host": HOST, "depth": 2,
            "status": 200, "flaky": False,
            "content_type": "text/html; charset=utf-8",
            "body": _article_body(i, k), "out_links": [], "image_refs": [],
        }
        for i in range(1, N_ISSUES + 1)
        for k in range(ARTICLES_PER_ISSUE)
    ]
    seeds = [
        {
            "spider": "IJGUC",
            "url": _index_url(),
            "rule": "期刊列表",
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
            "ijguc-spider", parallelism=8, shuffle_partitions=8
        )
        spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    pages, _imgs, _truth, _seeds, robots = fixtures.to_spark(spark, corpus)
    catalog = SnapshotCatalog(workdir, spark)
    engine = CrawlEngine(
        spark, catalog, FixtureFetcher(pages), IJGUC_SPIDER, robots,
        EngineConfig(wave_window_ms=6000, commit_every=3),
    )
    engine.seed(corpus.seeds)
    state = engine.run()
    if owns_spark:
        for r in catalog.read("items").orderBy("url").collect():
            print(r.url, dict(r.data))
    return catalog, state


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ijguc-run")
