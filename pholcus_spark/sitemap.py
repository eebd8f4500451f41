"""Sitemap ingestion — XML sitemaps / sitemap indexes → frontier seeds.

The reference seeds only from rule-authored Root functions; at
web scale the standard bulk seed source is the sitemap protocol
(sitemaps.org; referenced from robots.txt ``Sitemap:`` lines, which the
reference — and our group parser — otherwise ignore). Everything here
is Spark-native and JVM-only:

* ``sitemap_locs`` — extract ``<loc>`` entries from sitemap bodies with
  ``regexp_extract_all`` (pure codegen, no XML library, no Python);
  XML entity escapes in URLs are unescaped the same way both engines
  of the correctness gate do.
* ``fetch_sitemap_urls`` — fetch sitemap URLs through ANY engine
  fetcher, expand ``<sitemapindex>`` indirections up to
  ``max_index_hops``, return one ``raw_url`` row per page ``<loc>`` —
  ready for ``CrawlEngine.seed_urls_df`` (distributed seeding: a
  50M-loc sitemap farm never touches the driver).
* ``robots_sitemap_urls`` — the ``Sitemap:`` lines of a robots.txt
  body (they are global, outside any user-agent group — RFC 9309 §2.3).

Correctness: the parse kernel is oracle-gated (`q_sitemap_parse`,
DuckDB ``regexp_extract_all`` over identically synthesized XML).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOC_RE = r"<loc>\s*([^<]*[^<\s])\s*</loc>"


def _unescape_xml(col: Column) -> Column:
    """The five predefined XML entities + decimal apostrophe — what a
    conforming sitemap writer escapes inside <loc> (sitemaps.org URL
    escaping table). &amp; last so it cannot re-introduce entities."""
    out = col
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&#39;", "'"), ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def sitemap_locs(
    pages: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Sitemap bodies → one row per ``<loc>``:
    ``(sitemap_url, loc, ord, is_index)``.

    ``is_index`` marks entries of a ``<sitemapindex>`` (their locs are
    nested sitemaps to fetch, not pages to crawl); ``ord`` is the
    document-order position within its sitemap. All whole-stage
    codegen: binary→string cast (UTF-8), one regexp_extract_all, one
    posexplode."""
    text = F.col(body_col).cast("string")
    locs = F.regexp_extract_all(text, F.lit(_LOC_RE), F.lit(1))
    return (
        pages.select(
            F.col(url_col).alias("sitemap_url"),
            (F.instr(text, "<sitemapindex") > 0).alias("is_index"),
            F.posexplode(locs).alias("ord", "_raw_loc"),
        )
        .select(
            "sitemap_url",
            _unescape_xml(F.col("_raw_loc")).alias("loc"),
            F.col("ord").cast("long").alias("ord"),
            "is_index",
        )
    )


def robots_sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` lines from one robots.txt body — global directives,
    valid anywhere in the file (RFC 9309 §2.3), so no group logic."""
    out = []
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def fetch_sitemap_urls(
    spark,
    fetcher,
    sitemap_urls: DataFrame,
    max_index_hops: int = 2,
) -> DataFrame:
    """Fetch sitemaps (through any engine fetcher), follow
    ``<sitemapindex>`` indirections up to ``max_index_hops``, and
    return the page locs as ``(raw_url, _ord)`` — the exact input
    :meth:`CrawlEngine.seed_urls_df` takes.

    Each hop is one batched fetch stage over the CURRENT level's
    sitemap URLs (an index farm fans out level by level, like the
    crawl's own supersteps); failed or empty sitemaps contribute
    nothing (permissive, like absent robots). ``_ord`` preserves
    (sitemap_url, document order) determinism via a hash of the parent
    — FIFO within one sitemap, stable across runs."""
    level = sitemap_urls.select(F.col("raw_url").alias("url")).distinct()
    pages_out = None
    for _hop in range(max_index_hops + 1):
        wave = level.select(
            "url",
            F.lit("GET").alias("method"),
            F.lit("").alias("post_data"),
            F.lit(0).alias("tries"),
        )
        fetched = fetcher.fetch(wave)
        ok = fetched.where(F.col("ok")).select("url", "body")
        locs = sitemap_locs(ok, url_col="url", body_col="body")
        pages = locs.where(~F.col("is_index")).select(
            F.col("loc").alias("raw_url"),
            # stable order: (parent hash, in-document position)
            (
                (F.abs(F.xxhash64("sitemap_url")) % F.lit(1 << 40))
                * F.lit(1 << 20)
                + F.col("ord")
            ).alias("_ord"),
        )
        pages_out = (
            pages if pages_out is None else pages_out.unionByName(pages)
        )
        nxt = locs.where(F.col("is_index")).select(
            F.col("loc").alias("url")
        ).distinct()
        level = nxt
        if _hop == max_index_hops or nxt.isEmpty():
            break
    return pages_out
