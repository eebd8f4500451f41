"""Image+caption pair curation operators — the LAION/DataComp-style
pass a multimodal training pipeline runs over crawl output.

Input is the north-rule pair table shape
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)`` — exactly what the crawl engine's
``images`` sink emits (engine.py FileOutput rows), so these compose
directly: ``pair_filter(catalog.read("images"))``. Only the columns an
operator actually uses are required (``bytes`` never is — metadata
filtering must not drag gigabytes of pixels through a shuffle; Parquet
column pruning keeps the binary column on disk).

Scale notes:
* ``pair_filter`` is a pure codegen'd filter/project — no shuffle, and
  every predicate pushes into the parquet scan.
* Aspect ratio is published as ``aspect_q4`` = floor(max(w,h) * 10^4 /
  min(w,h)) — INTEGER arithmetic end to end, so the DuckDB oracle is
  bit-exact (a double `round()` here would expose engine rounding-mode
  differences on exact-binary halfway values like 5/32).
* ``caption_dedup`` shuffles once on the caption fingerprint (window
  min, no sort) — the 100 TB-scale shape for exact-dup collapse.
* ``pair_phash_neardup`` reuses the banded pigeonhole join from
  multimodal.phash_neardup_pairs: O(near-dups) candidates, never
  all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import norm_text

__all__ = ["pair_filter", "caption_dedup", "pair_phash_neardup"]


def pair_filter(
    pairs: DataFrame,
    min_w: int = 64,
    min_h: int = 64,
    max_aspect_q4: int = 30_000,
    min_caption_tokens: int = 2,
    max_caption_tokens: int = 128,
) -> DataFrame:
    """Keep pairs whose image is big enough, not degenerately elongated
    (``aspect_q4`` ≤ ``max_aspect_q4``, i.e. aspect ≤ 3.0 by default),
    and whose caption has a sane token count. Adds ``aspect_q4`` and
    ``caption_tokens`` columns; passes everything else through."""
    aspect_q4 = F.expr("(greatest(w, h) * 10000) div greatest(least(w, h), 1)")
    toks = F.size(F.split(F.trim("caption"), r"\s+")).cast("long")
    out = pairs.withColumn("aspect_q4", aspect_q4).withColumn(
        "caption_tokens", toks
    )
    return out.where(
        (F.col("w") >= min_w)
        & (F.col("h") >= min_h)
        & (F.col("aspect_q4") <= max_aspect_q4)
        & (F.col("caption_tokens") >= min_caption_tokens)
        & (F.col("caption_tokens") <= max_caption_tokens)
    )


def caption_dedup(pairs: DataFrame) -> DataFrame:
    """Exact caption dedup: one survivor per normalized-caption
    fingerprint (min image_id — deterministic canonical pick). Adds the
    ``caption_fp`` column. One hash shuffle on the fingerprint; the
    window needs no ORDER BY, so no sort spills at corpus scale."""
    ranked = pairs.withColumn(
        "caption_fp", F.md5(norm_text(F.col("caption")))
    ).withColumn(
        "_min_id",
        F.min("image_id").over(Window.partitionBy("caption_fp")),
    )
    return ranked.where(F.col("image_id") == F.col("_min_id")).drop("_min_id")


def pair_phash_neardup(pairs: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Perceptual near-duplicate image pairs by phash banding +
    popcount verify — delegates to multimodal.phash_neardup_pairs (the
    engine-side image near-dup operator) over the pair table's phash
    column. Returns (id_a, id_b, hamming)."""
    from .multimodal import phash_neardup_pairs

    return phash_neardup_pairs(pairs, max_hamming=max_hamming)
