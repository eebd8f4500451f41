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

__all__ = [
    "pair_filter",
    "caption_dedup",
    "pair_phash_neardup",
    "aspect_bucket",
    "DEFAULT_ASPECT_BUCKETS",
    "shard_pairs",
    "shard_manifest",
    "write_webdataset",
    "read_webdataset",
]

# SDXL-style aspect-ratio buckets (w, h): square plus landscape/
# portrait steps out to ~2.2:1 — batches are formed per bucket so
# every sample in a batch shares one crop shape
DEFAULT_ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (512, 512),
    (576, 448),
    (448, 576),
    (640, 384),
    (384, 640),
    (704, 320),
    (320, 704),
)


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


def aspect_bucket(
    pairs: DataFrame,
    buckets: tuple[tuple[int, int], ...] = DEFAULT_ASPECT_BUCKETS,
) -> DataFrame:
    """Assign every image to the training bucket with the closest
    aspect ratio (SDXL-style aspect-ratio bucketed batching: each batch
    draws from ONE bucket so all samples share a crop shape).

    Adds ``bucket_id`` (index into ``buckets``), ``bucket_w``,
    ``bucket_h``. Pure per-row JVM fold over a literal bucket array —
    zero shuffle, zero UDF; downstream batch formation is then a single
    ``repartition("bucket_id")``.

    INTEGER-exact argmin: comparing |w/h − bw_i/bh_i| across buckets is
    done on the common scale L = lcm(bh_i):

        dist_i = |w·bh_i − bw_i·h| · (L / bh_i)

    (the shared 1/(h·L) factor cancels), so the choice is bit-exact in
    any engine — no float log-aspect anywhere, and the DuckDB oracle
    replays the same integers. Ties pick the lowest bucket index
    (strictly-less fold keeps the first)."""
    import math

    L = math.lcm(*[bh for _bw, bh in buckets])
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(bw).cast("long").alias("bw"),
                F.lit(bh).cast("long").alias("bh"),
                F.lit(L // bh).cast("long").alias("m"),
            )
            for i, (bw, bh) in enumerate(buckets)
        ]
    )
    w = F.col("w").cast("long")
    h = F.col("h").cast("long")
    best = F.aggregate(
        arr,
        F.struct(
            F.lit(-1).alias("i"), F.lit(1 << 62).cast("long").alias("d")
        ),
        lambda acc, b: F.when(
            F.abs(w * b["bh"] - b["bw"] * h) * b["m"] < acc["d"],
            F.struct(
                b["i"].alias("i"),
                (F.abs(w * b["bh"] - b["bw"] * h) * b["m"]).alias("d"),
            ),
        ).otherwise(acc),
    )
    dims = F.array(
        *[
            F.struct(F.lit(bw).alias("bw"), F.lit(bh).alias("bh"))
            for bw, bh in buckets
        ]
    )
    out = pairs.withColumn("_best", best)
    return (
        out.withColumn("bucket_id", F.col("_best.i"))
        .withColumn("bucket_w", F.element_at(dims, F.col("bucket_id") + 1)["bw"])
        .withColumn("bucket_h", F.element_at(dims, F.col("bucket_id") + 1)["bh"])
        .drop("_best")
    )


def shard_pairs(
    pairs: DataFrame,
    target_bytes: int = 1 << 30,
    n_buckets: int = 64,
    size: "F.Column | None" = None,
) -> DataFrame:
    """Assign pairs to size-bounded training shards (the WebDataset-
    style ingest prep: a trainer streams whole shards, so shards must
    be ~equal-sized and pre-shuffled).

    Deterministic two-level id: ``bucket`` = portable_hash64(image_id)
    mod ``n_buckets`` (the cross-engine md5 hash, so the DuckDB oracle
    replays it bit-exact), then within a bucket rows are ordered by
    (hash, image_id) — a deterministic pseudo-random interleave, which
    is exactly the pre-shuffle a training loader wants — and
    ``shard_ix`` = floor(running-bytes-before / target_bytes): a plain
    window sum, no sequential fold. Adds ``bucket``, ``shard_ix``,
    ``shard`` ("<bucket>-<shard_ix>") and ``row_bytes``.

    One shuffle (hash on bucket). Scale sizing: a bucket sorts in one
    task, so pick ``n_buckets`` ≈ corpus_bytes / (a few GB) the same
    way the body store sizes its buckets; shards stay ~``target_bytes``
    except the one straddling row per boundary (cumulative rule — a
    row lands in the shard its PRECEDING bytes fill, so shards can
    overshoot by at most one row, never undershoot fragmented).

    ``size`` defaults to ``octet_length(bytes) +
    octet_length(caption)`` — pass an expression to shard on metadata
    when the binary column should stay on disk."""
    from ..ops.text import portable_hash64

    if size is None:
        size = F.octet_length("bytes") + F.octet_length("caption")
    h = portable_hash64(F.col("image_id"))
    out = pairs.withColumns(
        {
            "row_bytes": size.cast("long"),
            "bucket": F.pmod(h, F.lit(n_buckets)).cast("int"),
            "_h": h,
        }
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_h", "image_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("row_bytes").over(w), F.lit(0))
    return (
        out.withColumn(
            "shard_ix",
            F.floor(cum_before / F.lit(target_bytes)).cast("int"),
        )
        .withColumn(
            "shard",
            F.concat_ws("-", F.col("bucket"), F.col("shard_ix")),
        )
        .drop("_h")
    )


def shard_manifest(sharded: DataFrame) -> DataFrame:
    """Per-shard manifest for the ingest loader: row count + byte
    total (one hash aggregation over shard_pairs' output)."""
    return sharded.groupBy("bucket", "shard_ix", "shard").agg(
        F.count("*").alias("n_rows"),
        F.sum("row_bytes").alias("total_bytes"),
    )


def write_webdataset(
    sharded: DataFrame,
    out_dir: str,
    fmt_ext: str = "fmt",
) -> None:
    """Export :func:`shard_pairs` output as WebDataset-style tar shards
    (the public convention a multimodal training loader streams: one
    ``.tar`` per shard, each sample as adjacent members
    ``<image_id>.<fmt>`` + ``<image_id>.txt``).

    Scale shape mirrors :func:`~pholcus_spark.sources.warc.write_warc`:
    one shuffle on ``shard``, rows sorted within the partition in the
    shard's deterministic interleave order, and each task STREAMS its
    shards to ``{out_dir}/{shard}.tar`` one member at a time — task
    memory is O(row), and a task owning several shards (hash collision
    of shard ids into one partition) closes one tar before opening the
    next. Member mtimes are pinned to 0 so shard bytes are stable
    across runs (the WARC/gzip determinism rule).

    Requires the ``bytes`` column (this is the one operator in this
    module that exports pixels); run it LAST, after metadata filtering
    has pruned the corpus. A ``fmt`` value of ``txt`` is rejected
    task-side (the image member name would collide with the caption's
    ``<id>.txt`` — a tar with duplicate member names silently loses
    the image on read-back)."""
    import io
    import os
    import tarfile

    from .text import portable_hash64

    rows = sharded.select(
        "shard",
        "image_id",
        F.lower(F.coalesce(F.col(fmt_ext), F.lit("bin"))).alias("_ext"),
        F.col("bytes"),
        F.encode(F.coalesce(F.col("caption"), F.lit("")), "UTF-8").alias(
            "_cap"
        ),
        portable_hash64(F.col("image_id")).alias("_h"),
    ).repartition(F.col("shard")).sortWithinPartitions("shard", "_h", "image_id")

    def _dump(it):
        tar, cur = None, None
        try:
            for r in it:
                if r["_ext"] == "txt":
                    raise ValueError(
                        f"fmt 'txt' collides with the caption member "
                        f"name for image_id {r['image_id']!r}"
                    )
                if r["shard"] != cur:
                    if tar is not None:
                        tar.close()
                    os.makedirs(out_dir, exist_ok=True)
                    cur = r["shard"]
                    tar = tarfile.open(f"{out_dir}/{cur}.tar", "w")
                for name, data in (
                    (f"{r['image_id']}.{r['_ext']}", bytes(r["bytes"])),
                    (f"{r['image_id']}.txt", bytes(r["_cap"])),
                ):
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(data))
        finally:
            if tar is not None:
                tar.close()

    rows.foreachPartition(_dump)


def read_webdataset(spark, path: str) -> DataFrame:
    """Distributed scan of WebDataset tar shards back into the pair
    shape ``(shard, image_id, fmt, bytes, caption)`` — the
    :func:`write_webdataset` inverse and the loader-side ingest scan.

    Same scale shape as the WARC source: ``binaryFile`` gives one task
    per shard tar (shards are sized by ``shard_pairs`` exactly so that
    per-file parallelism is enough), members are split inside
    ``mapInPandas`` (python framing walk over Arrow-delivered bytes,
    no per-member UDF calls). Adjacent ``<id>.<ext>`` + ``<id>.txt``
    members pair up; a caption-less image yields an empty caption."""
    import io
    import os
    import tarfile

    import pandas as pd

    def split(batches):
        for pdf in batches:
            rows = []
            for fpath, data in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(fpath)
                if shard.endswith(".tar"):
                    shard = shard[:-4]
                # insertion-ordered dict doubles as the member order
                samples: dict[str, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(data))) as t:
                    for m in t:
                        if not m.isfile():
                            continue
                        iid, _, ext = m.name.rpartition(".")
                        if not iid:
                            continue
                        s = samples.setdefault(iid, {})
                        if ext == "txt":
                            s["caption"] = (
                                t.extractfile(m).read().decode(errors="replace")
                            )
                        else:
                            s["fmt"] = ext
                            s["bytes"] = t.extractfile(m).read()
                for iid, s in samples.items():
                    rows.append(
                        (
                            shard,
                            iid,
                            s.get("fmt", ""),
                            s.get("bytes", b""),
                            s.get("caption", ""),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["shard", "image_id", "fmt", "bytes", "caption"]
            )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(
        split,
        "shard string, image_id string, fmt string, bytes binary, "
        "caption string",
    )


def pair_phash_neardup(pairs: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Perceptual near-duplicate image pairs by phash banding +
    popcount verify — delegates to multimodal.phash_neardup_pairs (the
    engine-side image near-dup operator) over the pair table's phash
    column. Returns (id_a, id_b, hamming)."""
    from .multimodal import phash_neardup_pairs

    return phash_neardup_pairs(pairs, max_hamming=max_hamming)
