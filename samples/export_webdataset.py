"""Sample pipeline: crawl → validated image+caption table → WebDataset
training shards — the end-to-end north-rule path.

The crawl engine's ``images`` table already has the pair-table shape
``(image_id, bytes, w, h, fmt, caption, phash, ...)``, so the curation
operators compose directly on the catalog output:

1. crawl (here the network-free gallery sample — any spider works);
2. ``pair_filter`` — size/aspect/caption sanity, metadata-only (the
   binary column stays on disk until the export);
3. ``caption_dedup`` — one survivor per normalized caption;
4. ``shard_pairs`` — deterministic pre-shuffled, size-bounded shards;
5. ``write_webdataset`` — one tar per shard, ``<id>.<fmt>`` +
   ``<id>.txt`` members, byte-stable archives a training loader
   streams.

Run (PYTHONPATH stands in for spark-submit's --py-files):

    PYTHONPATH=.:samples python samples/export_webdataset.py /tmp/wds-pipeline
"""

from __future__ import annotations

import sys


def run(workdir: str, spark=None, target_bytes: int = 1 << 20):
    import os

    from image_gallery_spider import run as crawl

    from pholcus_spark.ops.imagecaption import (
        caption_dedup,
        pair_filter,
        read_webdataset,
        shard_pairs,
        write_webdataset,
    )

    owns_spark = spark is None
    if spark is None:
        from pholcus_spark.session import build_spark

        spark = build_spark("wds-pipeline", parallelism=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

    catalog, state = crawl(os.path.join(workdir, "crawl"), spark=spark)
    pairs = catalog.read("images")
    # fixture images are small: relax the size floor, keep the rest
    curated = caption_dedup(pair_filter(pairs, min_w=16, min_h=16))
    sharded = shard_pairs(
        curated, target_bytes=target_bytes, n_buckets=4
    )
    out = os.path.join(workdir, "shards")
    write_webdataset(sharded, out)
    if owns_spark:
        n = read_webdataset(spark, out).count()
        print("pairs:", pairs.count(), "curated:", curated.count(),
              "exported:", n, "dir:", out)
    return out, sharded


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/wds-pipeline")
