"""Partitioned Bloom-filter sidecar for the url_seen set.

The reference keeps its URL-seen set as an in-memory Go hash map
(`app/aid/history/success.go:16-23`) — RAM-bound and single-process.
The north rule scales this to 10^10 keys: the exact membership lives in
the bucketed ``url_seen`` table; a per-bucket Bloom filter sidecar
answers "definitely unseen" without touching the table, so the
per-superstep dedup anti-join probes only candidates × FPR.

Sizing (SURVEY.md §7.3): 10^10 keys at ~10 bits/key ≈ 12.5 GB total,
bucketed ×1024 ≈ 12 MB/bucket — each bucket's filter is built
independently by ``applyInPandas`` over that bucket's partition (no
single-node bottleneck) and the assembled sidecar is broadcast for
executor-side vectorized probing. Filters are grown incrementally with
each superstep's appended keys and fully rebuilt at compaction.

Hash scheme (double hashing, Kirsch–Mitzenmacher): the key is already a
SHA-1 hex string; bucket = first 8 hex digits mod buckets (must match
keys.key_bucket_col), h1/h2 = the next two 64-bit halves,
position_i = (h1 + i·h2) mod m.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


@dataclasses.dataclass
class PartitionedBloom:
    num_buckets: int
    m_bits: int  # bits per bucket filter
    k: int  # hash functions
    bitmaps: dict[int, bytes]  # bucket -> bitmap (m_bits/8 bytes)
    n_keys: int


def _params(n_per_bucket: int, fpp: float) -> tuple[int, int]:
    n = max(n_per_bucket, 64)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(key: str, m: int, k: int) -> np.ndarray:
    # mask to 63 bits so arithmetic stays inside int64 (the raw 64-bit
    # halves would promote numpy to object dtype)
    h1 = int(key[8:24], 16) & 0x7FFFFFFFFFFFFFFF
    h2 = (int(key[24:40], 16) | 1) & 0x7FFFFFFFFFFFFFFF
    return np.array([(h1 + i * h2) % m for i in range(k)], dtype=np.int64)


def _build_bitmap(keys: pd.Series, m: int, k: int) -> bytes:
    bm = np.zeros(m // 8, dtype=np.uint8)
    for key in keys:
        pos = _positions(key, m, k)
        # bitwise_or.at: unbuffered, so duplicate byte indices all apply
        np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bm.tobytes()


def build_partitioned(
    seen: DataFrame,
    num_buckets: int,
    fpp: float = 0.01,
    headroom: float = 4.0,
) -> PartitionedBloom:
    """Build per-bucket filters distributed (one applyInPandas group per
    bucket), sized for `headroom ×` the current key count so incremental
    adds don't immediately saturate."""
    n = seen.count()
    m, k = _params(int(n * headroom / num_buckets) + 64, fpp)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        return pd.DataFrame({"bucket": [bucket], "bitmap": [_build_bitmap(pdf["key"], m, k)]})

    rows = (
        seen.select("key", "bucket")
        .groupBy("bucket")
        .applyInPandas(build, "bucket int, bitmap binary")
        .collect()
    )
    return PartitionedBloom(
        num_buckets=num_buckets,
        m_bits=m,
        k=k,
        bitmaps={r.bucket: bytes(r.bitmap) for r in rows},
        n_keys=n,
    )


def add_keys(bloom: PartitionedBloom, new_keys: DataFrame) -> PartitionedBloom:
    """Fold a (small) DataFrame of appended keys into the sidecar.
    The per-superstep delta is wave-sized, so a driver-side fold is
    cheap; at production scale the same OR-merge runs per bucket file."""
    m, k = bloom.m_bits, bloom.k
    rows = new_keys.select("key", "bucket").collect()
    maps = {b: bytearray(bm) for b, bm in bloom.bitmaps.items()}
    for r in rows:
        bm = maps.get(r.bucket)
        if bm is None:
            bm = bytearray(m // 8)
            maps[r.bucket] = bm
        pos = _positions(r.key, m, k)
        for p in pos:
            bm[int(p) >> 3] |= 1 << (int(p) & 7)
    return PartitionedBloom(
        num_buckets=bloom.num_buckets,
        m_bits=m,
        k=k,
        bitmaps={b: bytes(bm) for b, bm in maps.items()},
        n_keys=bloom.n_keys + len(rows),
    )


def contains(bloom: PartitionedBloom, key: str) -> bool:
    bucket = int(key[:8], 16) % bloom.num_buckets
    bm = bloom.bitmaps.get(bucket)
    if bm is None:
        return False
    arr = np.frombuffer(bm, dtype=np.uint8)
    pos = _positions(key, bloom.m_bits, bloom.k)
    return bool(np.all((arr[pos >> 3] >> (pos & 7)) & 1))


def probe(
    spark: SparkSession, df: DataFrame, bloom: PartitionedBloom, key_col: str
) -> DataFrame:
    """Add a boolean ``_maybe_seen`` column via a broadcast, Arrow-batched
    probe. False = definitely unseen (no exact-join needed)."""
    bcast = spark.sparkContext.broadcast(
        (bloom.num_buckets, bloom.m_bits, bloom.k, bloom.bitmaps)
    )

    @pandas_udf(BooleanType())
    def _probe(keys: pd.Series) -> pd.Series:
        num_buckets, m, k, bitmaps = bcast.value
        arrs = {b: np.frombuffer(bm, dtype=np.uint8) for b, bm in bitmaps.items()}
        out = np.zeros(len(keys), dtype=bool)
        for i, key in enumerate(keys):
            arr = arrs.get(int(key[:8], 16) % num_buckets)
            if arr is None:
                continue
            pos = _positions(key, m, k)
            out[i] = bool(np.all((arr[pos >> 3] >> (pos & 7)) & 1))
        return pd.Series(out)

    return df.withColumn("_maybe_seen", _probe(F.col(key_col)))
