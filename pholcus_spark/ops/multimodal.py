"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs
over mapInPandas.

Real in this container: PNG decode/stats/resize (in-repo numpy codec),
byte-level feature extraction. Clearly-marked stubs behind import-try:
JPEG decode (Pillow), audio decode (soundfile), video frame decode —
the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is identical and tested with the real PNG path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..imaging import HAS_PIL, decode_image, encode_png, phash64

IMAGE_STATS_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, phash long, ok boolean, error string"
)


def image_stats(images: DataFrame) -> DataFrame:
    """Decode + per-channel stats + phash for each image row, batched
    via mapInPandas (one decode pass per Arrow batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b",
                "phash", "ok", "error",
            )}
            # zip over column arrays — iterrows() builds a Series per
            # row (~3-10x python overhead at 100M-image scale)
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                out["image_id"].append(iid)
                out["fmt"].append(fmt)
                try:
                    px = decode_image(bytes(data), fmt)
                    means = px.reshape(-1, 3).mean(axis=0)
                    out["w"].append(int(px.shape[1]))
                    out["h"].append(int(px.shape[0]))
                    out["mean_r"].append(float(means[0]))
                    out["mean_g"].append(float(means[1]))
                    out["mean_b"].append(float(means[2]))
                    out["phash"].append(phash64(px))
                    out["ok"].append(True)
                    out["error"].append(None)
                except (NotImplementedError, Exception) as e:  # noqa: BLE001
                    for k in ("w", "h", "mean_r", "mean_g", "mean_b", "phash"):
                        out[k].append(None)
                    out["ok"].append(False)
                    out["error"].append(str(e))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, IMAGE_STATS_SCHEMA
    )


RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def resize_images(images: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded as PNG. Real for PNG via the
    in-repo codec; JPEG inputs require Pillow (stub otherwise)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, datas, ws, hs, fmts = [], [], [], [], []
            for iid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                yi = (np.arange(target_h) * px.shape[0] // target_h).clip(
                    0, px.shape[0] - 1
                )
                xi = (np.arange(target_w) * px.shape[1] // target_w).clip(
                    0, px.shape[1] - 1
                )
                resized = px[yi][:, xi]
                ids.append(iid)
                datas.append(encode_png(resized))
                ws.append(target_w)
                hs.append(target_h)
                fmts.append("png")
            yield pd.DataFrame(
                {"image_id": ids, "bytes": datas, "w": ws, "h": hs, "fmt": fmts}
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id string, n_bytes long, byte_entropy double, rms_proxy double"
)


def audio_byte_features(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Byte-level features for opaque audio blobs. NOT a real audio
    decode (no soundfile/librosa in this container — a real decoder
    slots into this exact UDF); entropy/RMS over raw bytes is a real,
    deterministic computation that exercises the full binary-column
    pipeline shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, ents, rmss = [], [], [], []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                raw = np.frombuffer(bytes(data), dtype=np.uint8)
                ids.append(mid)
                ns.append(int(raw.size))
                counts = np.bincount(raw, minlength=256).astype(np.float64)
                p = counts / max(raw.size, 1)
                nz = p[p > 0]
                ents.append(float(-(nz * np.log2(nz)).sum()))
                centered = raw.astype(np.float64) - 128.0
                rmss.append(float(np.sqrt((centered**2).mean())) if raw.size else 0.0)
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": ns, "byte_entropy": ents, "rms_proxy": rmss}
            )

    return media.select(media[id_col].alias("media_id"), "bytes").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def decode_jpeg_or_stub(data: bytes) -> np.ndarray:
    """Explicit stub surface: raises NotImplementedError without Pillow
    (BASELINE.json allows stubbing decode steps the container can't do)."""
    if not HAS_PIL:
        raise NotImplementedError("jpeg decode requires Pillow (not installed)")
    return decode_image(data, "jpeg")


def video_frame_sample_stub(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling requires a codec (pyav/ffmpeg) absent here;
    the stub raises at execution while keeping the real plan shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video frame sampling requires an ffmpeg binding; "
            "not available in this container"
        )
        yield  # pragma: no cover

    return media.select("media_id", "bytes").mapInPandas(
        run, "media_id string, frame_idx int, frame_png binary"
    )


def phash_neardup_pairs(
    images: DataFrame, max_hamming: int = 4, id_col: str = "image_id"
) -> DataFrame:
    """Image near-duplicate pairs over the 64-bit perceptual hash
    column the crawl engine already computes per image (the image
    analog of simhash_neardup_pairs): pigeonhole banding — ≤k differing
    bits over k+1 bands guarantees one identical band — prunes
    candidates, then an exact ``bit_count`` popcount verifies. Every
    expression is a JVM built-in; at corpus scale the band-bucket
    self-join is O(near-dups), never all-pairs."""
    from pyspark.sql import functions as F

    bands = max_hamming + 1
    # ceil so the bands PARTITION all 64 bits (floor would leave the top
    # bits uncovered and break the pigeonhole guarantee); the mask after
    # the arithmetic shift keeps sign-extension out of the last band
    band_bits = -(-64 // bands)
    banded = images.select(
        F.col(id_col).alias("iid"),
        F.col("phash"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "bucket",
        F.expr(f"shiftright(phash, band * {band_bits}) & {(1 << band_bits) - 1}"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .where(F.col("a.iid") < F.col("b.iid"))
        .select(
            F.col("a.iid").alias("id_a"),
            F.col("b.iid").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
