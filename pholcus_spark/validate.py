"""Vectorized image validation — the north-rule Arrow UDF stage.

The input_hint mandates: decode / validate image rows with vectorized
pandas/Arrow UDFs (no per-row Python in the Spark plan); per-row
invariant vs originals = decoded-pixel allclose (PSNR ≥ 40 dB for
lossy formats, bit-exact for lossless) + exact caption equality +
phash equality.

``validate_image_udf`` decodes each Arrow batch with the in-repo numpy
PNG codec (imaging.py), computes (w, h, phash, ok) per row; jpeg rows
route through the Pillow-gated decoder and degrade to ok=false with an
error tag when Pillow is absent (clearly-marked stub — the schema,
batching and plumbing are identical).

``psnr_vs_truth_udf`` implements the conformance invariant given the
original pixels (joined from the images_truth fixture table on
image_id).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .imaging import decode_image, phash64, psnr

VALIDATION_TYPE = StructType(
    [
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("phash", LongType()),
        StructField("ok", BooleanType()),
        StructField("error", StringType()),
    ]
)


def _fmt_of(content_type: str | None, url: str | None) -> str:
    ct = (content_type or "").lower()
    if "png" in ct:
        return "png"
    if "jpeg" in ct or "jpg" in ct:
        return "jpeg"
    u = (url or "").lower()
    if u.endswith((".jpg", ".jpeg")):
        return "jpeg"
    return "png"


@pandas_udf(VALIDATION_TYPE)
def validate_image_udf(
    bodies: pd.Series, content_types: pd.Series, urls: pd.Series
) -> pd.DataFrame:
    ws, hs, phs, oks, errs = [], [], [], [], []
    for body, ct, url in zip(bodies, content_types, urls):
        try:
            px = decode_image(bytes(body), _fmt_of(ct, url))
            ws.append(int(px.shape[1]))
            hs.append(int(px.shape[0]))
            phs.append(phash64(px))
            oks.append(True)
            errs.append(None)
        except NotImplementedError as e:  # jpeg without Pillow — stub path
            ws.append(None), hs.append(None), phs.append(None)
            oks.append(False), errs.append(f"stub:{e}")
        except Exception as e:
            ws.append(None), hs.append(None), phs.append(None)
            oks.append(False), errs.append(str(e))
    return pd.DataFrame({"w": ws, "h": hs, "phash": phs, "ok": oks, "error": errs})


@pandas_udf(DoubleType())
def psnr_vs_truth_udf(
    bodies: pd.Series, fmts: pd.Series, orig_pngs: pd.Series
) -> pd.Series:
    """PSNR of decoded stored bytes vs decoded original pixels.
    inf (lossless identity) is reported as 1e9 to stay finite in SQL."""
    out = []
    for body, fmt, orig in zip(bodies, fmts, orig_pngs):
        a = decode_image(bytes(body), fmt)
        b = decode_image(bytes(orig), "png")
        v = psnr(a, b)
        out.append(1e9 if v == float("inf") else float(v))
    return pd.Series(out)
