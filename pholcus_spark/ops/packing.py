"""Context-window preparation operators: document chunking and greedy
sequence packing — the step between a curated corpus and a token-budget
training batch (beyond-reference, BASELINE.json first-class additions).

``chunk_documents`` is pure JVM (split/sequence/explode/slice — codegen,
no Python, no shuffle). ``pack_sequences`` is the one genuinely
sequential algorithm in the ops family (greedy first-fit depends on the
running fill), so it runs as applyInPandas over deterministic hash
groups: token counts are computed JVM-side first, each group packs
independently in one Arrow batch, and parallelism = ``n_groups`` —
size it like shuffle partitions at scale (the per-task state is one
group's (doc_id, n_tokens) pairs, never document text). Its DuckDB
oracle replays the same greedy fold as a recursive CTE, so the
sequential semantics are pinned bit-exact, not just shape-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "pack_sequences"]


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size overlapping token windows
    (stride = chunk_tokens - overlap); the tail chunk may be short, and
    every document emits at least one chunk. Integer arithmetic only —
    chunk count is 1 + ceil(max(n_tokens - chunk_tokens, 0) / stride).
    Returns (doc_id, chunk_idx, n_chunk_tokens, chunk_text)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    w = F.split(F.trim(text_col), r"\s+")
    n = F.size(w)
    # integer ceil-div on non-negative operands; floor(int/int) via
    # double is exact far beyond any token count (< 2^53)
    n_chunks = (
        F.floor(
            (F.greatest(n - chunk_tokens, F.lit(0)) + (stride - 1)) / stride
        )
        + 1
    ).cast("int")
    out = docs.select(
        "doc_id",
        w.alias("_w"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.slice(
            F.col("_w"),
            F.col("chunk_idx") * stride + 1,
            F.lit(chunk_tokens),
        ).alias("_c"),
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        F.size("_c").cast("long").alias("n_chunk_tokens"),
        F.array_join("_c", " ").alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    n_groups: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequential sequence packing: within each deterministic
    group (doc_id % n_groups), documents in doc_id order fill bins
    first-fit — a doc goes into the current bin if it fits the token
    ``budget``, else opens the next bin (an oversized doc gets a bin of
    its own). Returns (doc_id, grp, n_tokens, bin, fill) where ``fill``
    is the bin's running token total after placement."""
    import pandas as pd

    counted = docs.select(
        "doc_id",
        (F.col("doc_id") % n_groups).cast("int").alias("grp"),
        F.size(F.split(F.trim(text_col), r"\s+")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        b, fill = 0, 0
        for t in pdf["n_tokens"]:
            if fill > 0 and fill + t <= budget:
                fill += t
            else:
                if fill > 0:
                    b += 1
                fill = int(t)
            bins.append(b)
            fills.append(fill)
        pdf["bin"] = pd.Series(bins, dtype="int32")
        pdf["fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return counted.groupBy("grp").applyInPandas(
        pack, "doc_id long, grp int, n_tokens long, bin int, fill long"
    )
