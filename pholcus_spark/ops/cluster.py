"""Embedding clustering + semantic deduplication (SemDeDup-style).

The clustering-based near-dup path from the training-data literature
(Abbas et al., "SemDeDup", 2023): k-means the embedding corpus, then
look for semantic duplicates only WITHIN each cluster — the cluster
assignment is the candidate generator that bounds the pairwise blow-up
(the same role LSH band buckets play in ``ops/dedup.py``, with a
geometry-aware partition instead of a hash).

Numerics are designed for cross-engine bit-exactness so the DuckDB
oracle can gate the whole iterative algorithm, not just one step:

* vectors are int8-quantized first (``similarity.quantize_int8`` —
  round-half-up has one definition everywhere). Cosine is invariant to
  the per-vector scale, so code-space geometry ≈ float geometry with
  only quantization noise.
* every sum (centroid numerators, squared-distance numerators, dot
  products, norms) is **int64 arithmetic** — associative and
  order-independent, so Spark's partial aggregation and DuckDB's
  single-threaded fold produce the SAME integers.
* centroids are exact rationals ``(s_i, c)`` (per-dim member sum +
  member count) — never a rounded mean. The only floating point is
  one final IEEE op on identical integer operands (a division for
  distances, a sqrt for cosine), which is correctly rounded and hence
  bit-identical in both engines. Argmin ties break on cluster id.

Scale shape (the part that must survive 100×): per Lloyd iteration the
corpus is scanned once map-side against a BROADCAST k-row centroid
table (no shuffle to score), and the centroid update is one partial
(map-side combined) groupBy of k×d int64 sums; assignment for the
dedup phase is the same broadcast scan. The within-cluster pair join
is an equi-join on cluster id, skew-capped by
``dedup.cap_bucket_members``. Driver-resident state is k×(d+1) int64 —
kilobytes at any realistic k.

int64 headroom: a squared-distance numerator is Σ_d (c·x − s_i)² ≤
d·(254·c)², which stays inside int64 for clusters up to ~1.5e6 members
at d = 64. Beyond that (or at much larger d·c²), pass
``exact=False`` to score in float64 — the plans are identical, only
the gate-grade bit-exactness is dropped.

Reference note: the crawl reference (andeya/pholcus) has no clustering
operator — this file is part of the LLM-training-data operator family
the engine adds on top of the reference surface (like ops/dedup.py,
ops/packing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import quantize_int8

_L = "bigint"


def _quantize(embeddings: DataFrame, col: str) -> DataFrame:
    """int8 codes as array<long> (int64 domain for all downstream
    arithmetic) plus their exact squared norm. `quantize_int8` spreads
    a narrow scan to the core count, so every k-means pass downstream
    (all interpreted higher-order-function work) runs parallel."""
    q = quantize_int8(embeddings, col).select(
        "vec_id", F.transform("q", lambda x: x.cast(_L)).alias("q")
    )
    return q.withColumn(
        "norm2",
        F.aggregate(
            "q", F.lit(0).cast(_L), lambda acc, x: acc + x * x
        ),
    )


def init_centroids(codes: DataFrame, k: int) -> list:
    """Deterministic k-means init: the k corpus vectors with the
    smallest ``(md5(vec_id), vec_id)`` (the hash-sample idiom shared
    with ``similarity.ivf_centroids`` — reproducible in any engine).
    Returns ``[(cluster_id, s: list[int], c: int), ...]`` where the
    centroid is the exact rational ``s/c`` (here one member: s = its
    code vector, c = 1); cluster ids are 0..k-1 in hash order."""
    rows = (
        codes.select(
            "vec_id", "q", F.md5(F.col("vec_id").cast("string")).alias("_h")
        )
        .orderBy("_h", "vec_id")
        .limit(k)
        .collect()
    )
    return [(j, [int(x) for x in r.q], 1) for j, r in enumerate(rows)]


def _assign(codes: DataFrame, centroids: list) -> DataFrame:
    """Nearest-centroid assignment, pure map-side: one literal
    array<struct> of k centroids (constant-folds once — the
    constant-size-plan idiom from ``similarity._cell_scores``), one
    ``transform`` computing each squared distance as the exact int64
    numerator Σ(c·x − s_i)² over the common denominator c², compared
    in double (identical ints → identical IEEE division → identical
    argmin everywhere). Ties break on cluster id via the struct sort."""
    cent = F.array(
        *[
            F.struct(
                F.lit(int(j)).cast(_L).alias("cl"),
                F.array(*[F.lit(int(x)).cast(_L) for x in s]).alias("s"),
                F.lit(int(c)).cast(_L).alias("c"),
            )
            for j, s, c in centroids
        ]
    )
    scores = F.transform(
        cent,
        lambda ct: F.struct(
            (
                F.aggregate(
                    F.zip_with(
                        F.col("q"),
                        ct["s"],
                        lambda x, si: (ct["c"] * x - si)
                        * (ct["c"] * x - si),
                    ),
                    F.lit(0).cast(_L),
                    lambda acc, t: acc + t,
                ).cast("double")
                / (ct["c"] * ct["c"]).cast("double")
            ).alias("dist"),
            ct["cl"].alias("cl"),
        ),
    )
    return codes.withColumn("cluster", F.array_min(scores)["cl"])


def kmeans_quantized(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    col: str = "embedding",
) -> tuple[DataFrame, list]:
    """Lloyd's k-means over the int8-quantized corpus. Returns
    ``(assignments, centroids)`` — assignments is ``(vec_id, q, norm2,
    cluster)``, centroids the final exact-rational list.

    Each iteration: broadcast-literal scoring scan (no shuffle) + ONE
    k×d-wide partial aggregation for the update (d sum expressions —
    map-side combined, the shuffle moves k rows of d int64 sums, not
    n×d exploded elements). A cluster that loses every member keeps
    its previous centroid (both engines mirror this via coalesce)."""
    # iterative reuse: the quantized corpus is scanned by the d-probe,
    # the init sample, every iteration's assign+update, and the final
    # assign — persist it ONCE (and hand the caller a materialized,
    # lineage-truncated assignment so downstream self-joins don't
    # re-derive quantize+assign per subtree; connected_components uses
    # the same localCheckpoint discipline)
    codes = _quantize(embeddings, col).persist()
    try:
        # the init sample rows carry full code vectors — read the
        # dimensionality from them instead of a separate first() probe
        # (one Spark job saved per call; same crash on an empty corpus)
        cents = init_centroids(codes, k)
        d = len(cents[0][1])
        for _ in range(max(0, iters)):
            assigned = _assign(codes, cents)
            upd = {
                int(r["cluster"]): (
                    [int(r[f"s{i}"]) for i in range(d)],
                    int(r["c"]),
                )
                for r in assigned.groupBy("cluster").agg(
                    F.count("*").cast(_L).alias("c"),
                    *[
                        F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                        for i in range(d)
                    ],
                ).collect()
            }
            cents = [
                (j, *upd[j]) if j in upd else (j, s, c) for j, s, c in cents
            ]
        final = _assign(codes, cents).localCheckpoint()
        return final, cents
    finally:
        codes.unpersist()


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    col: str = "embedding",
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup: cluster, then mark every vector whose code-space
    cosine to a LOWER-id member of the SAME cluster meets ``threshold``
    as a duplicate of the smallest such id. Returns ``(vec_id, cluster,
    dup_of)`` — ``dup_of`` null for kept representatives; filter
    ``dup_of IS NULL`` for the surviving corpus.

    Cosine = dot/(√norm2_a·√norm2_b): integer dot and norms, one IEEE
    sqrt+division on identical ints — cross-engine exact, compared ≥
    threshold on the double. The pair join is cluster-id equi-join
    (candidate blow-up bounded by cluster sizes, the SemDeDup design
    point); ``max_cluster`` applies the shared LSH skew guard on top
    for degenerate corpora."""
    assigned, _ = kmeans_quantized(embeddings, k=k, iters=iters, col=col)
    left = assigned
    if max_cluster is not None:
        from .dedup import cap_bucket_members

        left = cap_bucket_members(
            assigned, ["cluster"], "vec_id", max_cluster, "semantic_dedup"
        )
    a = left.select(
        F.col("cluster").alias("_cl"),
        F.col("vec_id").alias("_aid"),
        F.col("q").alias("_aq"),
        F.col("norm2").alias("_an"),
    )
    b = assigned.select(
        F.col("cluster").alias("_cl"),
        F.col("vec_id").alias("_bid"),
        F.col("q").alias("_bq"),
        F.col("norm2").alias("_bn"),
    )
    dot = F.aggregate(
        F.zip_with("_aq", "_bq", lambda x, y: x * y),
        F.lit(0).cast(_L),
        lambda acc, t: acc + t,
    )
    cos = dot.cast("double") / (
        F.sqrt(F.col("_an").cast("double"))
        * F.sqrt(F.col("_bn").cast("double"))
    )
    # The equi-key has only k distinct values, so an unsalted join runs
    # its probe (and every interpreted dot product) on <= k tasks —
    # parallelism collapse, not skew AQE can split (one key = one
    # partition). Salt deterministically (guide §2.5: never rand()):
    # the a-side keys on hash(_aid) % S, the b-side replicates S ways,
    # every (a, b) pair still meets exactly once, so the result is
    # byte-identical. S follows cores/k — at production k (hundreds+)
    # S collapses to 1 and the plan is exactly the unsalted one.
    sess = embeddings.sparkSession
    n_salt = max(1, min(32, sess.sparkContext.defaultParallelism // max(1, k)))
    join_on = (a["_cl"] == b["_cl"]) & (a["_aid"] < b["_bid"])
    if n_salt > 1:
        a = a.withColumn(
            "_sl", F.pmod(F.xxhash64("_aid"), F.lit(n_salt)).cast("int")
        )
        salts = sess.range(n_salt).select(F.col("id").cast("int").alias("_sl"))
        b = b.crossJoin(F.broadcast(salts))
        join_on = (
            (a["_cl"] == b["_cl"])
            & (a["_sl"] == b["_sl"])
            & (a["_aid"] < b["_bid"])
        )
    dups = (
        a.join(b, on=join_on)
        .where((F.col("_an") > 0) & (F.col("_bn") > 0))
        .where(cos >= F.lit(float(threshold)))
        .groupBy(F.col("_bid").alias("vec_id"))
        .agg(F.min("_aid").alias("dup_of"))
    )
    return (
        assigned.join(dups, "vec_id", "left")
        .select("vec_id", "cluster", "dup_of")
    )
