"""Tests for ops/cluster.py — quantized k-means + SemDeDup.

The cross-engine gate (`dedup_semantic` in __spark_entry__) pins the
full algorithm against DuckDB; these tests pin the pieces: assignment
vs an independent numpy Lloyd twin, empty-cluster carry, planted-dup
recovery, the skew cap, and the exactness contract (int64 sums only,
one IEEE division).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pholcus_spark.ops.cluster import (
    init_centroids,
    kmeans_quantized,
    semantic_dedup,
    _quantize,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _numpy_twin(vecs, k, iters):
    """Independent Lloyd implementation: same quantization, same
    md5-sample init, same exact-rational centroids — but numpy/python
    arithmetic with a different code path."""
    q = []
    for v in vecs:
        am = max(max(abs(float(x)) for x in v), 1e-30)
        q.append([math.floor(float(x) * (127.0 / am) + 0.5) for x in v])
    q = np.asarray(q, dtype=np.int64)
    order = sorted(
        range(len(vecs)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    cents = [(q[i].copy(), 1) for i in order[:k]]

    def assign():
        out = []
        for row in q:
            best = None
            for j, (s, c) in enumerate(cents):
                num = int(((c * row - s) ** 2).sum())
                d = float(num) / float(c * c)
                if best is None or (d, j) < best:
                    best = (d, j)
            out.append(best[1])
        return np.asarray(out)

    for _ in range(iters):
        a = assign()
        for j in range(k):
            m = q[a == j]
            if len(m):
                cents[j] = (m.sum(axis=0), len(m))
    return assign()


def test_kmeans_matches_numpy_twin(spark):
    rng = np.random.RandomState(7)
    vecs = np.vstack(
        [
            rng.normal(loc, 0.3, size=(20, 8))
            for loc in (-2.0, 0.0, 2.0)
        ]
    )
    df = _emb_df(spark, vecs)
    asg, _ = kmeans_quantized(df, k=3, iters=3)
    got = {
        r.vec_id: r.cluster for r in asg.select("vec_id", "cluster").collect()
    }
    want = _numpy_twin(vecs, k=3, iters=3)
    assert got == {i: int(c) for i, c in enumerate(want)}
    # three well-separated blobs must land in three distinct clusters
    assert len(set(got.values())) == 3


def test_empty_cluster_keeps_previous_centroid(spark):
    # two tight blobs, k=3: one centroid starves; the run must not
    # crash and every input still gets a cluster
    rng = np.random.RandomState(1)
    vecs = np.vstack(
        [rng.normal(-3.0, 0.05, (12, 4)), rng.normal(3.0, 0.05, (12, 4))]
    )
    df = _emb_df(spark, vecs)
    asg, cents = kmeans_quantized(df, k=3, iters=2)
    assert asg.count() == 24
    assert len(cents) == 3
    got = _numpy_twin(vecs, k=3, iters=2)
    spark_asg = {
        r.vec_id: r.cluster for r in asg.select("vec_id", "cluster").collect()
    }
    assert spark_asg == {i: int(c) for i, c in enumerate(got)}


def test_semantic_dedup_finds_planted_dup(spark):
    rng = np.random.RandomState(3)
    base = rng.normal(0, 1, (30, 16))
    # vec 30 = vec 5 + tiny noise; vec 31 = exact copy of vec 11
    vecs = np.vstack([base, base[5] + 1e-3, base[11]])
    df = _emb_df(spark, vecs)
    out = semantic_dedup(df, k=2, iters=2, threshold=0.99)
    rows = {r.vec_id: r.dup_of for r in out.collect()}
    assert rows[30] == 5
    assert rows[31] == 11
    assert sum(v is not None for v in rows.values()) == 2
    # representatives (the low ids) are kept
    assert rows[5] is None and rows[11] is None


def test_semantic_dedup_max_cluster_cap(spark):
    # 40 identical vectors: uncapped, ids 1..39 are all dups of 0;
    # capped at 5 members per cluster, only capped members can emit
    # dup pairs on the LEFT side, but every higher id still pairs with
    # kept low ids — the cap bounds join width, not recall on clones
    vecs = np.tile(np.arange(1.0, 9.0), (40, 1))
    df = _emb_df(spark, vecs)
    with pytest.warns(UserWarning, match="semantic_dedup"):
        out = semantic_dedup(
            df, k=1, iters=1, threshold=0.999, max_cluster=5
        ).collect()
    dup_of = {r.vec_id: r.dup_of for r in out}
    assert dup_of[0] is None
    assert all(dup_of[i] == 0 for i in range(1, 40))


def test_quantize_norms_are_int64_exact(spark):
    df = _emb_df(spark, [[0.5, -1.0, 0.25], [0.0, 0.0, 0.0]])
    rows = {r.vec_id: r for r in _quantize(df, "embedding").collect()}
    # 0.5/-1.0/0.25 at absmax 1.0 -> codes 64,-127,32 (round half up)
    assert rows[0].q == [64, -127, 32]
    assert rows[0].norm2 == 64 * 64 + 127 * 127 + 32 * 32
    # all-zero vector: absmax floor keeps codes 0, norm2 0 (and the
    # dedup pair filter excludes zero-norm vectors from cosine)
    assert rows[1].q == [0, 0, 0]
    assert rows[1].norm2 == 0


def test_plan_shapes(spark):
    """Scale contract: centroid scoring is pure map-side (literal
    centroid array — no join, no exchange in the assignment operator),
    and the dedup pair join is an equi-join, never a cartesian."""
    rng = np.random.RandomState(5)
    df = _emb_df(spark, rng.normal(0, 1, (24, 8)))
    out = semantic_dedup(df, k=2, iters=1, threshold=0.9)
    phys = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in phys
    assert "SortMergeJoin" in phys or "BroadcastHashJoin" in phys

    from pholcus_spark.ops.cluster import _assign, _quantize, init_centroids

    codes = _quantize(df, "embedding")
    cents = init_centroids(codes, 2)
    asg = _assign(codes, cents)
    asg_phys = asg._sc._jvm.PythonSQLUtils.explainString(
        asg._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in asg_phys and "Join" not in asg_phys


def test_zero_vectors_never_pair(spark):
    vecs = [[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]]
    df = _emb_df(spark, vecs)
    out = semantic_dedup(df, k=1, iters=1, threshold=0.0)
    assert all(
        r.dup_of is None
        for r in out.where(F.col("vec_id").isin(0, 1)).collect()
    )
