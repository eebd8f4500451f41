import numpy as np

from pholcus_spark import bloom
from pholcus_spark.keys import key_bucket, request_key


def keys_df(spark, n, prefix="k", num_buckets=16):
    ks = [request_key("sp", "list", f"http://h.test/{prefix}/{i}") for i in range(n)]
    rows = [(k, key_bucket(k, num_buckets)) for k in ks]
    return ks, spark.createDataFrame(rows, "key string, bucket int")


def test_bloom_no_false_negatives(spark):
    ks, df = keys_df(spark, 500)
    bf = bloom.build_partitioned(df, 16, fpp=0.01)
    assert all(bloom.contains(bf, k) for k in ks)


def test_bloom_low_false_positive_rate(spark):
    ks, df = keys_df(spark, 1000)
    bf = bloom.build_partitioned(df, 16, fpp=0.01)
    other = [request_key("sp", "list", f"http://h.test/other/{i}") for i in range(2000)]
    fp = sum(bloom.contains(bf, k) for k in other)
    assert fp / len(other) < 0.05  # headroom-sized, generous bound


def test_bloom_add_keys_incremental(spark):
    ks, df = keys_df(spark, 200)
    bf = bloom.build_partitioned(df, 16, fpp=0.01)
    new_ks, new_df = keys_df(spark, 100, prefix="new")
    bf2 = bloom.add_keys(bf, new_df)
    assert all(bloom.contains(bf2, k) for k in ks + new_ks)
    assert bf2.n_keys == 300


def test_bloom_probe_column(spark):
    ks, df = keys_df(spark, 300)
    bf = bloom.build_partitioned(df, 16, fpp=0.01)
    cand_keys = ks[:50] + [
        request_key("sp", "list", f"http://h.test/unseen/{i}") for i in range(50)
    ]
    cand = spark.createDataFrame([(k,) for k in cand_keys], "key string")
    probed = {r.key: r._maybe_seen for r in bloom.probe(spark, cand, bf, "key").collect()}
    # no false negatives — every seen key flagged
    assert all(probed[k] for k in ks[:50])
    # most unseen keys pass as definitely-new
    unseen_flagged = sum(probed[k] for k in cand_keys[50:])
    assert unseen_flagged <= 5


def test_positions_deterministic_and_in_range():
    k = request_key("sp", "list", "http://h.test/x")
    p1 = bloom._positions(k, 1024, 7)
    p2 = bloom._positions(k, 1024, 7)
    assert np.array_equal(p1, p2)
    assert ((p1 >= 0) & (p1 < 1024)).all()
