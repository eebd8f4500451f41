import hashlib

from pholcus_spark.keys import (
    absolutize,
    canonicalize_url,
    host_of,
    key_bucket,
    reference_md5_key,
    request_key,
)


def test_canonicalize_lowercases_and_sorts_query():
    u = "HTTP://H001.Test:80/p/1?b=2&a=1#frag"
    assert canonicalize_url(u) == "http://h001.test/p/1?a=1&b=2"


def test_canonicalize_keeps_nondefault_port_and_blank_values():
    assert canonicalize_url("http://x.test:8080/?z=&a=1") == (
        "http://x.test:8080/?a=1&z="
    )


def test_canonicalize_empty_path():
    assert canonicalize_url("http://x.test") == "http://x.test/"


def test_host_of():
    assert host_of("https://A.B.test:443/x") == "a.b.test"
    assert host_of("not a url") == ""


def test_absolutize():
    assert absolutize("http://h.test/a/b", "c") == "http://h.test/a/c"
    assert absolutize("http://h.test/a/", "/z") == "http://h.test/z"
    assert absolutize("http://h.test/", "http://other.test/q") == "http://other.test/q"


def test_request_key_includes_rule_and_method():
    # same URL under two rules → two distinct keys (request.go:139-145)
    k1 = request_key("sp", "list", "http://h.test/p/1")
    k2 = request_key("sp", "detail", "http://h.test/p/1")
    k3 = request_key("sp", "list", "http://h.test/p/1", "POST")
    assert len({k1, k2, k3}) == 3
    assert len(k1) == 40  # sha1 hex


def test_request_key_canonicalization_collapses_equivalent_urls():
    k1 = request_key("sp", "list", "http://H.test/p/1?b=2&a=1")
    k2 = request_key("sp", "list", "http://h.test:80/p/1?a=1&b=2#x")
    assert k1 == k2


def test_reference_md5_key_pins_reference_behavior():
    # exact composition of the reference key (request.go:139-145)
    expect = hashlib.md5(b"splisthttp://h.test/p/1GET").hexdigest()
    assert reference_md5_key("sp", "list", "http://h.test/p/1") == expect
    # reference does NOT sort query keys → different keys
    a = reference_md5_key("sp", "list", "http://h.test/?b=2&a=1")
    b = reference_md5_key("sp", "list", "http://h.test/?a=1&b=2")
    assert a != b


def test_key_bucket_range():
    k = request_key("sp", "list", "http://h.test/p/1")
    b = key_bucket(k, 64)
    assert 0 <= b < 64


def test_spark_column_key_matches_python(spark):
    from pyspark.sql import functions as F

    from pholcus_spark.keys import (
        canonicalize_url_udf,
        host_of_udf,
        key_bucket_col,
        request_key_col,
    )

    rows = [
        ("sp", "list", "http://H001.test:80/p/1?b=2&a=1", "get"),
        ("sp", "detail", "https://h002.test/x", "POST"),
        ("other", "list", "http://h003.test/?q=%20x", "GET"),
    ]
    df = spark.createDataFrame(rows, "spider string, rule string, url string, method string")
    out = (
        df.withColumn("canon", canonicalize_url_udf("url"))
        .withColumn("host", host_of_udf("url"))
        .withColumn(
            "key", request_key_col(F.col("spider"), F.col("rule"), F.col("canon"), F.col("method"))
        )
        .withColumn("bucket", key_bucket_col(F.col("key"), F.lit(64)))
        .collect()
    )
    for r in out:
        assert r.canon == canonicalize_url(r.url)
        assert r.host == host_of(r.url)
        assert r.key == request_key(r.spider, r.rule, r.url, r.method)
        assert r.bucket == key_bucket(r.key, 64)


def test_canonical_split_matches_udf_path(spark):
    """The JVM fast path must emit exactly canonicalize_url_safe's result
    for every URL shape — tricky ones must fall to the slow path."""
    from pholcus_spark.engine import canonical_split
    from pholcus_spark.keys import canonicalize_url_safe, host_of

    urls = [
        "http://h.test/p/0",                      # fast
        "https://a-b.test/x/y.png",               # fast
        "http://h.test/A%20B/UPPER",              # fast (path case kept)
        "http://h.test",                          # no path → slow, adds /
        "HTTP://H.Test/p/0",                      # uppercase → slow
        "http://h.test:80/p/0",                   # default port → slow
        "http://h.test:8080/p/0",                 # port kept → slow
        "http://h.test/p?b=2&a=1",                # query sort → slow
        "http://h.test/p#frag",                   # fragment → slow
        "http://user@h.test/p",                   # userinfo → slow
        "http://h.test/a b",                      # space → slow
        "http://[::1",                            # malformed → NULL
        "http://h.test:80x/",                     # bad port → NULL
    ]
    df = spark.createDataFrame([(u,) for u in urls], "raw string")
    out = {r.raw: (r.curl, r.host) for r in canonical_split(df, "raw").collect()}
    assert len(out) == len(urls)
    for u in urls:
        expect = canonicalize_url_safe(u)
        got_curl, got_host = out[u]
        assert got_curl == expect, (u, got_curl, expect)
        if expect is not None:
            assert got_host == host_of(expect), u


def test_canonicalize_never_raises_fuzz():
    """Property: canonicalize_url_safe never raises on arbitrary text
    (crawled hrefs are untrusted; the reference drops unparseable URLs,
    common.go:178-196), and is idempotent on its own output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pholcus_spark.keys import canonicalize_url_safe

    @settings(max_examples=500, deadline=None)
    @given(st.text(max_size=80))
    def prop(s):
        out = canonicalize_url_safe("http://" + s)
        if out is not None:
            again = canonicalize_url_safe(out)
            assert again == out, (s, out, again)
        assert canonicalize_url_safe(s) is None or isinstance(
            canonicalize_url_safe(s), str
        )

    prop()
