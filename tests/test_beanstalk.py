"""Beanstalkd sink: payload contract (`output_beanstalkd.go:19-55`),
Go url.Values.Encode wire body, and the producer client driven
end-to-end from a Spark frame against an in-process fake beanstalkd
server (the protocol's `use`/`put` producer subset)."""

from __future__ import annotations

import socketserver
import threading
from urllib.parse import quote_plus, urlencode

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pholcus_spark.beanstalk import BeanstalkClient, BeanstalkError
from pholcus_spark.sinks import (
    beanstalk_items_payload,
    beanstalk_job_body,
    file_name_replace,
    file_name_replace_col,
    go_query_escape,
    write_beanstalkd,
)


# --- fake server ------------------------------------------------------


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        tube = "default"
        while True:
            line = self.rfile.readline()
            if not line:
                return
            parts = line.rstrip(b"\r\n").split(b" ")
            cmd = parts[0]
            if cmd == b"quit":
                return
            if cmd == b"use":
                tube = parts[1].decode()
                self.wfile.write(f"USING {tube}\r\n".encode())
            elif cmd == b"put":
                pri, delay, ttr, nbytes = (int(x) for x in parts[1:5])
                body = self.rfile.read(nbytes)
                self.rfile.read(2)  # trailing \r\n
                with self.server.lock:
                    self.server.jobs.append((tube, pri, delay, ttr, body))
                    jid = len(self.server.jobs)
                self.wfile.write(f"INSERTED {jid}\r\n".encode())
            else:
                self.wfile.write(b"UNKNOWN_COMMAND\r\n")


@pytest.fixture()
def beanstalk_server():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Handler)
    srv.daemon_threads = True
    srv.jobs = []
    srv.lock = threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


# --- client -----------------------------------------------------------


def test_client_use_put(beanstalk_server):
    host, port = beanstalk_server.server_address
    with BeanstalkClient(host, port) as cli:
        cli.use("pholcus")
        jid1 = cli.put("content=a&type=t".encode(), 1, 0, 0)
        jid2 = cli.put("中文 body".encode("utf-8"))
    assert (jid1, jid2) == (1, 2)
    assert beanstalk_server.jobs == [
        ("pholcus", 1, 0, 0, b"content=a&type=t"),
        ("pholcus", 1, 0, 0, "中文 body".encode("utf-8")),
    ]


def test_client_error_reply(beanstalk_server):
    host, port = beanstalk_server.server_address
    with BeanstalkClient(host, port) as cli:
        # an out-of-band line means put's next read is NOT an
        # INSERTED reply — the client must surface it, not swallow it
        cli._send(b"bogus\r\n")
        with pytest.raises(BeanstalkError):
            cli.put(b"x")


# --- FileNameReplace column twin --------------------------------------


FNR_CASES = [
    'a"b"c"d"e',  # alternating quotes across >2 occurrences
    'x:y*z<1>?|/\\',
    "plain",
    "",
    '"',
    '""',
    "新闻/分类:A",
    "a\r\t\nb",  # USE_KEYIN strip
    '":"',
]


def test_file_name_replace_col_parity(spark):
    df = spark.createDataFrame([(s,) for s in FNR_CASES], "s string")
    got = [r[0] for r in df.select(file_name_replace_col(F.col("s"))).collect()]
    assert got == [file_name_replace(s) for s in FNR_CASES]


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet='abc:"*<>?/|\\中 \r\t\n', max_size=12))
def test_file_name_replace_col_fuzz(spark, s):
    # spark is session-scoped, which hypothesis allows
    df = spark.createDataFrame([(s,)], "s string")
    got = df.select(file_name_replace_col(F.col("s"))).first()[0]
    assert got == file_name_replace(s)


# --- Go QueryEscape column twin ----------------------------------------


def test_go_query_escape_parity(spark):
    vals = ["a b", "x*y", "tilde~ok", "a&b=c", "中文 值", '"q"', "100%", ""]
    df = spark.createDataFrame([(s,) for s in vals], "s string")
    got = [r[0] for r in df.select(go_query_escape(F.col("s"))).collect()]
    # python quote_plus == Go url.QueryEscape: unreserved A-Za-z0-9-._~
    # plus space→'+', uppercase hex
    assert got == [quote_plus(s) for s in vals]


# --- payload + body contract -------------------------------------------


def _items(spark):
    return spark.createDataFrame(
        [
            ("site", "detail", {"标题": "T*1", "级": "A"},
             "http://h/1", "http://h/root"),
            ("site", "misc", {"b": "2", "a": "1"},
             "http://h/2", "http://h/root"),
        ],
        "spider string, rule string, data map<string,string>, "
        "url string, parent_url string",
    )


def test_payload_sorted_keys_and_missing_field(spark):
    """Go json.Marshal-of-map key order (UTF-8 byte sort), declared-
    but-absent field present as '' (output_beanstalkd.go:33-35),
    capitalized provenance keys, fallback rule = sorted data map."""
    pay = {
        r["type"]: r["content"]
        for r in beanstalk_items_payload(
            _items(spark), namespace="site", sums=(1, 500),
            field_order={"detail": ("标题", "级", "note")},
        ).collect()
    }
    assert pay["site__1-500__detail"] == (
        '{"ParentUrl":"http://h/root","Url":"http://h/1",'
        '"note":"","标题":"T*1","级":"A"}'
    )
    assert pay["site__1-500__misc"] == (
        '{"ParentUrl":"http://h/root","Url":"http://h/2","a":"1","b":"2"}'
    )


def test_job_body_is_url_values_encode(spark):
    """body == Go url.Values{content,createtime,type}.Encode() —
    pinned against python urlencode(sorted(...)) which matches Go's
    sorted-key, QueryEscape-per-value form byte-exact."""
    pay = beanstalk_items_payload(
        _items(spark), namespace="site", sums=(1, 500),
        field_order={"detail": ("标题", "级", "note")},
    )
    for r in beanstalk_job_body(pay, "1755550000").collect():
        want = urlencode(sorted({
            "content": r["content"],
            "createtime": "1755550000",
            "type": r["type"],
        }.items()))
        assert r["body"] == want


def test_namespace_from_spider_column(spark):
    """namespace=None derives the (FileNameReplace'd) namespace per
    row from the spider column — fanned-out `name__keyin` spiders keep
    their own namespace, like the reference's per-spider Collector."""
    items = _items(spark).withColumn(
        "spider", F.concat(F.col("spider"), F.lit('__k"w'))
    )
    types = {
        r["type"]
        for r in beanstalk_items_payload(items, sums=(0, 9)).collect()
    }
    assert types == {"site__k“w__0-9__detail", "site__k“w__0-9__misc"}


# --- end-to-end: Spark frame → foreachPartition → fake server ----------


def test_write_beanstalkd_end_to_end(spark, beanstalk_server):
    """Executor-side push: every job body lands exactly once in the
    chosen tube with the reference's pri=1/delay=0/ttr=0, through a
    real TCP round-trip per partition."""
    host, port = beanstalk_server.server_address
    pay = beanstalk_items_payload(
        _items(spark), namespace="site", sums=(1, 500),
        field_order={"detail": ("标题", "级", "note")},
    )
    body = beanstalk_job_body(pay, "1755550000").repartition(3)
    want = {r["body"].encode("utf-8") for r in body.collect()}

    write_beanstalkd(body, host, port, tube="pholcus_site")

    assert {j[4] for j in beanstalk_server.jobs} == want
    assert len(beanstalk_server.jobs) == len(want)
    assert {j[:4] for j in beanstalk_server.jobs} == {
        ("pholcus_site", 1, 0, 0)
    }
