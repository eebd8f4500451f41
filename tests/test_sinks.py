import glob
import shutil
import tempfile

from pholcus_spark import sinks
from pholcus_spark.spiderspec import ExtractRule, SpiderSpec


def test_export_items_csv_namespace_layout(spark):
    items = spark.createDataFrame(
        [
            ("site__a", "detail", {"caption": "x", "image_id": "i1"},
             "http://h.test/d/1", "http://h.test/p/0", 2),
            ("site__b", "detail", {"caption": "y", "image_id": "i2"},
             "http://h.test/d/2", "http://h.test/p/0", 2),
        ],
        "spider string, rule string, data map<string,string>, url string, "
        "parent_url string, superstep int",
    )
    out = tempfile.mkdtemp(prefix="pholcus-sink-")
    try:
        sinks.export_items_csv(items, out)
        dirs = sorted(glob.glob(f"{out}/spider=*/rule=*"))
        assert len(dirs) == 2  # one dir per namespace__subnamespace
        rows = (
            spark.read.option("header", True).csv(out).collect()
        )
        assert len(rows) == 2
        assert {r.Url for r in rows} == {"http://h.test/d/1", "http://h.test/d/2"}
        assert all("caption" in r.data_json for r in rows)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_export_items_csv_ordered_itemfields(spark):
    """ItemFields-ordered export: the data map pivots to named columns
    in declared order (output_csv.go:46-50 header contract)."""
    items = spark.createDataFrame(
        [
            ("site", "detail", {"caption": "x", "image_id": "i1"},
             "http://h.test/d/1", "http://h.test/p/0", 2),
            ("site", "detail", {"caption": "y", "image_id": "i2"},
             "http://h.test/d/2", "http://h.test/p/0", 3),
        ],
        "spider string, rule string, data map<string,string>, url string, "
        "parent_url string, superstep int",
    )
    out = tempfile.mkdtemp(prefix="pholcus-sink-ord-")
    try:
        sinks.export_items_csv(
            items, out, field_order={"detail": ("image_id", "caption")}
        )
        files = glob.glob(f"{out}/rule=detail/spider=*/part-*.csv")
        assert files
        header = open(files[0]).readline().strip().split(",")
        assert header == ["image_id", "caption", "Url", "ParentUrl", "superstep"]
        rows = (
            spark.read.option("header", True).csv(f"{out}/rule=detail").collect()
        )
        assert {(r.image_id, r.caption) for r in rows} == {("i1", "x"), ("i2", "y")}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_export_items_csv_not_default_field(spark):
    """NotDefaultField (spider.go:34, spider-file envelope): the
    Url/ParentUrl provenance columns vanish from BOTH the ordered pivot
    and the JSON fallback; superstep (engine lineage) stays."""
    items = spark.createDataFrame(
        [
            ("site", "detail", {"caption": "x", "image_id": "i1"},
             "http://h.test/d/1", "http://h.test/p/0", 2),
            ("site", "other", {"k": "v"},
             "http://h.test/d/2", "http://h.test/p/0", 2),
        ],
        "spider string, rule string, data map<string,string>, url string, "
        "parent_url string, superstep int",
    )
    out = tempfile.mkdtemp(prefix="pholcus-sink-ndf-")
    try:
        sinks.export_items_csv(
            items, out, field_order={"detail": ("image_id", "caption")},
            out_default_field=False,
        )
        files = glob.glob(f"{out}/rule=detail/spider=*/part-*.csv")
        assert files
        header = open(files[0]).readline().strip().split(",")
        assert header == ["image_id", "caption", "superstep"]
        ufiles = glob.glob(f"{out}/unordered/spider=*/rule=*/part-*.csv")
        assert ufiles
        uheader = open(ufiles[0]).readline().strip().split(",")
        assert uheader == ["data_json", "superstep"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_rule_fields_dim(spark):
    spec = SpiderSpec(
        "site",
        extract_rules=(
            ExtractRule("list", r"(?P<href>x)(?P<t>y)", ("href", "t")),
        ),
    )
    rows = {
        (r.rule, r.field, r.ordinal)
        for r in sinks.rule_fields_df(spark, spec).collect()
    }
    assert ("detail", "image_id", 0) in rows
    assert ("detail", "caption", 1) in rows
    assert ("list", "href", 0) in rows and ("list", "t", 1) in rows


class _RecordingWriter:
    """DataFrameWriter stand-in: records the fluent dispatch chain the
    server-gated sinks build (no jdbc/kafka/mongo servers exist in this
    container — the contract under test is that each sink drives the
    public DataFrameWriter surface with the right shape)."""

    def __init__(self, log):
        self.log = log

    def _rec(self, name, *a, **kw):
        self.log.append((name, a, kw))
        return self

    def mode(self, m):
        return self._rec("mode", m)

    def options(self, **kw):
        return self._rec("options", **kw)

    def option(self, k, v):
        return self._rec("option", k, v)

    def format(self, f):
        return self._rec("format", f)

    def jdbc(self, url, table):
        return self._rec("jdbc", url, table)

    def save(self):
        return self._rec("save")


def test_server_gated_sink_dispatch_shapes(spark, monkeypatch):
    """jdbc/kafka/mongo dispatch (output_mysql.go:37-87,
    output_kafka.go:38-65, output_mgo.go:19-70): executed against a
    recording writer so the dispatch row has a test signal despite the
    absent servers."""
    from pholcus_spark.sinks import write_jdbc, write_kafka, write_mongo

    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    log: list = []
    # patch the CONCRETE DataFrame class (pyspark 4: `pyspark.sql
    # .classic.dataframe.DataFrame` overrides the base's property)
    monkeypatch.setattr(
        type(df), "write", property(lambda self: _RecordingWriter(log))
    )

    write_jdbc(df, "jdbc:mysql://db:3306/x", "items", user="u", password="p")
    assert log == [
        ("mode", ("append",), {}),
        ("options", (), {"user": "u", "password": "p"}),
        ("jdbc", ("jdbc:mysql://db:3306/x", "items"), {}),
    ]

    log.clear()
    write_kafka(df, "k1:9092,k2:9092", "site__detail")
    assert ("format", ("kafka",), {}) in log
    assert ("option", ("kafka.bootstrap.servers", "k1:9092,k2:9092"), {}) in log
    assert ("option", ("topic", "site__detail"), {}) in log
    assert log[-1] == ("save", (), {})

    log.clear()
    write_mongo(df, "mongodb://m:27017", "crawl", "items")
    assert ("format", ("mongodb",), {}) in log
    assert ("option", ("connection.uri", "mongodb://m:27017"), {}) in log
    assert ("option", ("database", "crawl"), {}) in log
    assert ("option", ("collection", "items"), {}) in log
    assert ("mode", ("append",), {}) in log
    assert log[-1] == ("save", (), {})


def test_kafka_payload_is_single_json_value_column(spark):
    """The kafka sink's row payload contract: one `value` column of
    JSON-serialized rows (what a kafka writer consumes)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    rows = payload.collect()
    assert payload.columns == ["value"]
    import json as _json

    assert _json.loads(rows[0].value) == {"k": "a", "v": 1}


def _capture_source():
    """Broker-less Spark data source: each write task dumps its rows as
    a JSON file under option `path`. Defined in a factory so cloudpickle
    serializes the class BY VALUE (tests/ is not importable from Spark's
    python workers)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Writer(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]
            self.options = dict(options)

        def write(self, iterator):
            import json
            import os
            import uuid

            rows = [row.asDict() for row in iterator]
            if rows:
                fn = os.path.join(self.path, f"part-{uuid.uuid4().hex}.json")
                with open(fn, "w") as f:
                    json.dump(rows, f)
            return WriterCommitMessage()

        def commit(self, messages):
            import json
            import os

            opts = {
                k: v for k, v in self.options.items() if k != "path"
            }
            with open(os.path.join(self.path, "_committed.json"), "w") as f:
                json.dump({"tasks": len(messages), "options": opts}, f)

        def abort(self, messages):
            pass

    class Capture(DataSource):
        @classmethod
        def name(cls):
            return "rowcapture"

        def writer(self, schema, overwrite):
            return _Writer(self.options)

    return Capture


def _read_captured(path):
    import json

    rows = []
    for fn in sorted(glob.glob(f"{path}/part-*.json")):
        rows.extend(json.load(open(fn)))
    meta = json.load(open(f"{path}/_committed.json"))
    return rows, meta


ITEMS_DDL = (
    "spider string, rule string, data map<string,string>, url string, "
    "parent_url string, download_time string, superstep int"
)


def _items_df(spark):
    return spark.createDataFrame(
        [
            ("site", "detail", {"caption": "x", "image_id": "i1"},
             "http://h.test/d/1", "http://h.test/p/0", "t1", 2),
            ("site", "detail", {"caption": "y", "image_id": "i2"},
             "http://h.test/d/2", "http://h.test/p/0", "t2", 2),
            ("site", "misc", {"k": "v"},
             "http://h.test/m/1", "http://h.test/p/0", "t3", 2),
            ("site", "bad rule!", {"k": "v"},
             "http://h.test/b/1", "http://h.test/p/0", "t4", 2),
        ],
        ITEMS_DDL,
    )


def test_kafka_items_payload_contract(spark):
    """output_kafka.go:38-79 payload semantics: topic=spider__rule with
    the `^[0-9a-zA-Z_-]+$` skip filter, ItemFields-ordered JSON for
    declared rules, data-map fallback otherwise, provenance keys
    appended (incl. download_time when the frame carries it)."""
    import json as _json

    payload = sinks.kafka_items_payload(
        _items_df(spark), field_order={"detail": ("image_id", "caption")}
    )
    rows = {(r.topic, r.value) for r in payload.collect()}
    topics = {t for t, _ in rows}
    assert topics == {"site__detail", "site__misc"}  # bad rule! dropped

    detail = sorted(v for t, v in rows if t == "site__detail")
    # exact string: ItemFields order then url/parent_url/download_time
    assert detail[0] == (
        '{"image_id":"i1","caption":"x","url":"http://h.test/d/1",'
        '"parent_url":"http://h.test/p/0","download_time":"t1"}'
    )
    (misc,) = [v for t, v in rows if t == "site__misc"]
    assert _json.loads(misc) == {
        "k": "v", "url": "http://h.test/m/1",
        "parent_url": "http://h.test/p/0", "download_time": "t3",
    }

    # out_default_field=False drops provenance (OutDefaultField() gate,
    # output_kafka.go:73)
    bare = sinks.kafka_items_payload(
        _items_df(spark),
        field_order={"detail": ("image_id", "caption")},
        out_default_field=False,
    )
    vals = sorted(r.value for r in bare.where("topic='site__detail'").collect())
    assert vals[0] == '{"image_id":"i1","caption":"x"}'


def test_kafka_payload_item_field_named_url_does_not_crash(spark):
    """A fallback-rule item whose data map carries a key literally named
    'url'/'parent_url' must not blow up map_concat with a duplicate-key
    error (default mapKeyDedupPolicy=EXCEPTION) — provenance wins, like
    the reference stamping default fields over the data map."""
    import json as _json

    items = spark.createDataFrame(
        [("site", "misc", {"url": "stale", "k": "v"},
          "http://h.test/m/1", "http://h.test/p/0", "t1", 2)],
        ITEMS_DDL,
    )
    (row,) = sinks.kafka_items_payload(items).collect()
    assert _json.loads(row.value) == {
        "k": "v", "url": "http://h.test/m/1",
        "parent_url": "http://h.test/p/0", "download_time": "t1",
    }

    items_b = spark.createDataFrame(
        [("site", "misc", {"Url": "stale", "k": "v"},
          "http://h.test/m/1", "http://h.test/p/0", "t1", 2)],
        ITEMS_DDL,
    )
    (brow,) = sinks.beanstalk_items_payload(items_b, sums=(0, 9)).collect()
    assert _json.loads(brow.content) == {
        "k": "v", "Url": "http://h.test/m/1",
        "ParentUrl": "http://h.test/p/0", "DownloadTime": "t1",
    }


def test_write_kafka_through_python_datasource(spark):
    """Executed transport coverage: the EXACT write_kafka dispatch path
    (format→bootstrap option→per-row topic routing→save) through a
    registered Python data source instead of a broker."""
    spark.dataSource.register(_capture_source())
    out = tempfile.mkdtemp(prefix="pholcus-kafka-cap-")
    try:
        payload = sinks.kafka_items_payload(
            _items_df(spark), field_order={"detail": ("image_id", "caption")}
        )
        sinks.write_kafka(payload, "k1:9092,k2:9092", fmt="rowcapture", path=out)
        rows, meta = _read_captured(out)
        assert len(rows) == 3
        assert {r["topic"] for r in rows} == {"site__detail", "site__misc"}
        assert all(r["value"].startswith("{") for r in rows)
        assert meta["options"]["kafka.bootstrap.servers"] == "k1:9092,k2:9092"
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_write_kafka_fixed_topic_wraps_df(spark):
    """A non-payload frame with a fixed topic: rows are JSON-wrapped
    whole and the topic rides as a writer option (single-topic form)."""
    import json as _json

    spark.dataSource.register(_capture_source())
    out = tempfile.mkdtemp(prefix="pholcus-kafka-fix-")
    try:
        df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
        sinks.write_kafka(df, "k:9092", topic="site__misc",
                          fmt="rowcapture", path=out)
        rows, meta = _read_captured(out)
        assert sorted(_json.loads(r["value"])["k"] for r in rows) == ["a", "b"]
        assert meta["options"]["topic"] == "site__misc"
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_write_mongo_through_python_datasource(spark):
    """write_mongo's dispatch executed end-to-end: rows land 1:1 as
    documents; connection.uri/database/collection ride as options."""
    spark.dataSource.register(_capture_source())
    out = tempfile.mkdtemp(prefix="pholcus-mongo-cap-")
    try:
        df = spark.createDataFrame(
            [("i1", "x"), ("i2", "y")], "image_id string, caption string"
        )
        sinks.write_mongo(df, "mongodb://m:27017", "crawl", "items",
                          fmt="rowcapture", path=out)
        rows, meta = _read_captured(out)
        assert sorted((r["image_id"], r["caption"]) for r in rows) == [
            ("i1", "x"), ("i2", "y")
        ]
        assert meta["options"]["connection.uri"] == "mongodb://m:27017"
        assert meta["options"]["database"] == "crawl"
        assert meta["options"]["collection"] == "items"
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# Excel sink (xlsxlite, output_excel.go parity)
# ---------------------------------------------------------------------------


def test_xlsxlite_roundtrip_and_determinism():
    from pholcus_spark.xlsxlite import XlsxWriter, read_xlsx, sheet_name

    def build():
        w = XlsxWriter()
        w.add_sheet(
            "site__detail", ["a", "b"], [["1", "x<y&z"], ["2", None]]
        )
        w.add_sheet("site__misc", ["only"], [["héllo"]])
        return w.save_bytes()

    data = build()
    sheets = read_xlsx(data)
    assert list(sheets) == ["site__detail", "site__misc"]
    assert sheets["site__detail"] == [
        ["a", "b"], ["1", "x<y&z"], ["2", ""],
    ]
    assert sheets["site__misc"] == [["only"], ["héllo"]]
    # byte-identical on re-build (fixed zip timestamps, fixed part order)
    assert build() == data
    # sheet-name rules: illegal chars replaced, 31-char cap
    assert sheet_name("a[b]:c*d?e/f\\g") == "a_b__c_d_e_f_g"
    assert len(sheet_name("x" * 40)) == 31
    # duplicate names deduped with a numeric suffix
    w = XlsxWriter()
    w.add_sheet("same", None, [])
    w.add_sheet("same", None, [])
    assert list(read_xlsx(w.save_bytes())) == ["same", "same_2"]


def test_export_items_xlsx(spark):
    import os
    import tempfile

    from pholcus_spark.xlsxlite import read_xlsx

    items = spark.createDataFrame(
        [
            ("site", "detail", {"caption": "c1", "image_id": "i1"},
             "http://h.test/d/1", "http://h.test/p/0", 2, "t1"),
            ("site", "detail", {"caption": "c2", "image_id": "i2"},
             "http://h.test/d/2", "http://h.test/p/0", 2, "t2"),
            ("site", "misc", {"k": "v"},
             "http://h.test/m/1", "http://h.test/p/0", 2, "t3"),
        ],
        "spider string, rule string, data map<string,string>, url string, "
        "parent_url string, superstep int, download_time string",
    )
    path = os.path.join(tempfile.mkdtemp(prefix="pholcus-xlsx-"), "out.xlsx")
    sinks.export_items_xlsx(
        items, path, field_order={"detail": ("image_id", "caption")}
    )
    sheets = read_xlsx(path)
    assert set(sheets) == {"site__detail", "site__misc"}
    det = sheets["site__detail"]
    # header = ItemFields order + provenance (output_excel.go:41-47)
    assert det[0] == ["image_id", "caption", "Url", "ParentUrl",
                      "DownloadTime"]
    body = sorted(det[1:])
    assert body[0] == ["i1", "c1", "http://h.test/d/1",
                       "http://h.test/p/0", "t1"]
    assert body[1][0] == "i2"
    # undeclared rule falls back to one JSON data column
    misc = sheets["site__misc"]
    assert misc[0][0] == "data"
    assert '"k":"v"' in misc[1][0]


# --- SubNamespace: data-dependent table naming (output_util.go:18-28,
# baidunews.go:77-79 returns dataCell["分类"]) -------------------------


def test_file_name_replace_reference_semantics():
    # util.go:307-338: fullwidth replacements, quote alternation,
    # USE_KEYIN ("\r\t\n") stripped
    assert sinks.file_name_replace('a:b*c<d>e?f/g|h\\i') == (
        "a：b×c＜d＞e？f／g∣h╲i"
    )
    assert sinks.file_name_replace('say "hi" "yo"') == "say “hi” “yo”".replace(
        "“hi”", "“hi”"
    )
    # quote alternation: 1st “ 2nd ” 3rd “ 4th ”
    assert sinks.file_name_replace('""""') == "“”“”"
    assert sinks.file_name_replace("a\r\t\nb") == "ab"
    assert sinks.file_name_replace("plain") == "plain"


def _subns_items(spark):
    return spark.createDataFrame(
        [
            ("news", "detail", {"标题": "t1", "分类": "国内最新"},
             "http://n.test/a/1", "http://n.test/rss", "t1", 1),
            ("news", "detail", {"标题": "t2", "分类": "体育最新"},
             "http://n.test/a/2", "http://n.test/rss", "t2", 1),
            ("news", "detail", {"标题": "t3", "分类": "国内最新"},
             "http://n.test/a/3", "http://n.test/rss", "t3", 1),
            # missing sub field → '' (recovered panic → zero value,
            # output_util.go:22-27)
            ("news", "detail", {"标题": "t4"},
             "http://n.test/a/4", "http://n.test/rss", "t4", 1),
        ],
        ITEMS_DDL,
    )


def test_export_items_csv_sub_namespace(spark):
    items = _subns_items(spark).drop("download_time")
    out = tempfile.mkdtemp(prefix="pholcus-subns-")
    try:
        sinks.export_items_csv(
            items, out, field_order={"detail": ("标题", "分类")},
            sub_field="分类",
        )
        dirs = sorted(glob.glob(f"{out}/rule=detail/spider=news/sub=*"))
        # one partition dir per distinct sub-namespace value (incl. the
        # __HIVE_DEFAULT_PARTITION__-free empty string form)
        assert len(dirs) == 3, dirs
        rows = (
            spark.read.option("header", True)
            .csv(f"{out}/rule=detail").collect()
        )
        by_sub = {}
        for r in rows:
            by_sub.setdefault(r.sub, set()).add(r["标题"])
        assert by_sub.get("国内最新") == {"t1", "t3"}
        assert by_sub.get("体育最新") == {"t2"}
        assert len(rows) == 4
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_xlsx_sheet_name_with_quote_is_valid_xml():
    """'\"' inside a sheet name must be &quot;-escaped in workbook.xml's
    name=\"...\" attribute (text-content escape() alone leaves it raw,
    producing a workbook Excel rejects as corrupt)."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    from pholcus_spark.xlsxlite import XlsxWriter, read_xlsx

    w = XlsxWriter()
    w.add_sheet('a"b', ["h"], iter([["v"]]))
    data = w.save_bytes()
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        ET.fromstring(z.read("xl/workbook.xml"))  # must parse
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".xlsx") as f:
        f.write(data)
        f.flush()
        sheets = read_xlsx(f.name)
    assert set(sheets) == {'a"b'}
    assert sheets['a"b'] == [["h"], ["v"]]


def test_export_items_xlsx_shared_sub_namespace_merges_sheets(spark):
    """Two rules emitting the same sub-namespace value share ONE sheet
    (output_excel.go:30-38 keys sheets on FileNameReplace(subNamespace)
    only) — header from the sheet-creating rule, each row rendered with
    its own rule's ItemFields, never a name_2 split."""
    import os

    from pholcus_spark.xlsxlite import read_xlsx

    items = spark.createDataFrame(
        [
            ("news", "a_rule", {"t": "x1", "cat": "shared"},
             "http://n.test/a/1", "http://n.test/p", "t1", 1),
            ("news", "b_rule", {"u": "y1", "cat": "shared"},
             "http://n.test/b/1", "http://n.test/p", "t2", 1),
        ],
        ITEMS_DDL,
    )
    out = tempfile.mkdtemp(prefix="pholcus-xlsx-merge-")
    try:
        path = os.path.join(out, "m.xlsx")
        sinks.export_items_xlsx(
            items, path,
            field_order={"a_rule": ("t",), "b_rule": ("u",)},
            sub_field="cat",
        )
        sheets = read_xlsx(path)
        assert set(sheets) == {"news__shared"}
        rows = sheets["news__shared"]
        # header from a_rule (first in sorted order) + provenance
        assert rows[0] == ["t", "Url", "ParentUrl", "DownloadTime"]
        assert ["x1", "http://n.test/a/1", "http://n.test/p", "t1"] in rows
        assert ["y1", "http://n.test/b/1", "http://n.test/p", "t2"] in rows
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_export_items_xlsx_sub_namespace(spark):
    import zipfile

    items = _subns_items(spark)
    out = tempfile.mkdtemp(prefix="pholcus-subns-xlsx-")
    try:
        path = f"{out}/items.xlsx"
        sinks.export_items_xlsx(
            items, path, field_order={"detail": ("标题", "分类")},
            sub_field="分类",
        )
        with zipfile.ZipFile(path) as z:
            wb = z.read("xl/workbook.xml").decode("utf-8")
        # one sheet per sub-namespace VALUE, spider-prefixed
        assert "news__国内最新" in wb
        assert "news__体育最新" in wb
        assert "news__detail" not in wb
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_kafka_payload_sub_namespace_topic(spark):
    payload = sinks.kafka_items_payload(
        spark.createDataFrame(
            [
                ("news", "detail", {"cat": "sports", "t": "x"},
                 "http://n.test/1", "http://n.test/rss", "t1", 1),
                ("news", "detail", {"cat": "世界", "t": "y"},
                 "http://n.test/2", "http://n.test/rss", "t2", 1),
            ],
            ITEMS_DDL,
        ),
        sub_field="cat",
    )
    topics = [r.topic for r in payload.collect()]
    # data-dependent topic; the non-ascii one fails TOPIC_PATTERN and is
    # dropped (output_kafka.go:48-51 skip-and-continue)
    assert topics == ["news__sports"]


# --- ctx.FileOutput naming parity (context.go:247-284) ----------------

FILE_NAME_CASES = [
    # (url, name_or_ext, expected) — first two are the filetest sample's
    # own cells (sample/static_rules/filetest/filetest.go:41-64)
    ("https://www.baidu.com/img/bd_logo1.png", "baidu", "baidu.png"),
    ("https://github.com/andeya/pholcus", "", "pholcus.html"),
    # query stripped before ext derivation
    ("http://h.test/a/pic.jpg?x=1&y=2", "", "pic.jpg"),
    # extension-only arg overrides the URL ext, keeps URL stem
    ("http://h.test/a/pic.jpg", ".webp", "pic.webp"),
    # dotted arg: stem AND ext both from the arg
    ("http://h.test/a/pic.jpg", "cover.png", "cover.png"),
    # dir-part arg is carried into the name (p + stem)
    ("http://h.test/a/pic.jpg", "sub/dir/cover", "sub/dir/cover.jpg"),
    # arg that is ONLY a dir (trailing slash): stem empty -> URL base,
    # and the dir prefix is dropped (Go's baseName2 == "" branch)
    ("http://h.test/a/pic.jpg", "sub/", "pic.jpg"),
    # URL ending in '/': empty segment -> ".html"
    ("http://h.test/a/", "", ".html"),
    # multi-dot URL segment: Go path.Ext takes the FINAL dot
    ("http://h.test/x/archive.tar.gz", "", "archive.tar.gz"),
    ("http://h.test/x/archive.tar.gz", "bak", "bak.gz"),
    # no ext anywhere -> .html appended to URL stem
    ("http://h.test/about", "", "about.html"),
]


def test_file_output_name_reference_cases():
    for url, arg, want in FILE_NAME_CASES:
        assert sinks.file_output_name(url, arg) == want, (url, arg)


def test_file_output_name_col_matches_pure(spark):
    import pyspark.sql.functions as F

    urls = sorted({u for u, _, _ in FILE_NAME_CASES})
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    for arg in ["", "baidu", ".webp", "cover.png", "sub/dir/cover", "sub/"]:
        got = {
            r.url: r.name
            for r in df.select(
                "url", sinks.file_output_name_col("url", arg).alias("name")
            ).collect()
        }
        for u in urls:
            assert got[u] == sinks.file_output_name(u, arg), (u, arg)


def test_file_cell_relpath_layout():
    # output_file.go:26-30: FNR(namespace)/<dir>/FNR(base); Clean first
    assert sinks.file_cell_relpath("spider", "baidu.png") == "spider/baidu.png"
    assert (
        sinks.file_cell_relpath("s:p", "a/../b/x?.png") == "s：p/b/x？.png"
    )
    # absolute-looking names stay under FileDir (filepath.Join contract)
    assert sinks.file_cell_relpath("s", "/etc/x.png") == "s/etc/x.png"
    assert sinks.file_cell_relpath("名字", ".html") == "名字/.html"
    # leading '..' segments must not escape FileDir (executors write
    # fan-out against a shared filesystem — round-4 advice)
    assert sinks.file_cell_relpath("s", "../../x.png") == "s/x.png"
    assert sinks.file_cell_relpath("s", "../a/../b/x.png") == "s/b/x.png"
    assert sinks.file_cell_relpath("s", "..") == "s/"
    assert "/".join(
        p for p in sinks.file_cell_relpath("s", "a/../../../x.png").split("/")
    ).startswith("s/")


def test_export_files_writes_layout(spark):
    import os

    files = spark.createDataFrame(
        [
            ("site__a", "baidu.png", bytearray(b"\x89PNG")),
            ("site__a", "sub/dir/cover.jpg", bytearray(b"\xff\xd8")),
            ("site:b", "pholcus.html", bytearray(b"<html>")),
        ],
        "spider string, name string, bytes binary",
    )
    out = tempfile.mkdtemp(prefix="pholcus-files-")
    try:
        sinks.export_files(files, out)
        assert open(f"{out}/site__a/baidu.png", "rb").read() == b"\x89PNG"
        assert open(f"{out}/site__a/sub/dir/cover.jpg", "rb").read() == b"\xff\xd8"
        assert open(f"{out}/site：b/pholcus.html", "rb").read() == b"<html>"
    finally:
        shutil.rmtree(out, ignore_errors=True)


# --- MySQL sink parity, EXECUTED on embedded Derby (output_mysql.go) --


def _derby(db: str):
    url = f"jdbc:derby:memory:{db};create=true"
    return url, {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _jdbc_items_df(spark):
    return spark.createDataFrame(
        [
            ("site", "detail", "http://h/1", "http://h/0", "t1", 1,
             {"title": "A", "price": "9", "cat": "x"}),
            ("site", "detail", "http://h/2", "http://h/0", "t2", 1,
             {"title": "B", "price": "7", "cat": "y"}),
            ("site", "misc", "http://h/3", "http://h/0", "t3", 2,
             {"k": "v"}),
        ],
        "spider string, rule string, url string, parent_url string, "
        "download_time string, superstep int, data map<string,string>",
    )


def test_export_items_jdbc_derby_roundtrip(spark):
    """The jdbc dispatch EXECUTED, not monkeypatched: Spark's bundled
    embedded Derby takes the same df.write.jdbc path a MySQL server
    would (DriverRegistry, type mapping, batched inserts). One table
    per namespace__subNamespace, ItemFields column order + provenance,
    JSON-blob fallback for undeclared rules, append-on-reflush."""
    spark._jvm.java.lang.System.setProperty("derby.system.home", "/tmp")
    url, opts = _derby("pholcus_items")
    items = _jdbc_items_df(spark)
    fo = {"detail": ("title", "price")}

    sinks.export_items_jdbc(items, url, field_order=fo, **opts)

    def read(t):
        return (
            spark.read.format("jdbc").option("url", url)
            .option("dbtable", t).options(**opts).load()
        )

    det = read("site__detail")
    # declared ItemFields order, then the default provenance columns
    assert det.columns == ["title", "price", "Url", "ParentUrl",
                           "DownloadTime"]
    assert {(r.title, r.price, r.Url) for r in det.collect()} == {
        ("A", "9", "http://h/1"), ("B", "7", "http://h/2"),
    }
    misc = read("site__misc")
    assert misc.columns == ["data_json", "Url", "ParentUrl",
                            "DownloadTime"]
    import json

    assert json.loads(misc.first().data_json) == {"k": "v"}
    # AutoInsert/FlushInsert semantics: a second flush APPENDS
    sinks.export_items_jdbc(items, url, field_order=fo, **opts)
    assert det.count() == 4


def test_export_items_jdbc_not_default_field_and_sub(spark):
    """NotDefaultField (spider.go:34) suppresses Url/ParentUrl/
    DownloadTime; sub_namespace_field routes rows to data-valued
    tables (output_util.go:18-28, baidunews.go:77-79)."""
    spark._jvm.java.lang.System.setProperty("derby.system.home", "/tmp")
    from pyspark.sql import functions as F

    url, opts = _derby("pholcus_sub")
    items = _jdbc_items_df(spark).where(F.col("rule") == "detail")

    sinks.export_items_jdbc(
        items, url, field_order={"detail": ("title",)},
        sub_field="cat", out_default_field=False, **opts,
    )

    def read(t):
        return (
            spark.read.format("jdbc").option("url", url)
            .option("dbtable", t).options(**opts).load()
        )

    x = read("site__x")
    assert x.columns == ["title"]
    assert [r.title for r in x.collect()] == ["A"]
    assert [r.title for r in read("site__y").collect()] == ["B"]


def test_export_items_jdbc_co_tabled_rules_union_schema(spark):
    """Two rules whose rows share one subNamespace value land in ONE
    table. Round-4 advice: appending them separately with different
    column sets (declared field_order vs data_json fallback) fails on
    schema mismatch mid-export. The export must union the per-rule
    projections onto one common column set and append once."""
    spark._jvm.java.lang.System.setProperty("derby.system.home", "/tmp")
    url, opts = _derby("pholcus_cotab")
    items = spark.createDataFrame(
        [
            ("site", "detail", "http://h/1", "http://h/0", "t1", 1,
             {"title": "A", "cat": "shared"}),
            ("site", "misc", "http://h/3", "http://h/0", "t3", 2,
             {"k": "v", "cat": "shared"}),
        ],
        "spider string, rule string, url string, parent_url string, "
        "download_time string, superstep int, data map<string,string>",
    )

    sinks.export_items_jdbc(
        items, url, field_order={"detail": ("title",)},
        sub_field="cat", out_default_field=False, **opts,
    )

    t = (
        spark.read.format("jdbc").option("url", url)
        .option("dbtable", "site__shared").options(**opts).load()
    )
    # common column set: declared fields first, then the fallback blob
    assert t.columns == ["title", "data_json"]
    rows = {(r.title, r.data_json) for r in t.collect()}
    import json

    assert ("A", None) in rows
    blob = next(d for ti, d in rows if ti is None)
    assert json.loads(blob) == {"k": "v", "cat": "shared"}
