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
