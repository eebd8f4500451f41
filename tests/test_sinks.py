import glob
import shutil
import tempfile

from pholcus_spark import sinks


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
