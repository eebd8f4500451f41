"""Output sinks — Spark-native replacements for the reference's
pipeline sinks (`app/pipeline/output_*.go`).

The reference's namespacing contract (`output_util.go:8-39`):
namespace = spider name (plus keyin-hash when fanned out, already baked
into our spider name as `name__keyin`), subnamespace = rule name; the
CSV sink writes one file per (namespace, subnamespace) with a header
row (`output_csv.go:17-71`). Here: partitioned parquet/CSV writes with
`partitionBy(spider, rule)` — one directory per namespace pair, which
is the scalable form of the same contract.

Database/queue sinks are thin format dispatches (`df.write.jdbc`,
`.format('kafka')`, `.format('mongodb')`): no servers exist in this
container, so they are config-gated; the dispatch itself mirrors the
reference's sink registry (`output_data.go:14-23`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_items_csv(items: DataFrame, out_dir: str) -> None:
    """CSV export of the items table, one partition dir per
    (spider, rule) — the namespace__subnamespace contract. The dynamic
    map payload is flattened to JSON (the reference JSON-stringifies
    non-string values at the sink, `output_csv.go:56-60`), and the
    three default provenance columns ride along
    (`context.go:236-240`)."""
    (
        items.select(
            "spider",
            "rule",
            F.to_json("data").alias("data_json"),
            F.col("url").alias("Url"),
            F.col("parent_url").alias("ParentUrl"),
            F.col("superstep"),
        )
        .repartition("spider", "rule")
        .write.mode("overwrite")
        .partitionBy("spider", "rule")
        .option("header", True)
        .csv(out_dir)
    )


def export_images_parquet(images: DataFrame, out_dir: str) -> None:
    """The file sink: image rows persisted as a typed table
    (`output_file.go:20-71` → north-rule image+caption table)."""
    images.write.mode("overwrite").parquet(out_dir)


SINKS = {"csv": export_items_csv, "parquet": export_images_parquet}


def write_jdbc(df: DataFrame, url: str, table: str, **options) -> None:
    """MySQL-sink analog (`output_mysql.go:37-87`). Requires a JDBC
    driver + server — absent in this container."""
    df.write.mode("append").options(**options).jdbc(url, table)


def write_kafka(df: DataFrame, servers: str, topic: str) -> None:
    """Kafka-sink analog (`output_kafka.go:38-65`): JSON value per row,
    topic = namespace__subnamespace."""
    (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .save()
    )


def write_mongo(df: DataFrame, uri: str, database: str, collection: str) -> None:
    """Mongo-sink analog (`output_mgo.go:19-70`). Needs the mongo-spark
    connector jar — absent here."""
    (
        df.write.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .mode("append")
        .save()
    )
