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


def rule_fields_df(spark, spec) -> DataFrame:
    """The ItemFields dimension: (rule, field, ordinal) — declared
    column order per rule (`spider.go:53-58`), driving sink headers
    exactly like the reference's ordered CSV export
    (`output_csv.go:46-50`)."""
    rows = [
        (rule, field, i)
        for rule, fields in spec.item_fields().items()
        for i, field in enumerate(fields)
    ]
    return spark.createDataFrame(rows, "rule string, field string, ordinal int")


def export_items_csv(items: DataFrame, out_dir: str, field_order=None) -> None:
    """CSV export of the items table, one partition dir per
    (spider, rule) — the namespace__subnamespace contract.

    ``field_order`` (rule → ordered field names, e.g.
    ``spec.item_fields()``): the map payload is pivoted to NAMED COLUMNS
    in declared ItemFields order, one header per rule — the reference's
    per-subnamespace CSV shape (`output_csv.go:46-61`). Rules without a
    declared order fall back to a JSON blob column (the reference
    JSON-stringifies unknown values, `output_csv.go:56-60`). The default
    provenance columns Url/ParentUrl ride along (`context.go:236-240`).
    """
    field_order = field_order or {}
    listed = [r for r in field_order if r is not None]
    rest = items.where(~F.col("rule").isin(listed)) if listed else items
    for rule, fields in field_order.items():
        sub = items.where(F.col("rule") == rule)
        cols = [
            F.try_element_at(F.col("data"), F.lit(f)).alias(f) for f in fields
        ]
        (
            sub.select("spider", *cols,
                       F.col("url").alias("Url"),
                       F.col("parent_url").alias("ParentUrl"),
                       "superstep")
            .repartition("spider")
            .write.mode("overwrite")
            .partitionBy("spider")
            .option("header", True)
            .csv(f"{out_dir}/rule={rule}")
        )
    (
        rest.select(
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
        .csv(f"{out_dir}/unordered" if field_order else out_dir)
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
