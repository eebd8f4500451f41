"""Plan-shape guards: the physical plans the 100 TB story depends on.
Regressions here (a filter no longer reaching the parquet scan, a
column-pruned scan going wide, a broadcast join degrading to shuffle)
change no results at test scale but break the engine at target scale —
so they are pinned explicitly."""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plans(df):
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.optimizedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark):
    df = entry_mod.queries()["q1_pricing_summary"](spark, SF_DIR)
    phys, _ = _plans(df)
    # the shipdate filter reaches the parquet scan
    assert "PushedFilters: [" in phys and "l_shipdate" in phys.split(
        "PushedFilters"
    )[1][:200]
    # the scan reads only needed columns, not the 16-column lineitem row
    read_schema = phys.split("ReadSchema")[1][:400]
    assert "l_extendedprice" in read_schema
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_q3_broadcasts_customer_dim(spark):
    df = entry_mod.queries()["q3_shipping_priority"](spark, SF_DIR)
    phys, _ = _plans(df)
    assert "BroadcastHashJoin" in phys  # small dim never shuffles big side


def test_dedup_anti_join_pushdown(spark):
    df = entry_mod.queries()["q_dedup_anti_join"](spark, SF_DIR)
    phys, _ = _plans(df)
    assert "PushedFilters: [" in phys
    assert "CartesianProduct" not in phys


def test_entry_flagship_no_cartesian(spark):
    df = entry_mod.entry(spark)
    phys, _ = _plans(df)
    assert "CartesianProduct" not in phys
