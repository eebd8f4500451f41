"""Local simulator of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at the given
sf, compare row count, column names/order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from pholcus_spark.session import build_spark  # noqa: E402


# canonical type families — the driver's value hash is typed (round 1:
# DuckDB HUGEINT vs Spark BIGINT hash-mismatched while the stringified
# values were identical), so we compare type families too
_SPARK_FAM = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float", "string": "str",
    "boolean": "bool", "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
}
_DUCK_FAM = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "int128", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float", "VARCHAR": "str",
    "BOOLEAN": "bool", "TIMESTAMP": "ts", "DATE": "date",
}


def type_families(scols, sdtypes, dcols, dtypes):
    """Return (spark_fams, duck_fams) keyed by lowercased column name;
    unknown types map to their raw name (still comparable)."""
    sf = {c.lower(): _SPARK_FAM.get(t, t.lower()) for c, t in sdtypes}
    df = {
        c.lower(): _DUCK_FAM.get(str(t).upper(), str(t).lower())
        for c, t in zip(dcols, dtypes)
    }
    return sf, df


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = repr(round(v, 9))
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_spark("oracle-check", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only), {len(srows)} rows")
            continue
        try:
            res = con.sql(sql)
            dcols = [c for c in res.columns]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            failures.append((name, f"columns {scols} vs {dcols}"))
            print(f"FAIL {name}: columns spark={scols} duckdb={dcols}")
            continue
        sfam, dfam = type_families(scols, sdf.dtypes, dcols, res.types)
        mismatched = {
            c: (sfam[c], dfam[c]) for c in sfam if sfam[c] != dfam.get(c)
        }
        if mismatched:
            failures.append((name, f"type families differ: {mismatched}"))
            print(f"FAIL {name}: type families differ: {mismatched}")
            continue
        sn = normalize(srows, [c.lower() for c in scols])
        dn = normalize(drows, [c.lower() for c in dcols])
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            failures.append((name, f"values differ: {diff}"))
            print(f"FAIL {name}: values differ; first diffs: {diff}")
        else:
            print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
