"""Drive the driver contract end-to-end, exactly as the round driver does:
load __spark_entry__.py by path from a fresh process, smoke entry(), run
every queries() entry at sf0.01 side-by-side with its oracle_sql() via
DuckDB, and report order-insensitive string-equality per query.

Usage: python scripts/driver_gate.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(d):
    d = d.reindex(sorted(d.columns), axis=1)
    if len(d.columns) == 0:
        return d
    return d.astype(str).sort_values(list(d.columns)).reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("entry rows:", mod.entry(spark).count())

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    oracle = mod.oracle_sql()
    failed = []
    for name, fn in mod.queries().items():
        try:
            spdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:150]}")
            failed.append(name)
            continue
        sql = oracle.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only {len(spdf)}")
            continue
        odf = con.execute(sql).fetchdf()
        a, b = canon(spdf), canon(odf)
        if len(a) == len(b) and list(a.columns) == list(b.columns) and a.equals(b):
            print(f"ok   {name}: {len(spdf)} rows exact-match")
        else:
            print(f"FAIL {name}: spark {len(spdf)} vs oracle {len(odf)} rows")
            failed.append(name)
    print(f"\n{len(mod.queries()) - len(failed)}/{len(mod.queries())} queries pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
