"""Local emulation of the driver's correctness gate: runs every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, comparing row count, column names, and an order-insensitive
value hash (values rounded via repr)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, cols):
    norm = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        norm.append("|".join(vals))
    norm.sort()
    return hashlib.sha256("\n".join(norm).encode()).hexdigest()[:16]


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[1:] or list(qs)
    failures = 0
    for name in only:
        fn = qs[name]
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sdf.columns
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):6d}  (rows-only, {dt:.1f}s)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        orows = odf.to_dict("records")
        ocols = list(odf.columns)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:24s} {status} rows={len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} "
            f"hash={'=' if ok_hash else f'{sh} vs {oh}'} ({dt:.1f}s)"
        )
        if status == "FAIL" and len(srows) <= 20 and len(orows) <= 20:
            print("  spark :", sorted(map(str, srows))[:8])
            print("  oracle:", sorted(map(str, orows))[:8])
    print("failures:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
