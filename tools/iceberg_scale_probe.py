"""Iceberg-input scale probe: the north rule's input path at 1M files.

``BASELINE.json input_hint`` names the engine's input as an Iceberg
table of source-code repositories. The ``iceberg_scan`` gate proves the
pure-Python source correct at sf0.01 (500 rows); this probe gives the
same class of evidence the other tiers have at 1M+:

1. sink cost: two commits (initial + append) via ``write_table`` —
   data files through Spark parquet, manifests/metadata pure Python;
2. metadata-walk cost at scale: ``data_file_paths`` alone (the only
   driver-side Python in the read path) vs the data volume it fronts —
   the O(manifests)-not-O(data) claim, measured;
3. snapshot isolation at scale: the pre-append snapshot still reads
   exactly the first commit's rows (time travel);
4. read parity: full-scan row count + content-hash aggregate equality
   between ``read_table`` and a direct parquet read of the same files;
5. pushdown audit: a ``lang=`` filter over the Iceberg read reaches the
   parquet scan as a PushedFilter (Catalyst owns pruning — the Python
   layer resolved paths only);
6. the headline: ``build_index`` at 1M rows *from the Iceberg source*,
   files/s comparable to the parquet-path build of the same corpus
   (serve_scale_probe / BENCH.md 1M rows) — the rule's build half on
   the rule's input shape.

Run on an idle box: python tools/iceberg_scale_probe.py --rows 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("hs-iceberg-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(cores * 4, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--append-rows", type=int, default=100_000)
    ap.add_argument(
        "--cores", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from elasticsearch_analysis_hashsplitter_spark.corpus import generate_corpus
    from elasticsearch_analysis_hashsplitter_spark.operators.build import build_index
    from elasticsearch_analysis_hashsplitter_spark.sources.iceberg import (
        data_file_paths,
        load_metadata,
        read_table,
        write_table,
    )

    from __spark_entry__ import TOK_CFG

    base = tempfile.mkdtemp(prefix="hs_iceberg_probe_")
    tbl = os.path.join(base, "code_table")
    out: dict = {"rows": args.rows, "append_rows": args.append_rows,
                 "cores": args.cores}
    spark = make_spark(args.cores)
    try:
        # ---- sink: two commits -------------------------------------
        docs = generate_corpus(spark, args.rows, partitions=args.cores * 2)
        t0 = time.time()
        snap1 = write_table(docs, tbl, mode="append")
        out["write_commit1_seconds"] = round(time.time() - t0, 1)
        appended = generate_corpus(
            spark, args.append_rows, partitions=args.cores,
            start=args.rows,
        )
        t0 = time.time()
        write_table(appended, tbl, mode="append")
        out["write_commit2_seconds"] = round(time.time() - t0, 1)
        meta = load_metadata(tbl)
        out["snapshots"] = len(meta.get("snapshots", []))

        # ---- metadata walk alone vs the data it fronts -------------
        t0 = time.time()
        paths = data_file_paths(tbl)
        out["metadata_walk_seconds"] = round(time.time() - t0, 3)
        out["data_files"] = len(paths)
        out["data_bytes"] = sum(os.path.getsize(p) for p in paths)

        # ---- snapshot isolation (time travel at scale) -------------
        out["snapshot1_rows"] = read_table(spark, tbl, snapshot_id=snap1).count()
        out["current_rows"] = read_table(spark, tbl).count()

        # ---- read parity: content-hash aggregate vs direct parquet -
        agg = [
            F.count("*").alias("n"),
            F.sum(F.crc32(F.col("content"))).alias("h"),
        ]
        ice = read_table(spark, tbl).agg(*agg).collect()[0]
        raw = spark.read.parquet(*paths).agg(*agg).collect()[0]
        out["content_hash_match"] = (ice["n"], ice["h"]) == (raw["n"], raw["h"])

        # ---- pushdown audit -----------------------------------------
        plan = (
            read_table(spark, tbl)
            .where(F.col("lang") == "py")
            .select("doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        out["lang_filter_pushed"] = (
            "PushedFilters" in plan and "EqualTo(lang,py)" in plan
        )

        # ---- the headline: index build FROM the Iceberg source -----
        idx = os.path.join(base, "idx")
        total = out["current_rows"]
        t0 = time.time()
        build_index(read_table(spark, tbl), TOK_CFG, idx, n_slices=4)
        dt = time.time() - t0
        out["build_from_iceberg_seconds"] = round(dt, 1)
        out["build_files_per_sec"] = round(total / dt, 1)
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
