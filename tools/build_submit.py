"""spark-submit entry point: distributed index build.

Usage (north_rule launch shape):

  spark-submit --py-files hashsplitter.zip tools/build_submit.py \\
      --input /path/to/corpus_parquet_or_iceberg \\
      --output /path/to/index \\
      --format parquet --text-col content --id-col doc_id \\
      --chunk-length 4 --token-mode tokens --n-slices 8

Reads the corpus (parquet directly, or an Iceberg table via
``--format iceberg``: a catalog table name when the Iceberg runtime is
on the classpath, else a filesystem table path through the engine's
pure-python metadata reader — sources/iceberg.py, snapshot-pinnable
with ``--snapshot-id``), builds the positioned-chunk inverted index,
verifies the sha256(content) row invariant, and prints the stats JSON.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="parquet path (or iceberg table name)")
    p.add_argument("--output", required=True, help="index directory")
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--text-col", default="content")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--chunk-length", type=int, default=4)
    p.add_argument("--prefixes", default=None)
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--token-mode", default="tokens", choices=["tokens", "value"])
    p.add_argument("--n-slices", type=int, default=1)
    p.add_argument("--block-size", type=int, default=4096)
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--snapshot-id", type=int, default=None,
                   help="iceberg: pin a snapshot instead of the current one")
    p.add_argument("--synthetic-rows", type=int, default=None,
                   help="generate the deterministic synthetic corpus instead"
                        " of reading --input")
    p.add_argument("--skip-verify", action="store_true")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from elasticsearch_analysis_hashsplitter_spark.config import (
        DEFAULT_PREFIXES,
        HashSplitterConfig,
    )
    from elasticsearch_analysis_hashsplitter_spark.operators.build import (
        build_index,
        verify_content_sha256,
    )

    spark = SparkSession.builder.appName("hashsplitter-build").getOrCreate()
    cfg = HashSplitterConfig(
        chunk_length=args.chunk_length,
        prefixes=args.prefixes or DEFAULT_PREFIXES,
        size=args.size,
        token_mode=args.token_mode,
        apply_input_cap=args.token_mode == "value",
    )
    if args.synthetic_rows:
        from elasticsearch_analysis_hashsplitter_spark.corpus import (
            generate_corpus,
        )

        docs = generate_corpus(spark, args.synthetic_rows)
    elif args.format == "iceberg":
        # the official Iceberg runtime when its DataSource is on the
        # classpath (catalog table names); otherwise the engine's
        # pure-python metadata reader over a filesystem table path
        # (sources/iceberg.py — snapshot-pinned manifest walk, data
        # read as one spark.read.parquet over the live file set)
        try:
            docs = spark.read.format("iceberg").load(args.input)
        except Exception:
            from elasticsearch_analysis_hashsplitter_spark.sources.iceberg import (
                read_table,
            )

            docs = read_table(spark, args.input, snapshot_id=args.snapshot_id)
    else:
        docs = spark.read.parquet(args.input)

    stats = build_index(
        docs,
        cfg,
        args.output,
        id_col=args.id_col,
        text_col=args.text_col,
        num_partitions=args.num_partitions,
        block_size=args.block_size,
        n_slices=args.n_slices,
    )
    if not args.skip_verify:
        bad = verify_content_sha256(
            docs, spark, args.output, id_col=args.id_col,
            text_col=args.text_col,
        )
        stats["sha256_mismatches"] = bad
        if bad:
            print(json.dumps(stats), file=sys.stderr)
            return 1
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
