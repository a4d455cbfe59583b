"""spark-submit entry point: index compaction (segment merge policy).

Usage:

  spark-submit --py-files hashsplitter.zip tools/compact_submit.py \\
      --index /path/to/index [--max-slices 8] [--num-partitions 8] \\
      [--output /path/to/new_index]

Default is the in-place policy (:func:`maybe_compact`): compacts only
when the slice count exceeds ``--max-slices`` and swaps the rewritten
data dirs over the originals. With ``--output`` the compaction is
unconditional and out-of-place (:func:`compact_index`) — the right shape
for object stores, where the caller swaps a catalog pointer instead.
Prints the refreshed stats JSON (or {"compacted": false}).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--max-slices", type=int, default=8)
    p.add_argument("--num-partitions", type=int, default=8)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from elasticsearch_analysis_hashsplitter_spark.sources import catalog
    from elasticsearch_analysis_hashsplitter_spark.streaming.incremental import (
        compact_index,
        maybe_compact,
    )

    spark = SparkSession.builder.appName("hashsplitter-compact").getOrCreate()
    cfg = catalog.read_config(args.index)
    if args.output:
        stats = compact_index(
            spark, args.index, args.output, cfg, args.num_partitions
        )
        stats["compacted"] = True
    else:
        stats = maybe_compact(
            spark, args.index, cfg, args.max_slices, args.num_partitions
        )
        if stats is None:
            stats = {
                "compacted": False,
                "slices": len(catalog.list_postings_slices(args.index)),
                "max_slices": args.max_slices,
            }
        else:
            stats["compacted"] = True
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
