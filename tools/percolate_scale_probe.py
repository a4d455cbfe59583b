"""Percolator at 1M files: registered-query scaling + full-scale oracle.

The percolate gate runs at sf0.01 over five queries; this probe gives
the operator the same 1M evidence the rest of the engine has. ES
percolation is the alert use case — many SELECTIVE registered queries
— so the registry here is built from the corpus's 50 planted 32-hex
hash tokens (each in ~1/350 of docs), not the dense vocabulary:

1. Q=50 hash field queries (8 chunk-term conjunctions each): percolate
   the full corpus, report docs/s and matched pairs. ORACLE AT FULL
   SCALE: every per-query match count must equal the number of docs
   whose raw content contains that 32-hex token (a whitespace-delimited
   32-hex literal cannot occur by accident), checked for all 50.
2. Q=50 + 1 pure-negative query: the zero-mask plant adds one shuffle
   row per doc — its measured marginal cost over run 1, plus the
   count identity |not(x)| + |x| == n_docs.
3. Q=350 (50 field + 300 same-hash chunk-pair conjunctions): registry
   7x — leaf table still broadcasts, throughput should degrade far
   less than 7x (leaf dedup: the 300 pair queries reuse the 50 hashes'
   400 distinct chunk terms). Every chunk-pair count is checked against
   the owning hash's contains() count as a lower bound (a vocabulary
   token's chunk can legitimately coincide with a hex chunk), with the
   exact-equality fraction reported.

Run on an idle box:  python tools/percolate_scale_probe.py --rows 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def best_of(n, fn):
    times, last = [], None
    for _ in range(n):
        t0 = time.time()
        last = fn()
        times.append(time.time() - t0)
    return min(times), last


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from elasticsearch_analysis_hashsplitter_spark.corpus import (
        PLANTED_HASHES, generate_corpus,
    )
    from elasticsearch_analysis_hashsplitter_spark.functions.tokenize import (
        analyze,
    )
    from elasticsearch_analysis_hashsplitter_spark.operators.percolate import (
        Percolator,
    )
    from elasticsearch_analysis_hashsplitter_spark.plans import (
        compile as qc, ir,
    )
    from __spark_entry__ import TOK_CFG

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("hs-percolate-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(args.cores * 4, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    out: dict = {"rows": args.rows, "cores": args.cores, "reps": args.reps}
    try:
        docs = generate_corpus(spark, args.rows, partitions=args.cores * 2)
        docs = docs.select("doc_id", F.col("content").alias("text")).persist()
        n_docs = docs.count()
        hashes = [str(h) for h in PLANTED_HASHES]

        # full-scale independent truth: docs containing each hash token
        truth_rows = docs.select(
            *[
                F.sum(F.col("text").contains(h).cast("long")).alias(f"h{i}")
                for i, h in enumerate(hashes)
            ]
        ).collect()[0]
        truth = {h: int(truth_rows[f"h{i}"]) for i, h in enumerate(hashes)}
        out["planted_docs_total"] = sum(truth.values())

        def field_registry():
            p = Percolator(spark, TOK_CFG)
            for i, h in enumerate(hashes):
                p.register(f"hash_{i:02d}",
                           qc.field_query(h, TOK_CFG, scored=False))
            return p

        def counts(p):
            rows = (
                p.percolate(docs)
                .groupBy("query_name")
                .agg(F.count("*").alias("n"))
                .collect()
            )
            return {r["query_name"]: r["n"] for r in rows}

        # 1. Q=50 selective field queries + full-scale oracle ------------
        p50 = field_registry()
        t50, got50 = best_of(args.reps, lambda: counts(p50))
        oracle_ok = all(
            got50.get(f"hash_{i:02d}", 0) == truth[h]
            for i, h in enumerate(hashes)
        )
        out["q50"] = {
            "queries": 50,
            "seconds": round(t50, 2),
            "docs_per_sec": round(n_docs / t50),
            "matched_pairs": sum(got50.values()),
            "all_counts_match_contains_oracle": oracle_ok,
        }

        # 2. + one pure-negative query (zero-mask plant cost) ------------
        pneg = field_registry()
        neg_of = hashes[0]
        pneg.register("not_hash_00", qc.bool_filter(
            must_not=[qc.field_query(neg_of, TOK_CFG, scored=False)]))
        tneg, gotneg = best_of(args.reps, lambda: counts(pneg))
        out["q50_plus_negation"] = {
            "seconds": round(tneg, 2),
            "overhead_x_vs_q50": round(tneg / t50, 2),
            "negation_matched": gotneg.get("not_hash_00", 0),
            "count_identity": (
                gotneg.get("not_hash_00", 0)
                + gotneg.get("hash_00", 0) == n_docs
            ),
        }

        # 3. Q=350 (field + same-hash chunk-pair conjunctions) -----------
        p350 = field_registry()
        pair_owner: dict[str, list] = {}
        chunk_count: dict[str, int] = {}
        qi = 0
        for i, h in enumerate(hashes):
            chunks = analyze(h, TOK_CFG)
            for a in range(3):
                for b in range(a + 1, 4):
                    if qi >= 450:
                        break
                    name = f"pair_{qi:03d}"
                    ca, cb = chunks[a], chunks[b + 4]
                    p350.register(name, ir.And([ir.TermEq(ca),
                                                ir.TermEq(cb)]))
                    pair_owner[name] = [h, ca, cb]
                    chunk_count[ca] = chunk_count.get(ca, 0) + 1
                    chunk_count[cb] = chunk_count.get(cb, 0) + 1
                    qi += 1
        t350, got350 = best_of(args.reps, lambda: counts(p350))
        # pairs whose chunks are unique to their hash within the registry
        # must count >= the hash's docs (>= because a vocabulary token's
        # chunk can coincide with a hex chunk) and, for pairs where no
        # coincidence exists, exactly equal — assert the lower bound for
        # all and exactness for the strict-hex-unlikely majority
        lower_ok = all(
            got350.get(name, 0) >= truth[h]
            for name, (h, _, _) in pair_owner.items()
        )
        exact = sum(
            1
            for name, (h, _, _) in pair_owner.items()
            if got350.get(name, 0) == truth[h]
        )
        out["q350"] = {
            "queries": 50 + qi,
            "seconds": round(t350, 2),
            "docs_per_sec": round(n_docs / t350),
            "matched_pairs": sum(got350.values()),
            "slowdown_x_vs_q50": round(t350 / t50, 2),
            "pair_counts_lower_bound_ok": lower_ok,
            "pair_counts_exactly_owner": f"{exact}/{qi}",
        }
        print(json.dumps(out))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
