"""ES query-DSL clause surface at 1M files: must_not / filtered /
minimum_should_match / sort / more_like_this / highlight / scroll.

The clause operators shipped with sf0.01 gates and 40-doc pytest
corpora; this probe gives them the same 1M-scale evidence every other
operator family has. What it measures (warm engine, best-of-N):

1. the single-scan bitmask query WITH a NOT arm vs the same query
   without it (the NOT arm's marginal cost — should be ~zero: same
   scan, one more bit);
2. the pure-negative complement (zero-bits widening: one left join of
   every indexed doc against the candidate masks) — the inherent cost
   of ES's implicit match_all, plus the count identity
   |Not(x)| + |x| == n_docs as a correctness check at scale;
3. scored must_not / filter overhead vs the unconstrained search, with
   survivor-score parity asserted against the unconstrained run;
4. minimum_should_match (popcount on the existing bitmask — marginal
   cost should be ~zero over the exhaustive OR);
5. sort_search top-k over the 1M corpus join;
6. more_like_this end to end (point-read + driver analyze + lexicon
   stats + exhaustive disjunction);
7. highlight of a top-10 hit frame against the 1M corpus (broadcast);
8. scroll: per-page cost across 3 pages (each page = one scan + one
   shuffle, page N must cost ~page 1);
9. dis_max over two clauses (cost vs the two clause plans it unions;
   single-clause identity dis_max([v]) == search(v) at scale);
10. boosting (demote-never-exclude: expected top-10 recomputed from
    the unconstrained top-50 + negative membership, exact doubles).

Run on an idle box (assumes the 32 cores):
  python tools/clause_scale_probe.py --rows 1000000
Reuse an index dir across runs with --index-dir to skip the build.
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
        .appName("hs-clause-scale-probe")
        .config("spark.sql.shuffle.partitions", str(max(cores * 4, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .getOrCreate()
    )


def best_of(n, fn):
    times = []
    last = None
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--index-dir", default=None)
    args = ap.parse_args()

    from elasticsearch_analysis_hashsplitter_spark.corpus import (
        generate_corpus,
    )
    from elasticsearch_analysis_hashsplitter_spark.operators.build import (
        build_index,
    )
    from elasticsearch_analysis_hashsplitter_spark.operators.search import (
        SearchEngine,
    )
    from elasticsearch_analysis_hashsplitter_spark.plans import (
        compile as qc,
    )

    from __spark_entry__ import TOK_CFG

    base = args.index_dir or tempfile.mkdtemp(prefix="hs_clause_probe_")
    idx = os.path.join(base, "idx")
    out: dict = {"rows": args.rows, "cores": args.cores, "reps": args.reps}
    spark = make_spark(args.cores)
    try:
        reuse = args.index_dir and os.path.exists(
            os.path.join(idx, "stats.json")
        )
        docs = generate_corpus(spark, args.rows,
                               partitions=args.cores * 2)
        docs = docs.persist()
        docs.count()
        if not reuse:
            shutil.rmtree(idx, ignore_errors=True)
            t0 = time.time()
            build_index(docs, TOK_CFG, idx, n_slices=4)
            out["build_seconds"] = round(time.time() - t0, 1)
        eng = SearchEngine.open(spark, idx)
        n_docs = int(eng.stats["n_docs"])

        hot = "printf"           # common corpus token
        excl_prefix = "ret"      # matches 'return' and friends
        pos_node = qc.field_query(hot, TOK_CFG, scored=False)
        excl_node = qc.prefix_query(excl_prefix, TOK_CFG)

        # warm term stats / block ranges once
        eng.search(hot, k=10).collect()

        # 1. bitmask with/without the NOT arm ---------------------------
        t_pos, n_pos = best_of(
            args.reps, lambda: eng.docs(pos_node).count()
        )
        both = qc.bool_filter(must=[pos_node], must_not=[excl_node])
        t_not, n_not = best_of(args.reps, lambda: eng.docs(both).count())
        out["bitmask_positive"] = {"seconds": round(t_pos, 2),
                                   "matched": n_pos}
        out["bitmask_with_not_arm"] = {"seconds": round(t_not, 2),
                                       "matched": n_not,
                                       "overhead_x": round(t_not / t_pos, 2)}

        # 2. pure-negative complement + count identity ------------------
        t_neg, n_neg = best_of(
            args.reps, lambda: eng.docs(qc.bool_filter(
                must_not=[pos_node])).count()
        )
        out["pure_negative"] = {
            "seconds": round(t_neg, 2),
            "matched": n_neg,
            "count_identity": n_neg + n_pos == n_docs,
        }

        # 3. scored must_not / filter parity + overhead -----------------
        base_rows = eng.search(hot, k=50).collect()
        base_scores = {r["doc_id"]: r["score"] for r in base_rows}
        t_q, _ = best_of(args.reps,
                         lambda: eng.search(hot, k=10).collect())
        t_mn, mn_rows = best_of(
            args.reps,
            lambda: eng.search(hot, k=10, must_not=excl_node).collect(),
        )
        def overlap_with_excluded(rows):
            # membership check without collecting the (corpus-sized)
            # excluded doc set: broadcast the <=10 result ids against it
            from pyspark.sql import functions as F

            ids = spark.createDataFrame(
                [(int(r["doc_id"]),) for r in rows], "doc_id long"
            )
            return (
                eng.docs(excl_node)
                .join(F.broadcast(ids), "doc_id", "left_semi")
                .count()
            )

        parity_mn = overlap_with_excluded(mn_rows) == 0 and all(
            base_scores.get(r["doc_id"], r["score"]) == r["score"]
            for r in mn_rows
        )
        t_fl, fl_rows = best_of(
            args.reps,
            lambda: eng.search(hot, k=10, filter=excl_node).collect(),
        )
        parity_fl = overlap_with_excluded(fl_rows) == len(fl_rows) and all(
            base_scores.get(r["doc_id"], r["score"]) == r["score"]
            for r in fl_rows
        )
        out["scored_unconstrained"] = {"seconds": round(t_q, 2)}
        out["scored_must_not"] = {"seconds": round(t_mn, 2),
                                  "overhead_x": round(t_mn / t_q, 2),
                                  "parity": parity_mn}
        out["scored_filtered"] = {"seconds": round(t_fl, 2),
                                  "overhead_x": round(t_fl / t_q, 2),
                                  "parity": parity_fl}

        # 4. minimum_should_match vs plain exhaustive OR ----------------
        val2 = "printf return"
        node2 = qc.field_query(val2, TOK_CFG, scored=True)
        terms2 = list(node2.terms)
        t_or, _ = best_of(
            args.reps,
            lambda: eng.bm25_topk(terms2, k=10,
                                  conjunctive=False).collect(),
        )
        t_msm, _ = best_of(
            args.reps,
            lambda: eng.search_any(val2, k=10,
                                   min_should_match=2).collect(),
        )
        out["exhaustive_or"] = {"seconds": round(t_or, 2)}
        out["min_should_match_2"] = {"seconds": round(t_msm, 2),
                                     "overhead_x": round(t_msm / t_or, 2)}

        # 5. sort over the corpus join ----------------------------------
        t_sort, sort_rows = best_of(
            args.reps,
            lambda: eng.sort_search(pos_node, docs, "doc_id", k=10,
                                    ascending=False).collect(),
        )
        desc_ok = all(
            sort_rows[i]["doc_id"] >= sort_rows[i + 1]["doc_id"]
            for i in range(len(sort_rows) - 1)
        )
        out["sort_search"] = {"seconds": round(t_sort, 2),
                              "order_ok": desc_ok}

        # 6. more_like_this ---------------------------------------------
        t_mlt, mlt_rows = best_of(
            args.reps,
            lambda: eng.more_like_this(7, docs, text_col="content",
                                       k=10).collect(),
        )
        out["more_like_this"] = {
            "seconds": round(t_mlt, 2),
            "rows": len(mlt_rows),
            "source_excluded": all(r["doc_id"] != 7 for r in mlt_rows),
        }

        # 7. highlight of a top-10 frame --------------------------------
        hits = eng.search(hot, k=10)
        t_hl, hl_rows = best_of(
            args.reps,
            lambda: eng.highlight(hits, docs, hot,
                                  text_col="content").collect(),
        )
        out["highlight"] = {"seconds": round(t_hl, 2),
                            "rows": len(hl_rows)}

        # 8. scroll: page-N cost flatness -------------------------------
        page_secs = []
        t0 = time.time()
        for page in eng.scroll(hot, page_size=100, max_pages=3):
            page_secs.append(round(time.time() - t0, 2))
            t0 = time.time()
        out["scroll_pages_seconds"] = page_secs

        # 9. dis_max ------------------------------------------------------
        from pyspark.sql import functions as F

        t_dm1, dm1_rows = best_of(
            args.reps,
            lambda: eng.dis_max([hot], k=10, tie_breaker=0.3).collect(),
        )
        single_identity = [
            (r["doc_id"], r["score"]) for r in dm1_rows
        ] == [(r["doc_id"], r["score"]) for r in base_rows[:10]]
        t_dm2, _ = best_of(
            args.reps,
            lambda: eng.dis_max([hot, "return"], k=10,
                                tie_breaker=0.3).collect(),
        )
        out["dis_max_single_clause"] = {
            "seconds": round(t_dm1, 2),
            "identity_vs_search": single_identity,
        }
        out["dis_max_two_clauses"] = {
            "seconds": round(t_dm2, 2),
            "overhead_x_vs_one_scored": round(t_dm2 / t_q, 2),
        }

        # 10. boosting ----------------------------------------------------
        nb = 0.2
        t_bo, bo_rows = best_of(
            args.reps,
            lambda: eng.boosting(hot, excl_node, negative_boost=nb,
                                 k=10).collect(),
        )
        ids = spark.createDataFrame(
            [(int(d),) for d in base_scores], "doc_id long"
        )
        neg_ids = {
            r["doc_id"]
            for r in eng.docs(excl_node)
            .join(F.broadcast(ids), "doc_id", "left_semi")
            .collect()
        }
        # expected top-10 from the unconstrained top-50 (valid as long
        # as the demoted #10 lies inside it — true at 1M with this df)
        expect = sorted(
            (
                (d, s * nb if d in neg_ids else s)
                for d, s in base_scores.items()
            ),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        out["boosting"] = {
            "seconds": round(t_bo, 2),
            "overhead_x": round(t_bo / t_q, 2),
            "parity": [
                (r["doc_id"], r["score"]) for r in bo_rows
            ] == expect,
            "demoted_in_base_top50": len(neg_ids),
        }

        # 11. custom_score -------------------------------------------------
        # bounded-boost script so the expected top-10 is provably inside
        # the unconstrained top-50 (max factor 1.006): exact parity via
        # recompute, with the sufficiency threshold asserted at runtime
        script = "_score * (1.0 + 0.001 * (doc_id % 7))"
        t_cs, cs_rows = best_of(
            args.reps,
            lambda: eng.custom_score(hot, script, docs, k=10).collect(),
        )
        cs_expect = sorted(
            (
                (d, s * (1.0 + 0.001 * (d % 7)))
                for d, s in base_scores.items()
            ),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        rank50 = min(base_scores.values())
        sufficient = rank50 * 1.006 < cs_expect[-1][1]
        out["custom_score"] = {
            "seconds": round(t_cs, 2),
            "overhead_x": round(t_cs / t_q, 2),
            "parity": sufficient and [
                (r["doc_id"], r["score"]) for r in cs_rows
            ] == cs_expect,
            "recompute_window_sufficient": sufficient,
        }

        # 12. query/filter facet -------------------------------------------
        t_qf, qf_rows = best_of(
            args.reps,
            lambda: eng.query_facet(
                pos_node, {"excl": excl_node, "self": pos_node}
            ).collect(),
        )
        qf = {r["name"]: r["count"] for r in qf_rows}
        out["query_facet"] = {
            "seconds": round(t_qf, 2),
            "counts": qf,
            # And(x, x) == x, and the cross facet equals section 1's
            # positive-minus-NOT complement count
            "parity": qf["self"] == n_pos
            and qf["excl"] == n_pos - n_not,
        }

        # 13. terms_stats + date_histogram facets over the 1M corpus -------
        t_ts, ts_rows = best_of(
            args.reps,
            lambda: eng.terms_stats_facet(
                pos_node, docs.withColumn(
                    "n_chars", F.length("content")
                ), "lang", "n_chars",
            ).collect(),
        )
        t_dh, dh_rows = best_of(
            args.reps,
            lambda: eng.date_histogram_facet(
                pos_node,
                docs.select(
                    "doc_id",
                    F.date_add(
                        F.lit("2020-01-01").cast("date"),
                        (F.col("doc_id") % 400).cast("int"),
                    ).alias("ts"),
                ),
                "ts", "month",
            ).collect(),
        )
        out["terms_stats_facet"] = {
            "seconds": round(t_ts, 2), "terms": len(ts_rows),
            "docs_counted": int(sum(r["count"] for r in ts_rows)),
        }
        out["date_histogram_facet"] = {
            "seconds": round(t_dh, 2), "buckets": len(dh_rows),
            "docs_counted": int(sum(r["count"] for r in dh_rows)),
        }

        # 14. analyze_stream (no index: the _analyze attribute stream) -----
        from elasticsearch_analysis_hashsplitter_spark.config import (
            HashSplitterConfig,
        )
        from elasticsearch_analysis_hashsplitter_spark.operators.text import (
            analyze_stream,
        )

        hash_cfg = HashSplitterConfig(
            chunk_length=4, size=32, apply_input_cap=False
        )
        cap_cfg = HashSplitterConfig(chunk_length=4)  # 1024-cap + trim
        hashed = docs.select("doc_id", F.md5("content").alias("v"))

        def run_stream(src, cfg, col):
            # count + sum force full evaluation of every attribute row
            return (
                analyze_stream(src, cfg, text_col=col)
                .agg(F.count("*"), F.sum("end_offset"))
                .collect()[0][0]
            )

        t_a1, n_a1 = best_of(
            2, lambda: run_stream(hashed, hash_cfg, "v")
        )
        t_a2, n_a2 = best_of(
            2, lambda: run_stream(
                docs.select("doc_id", "content"), cap_cfg, "content"
            )
        )
        out["analyze_stream"] = {
            "hash_field": {
                "seconds": round(t_a1, 2), "tokens": int(n_a1),
                "mtok_per_s": round(n_a1 / t_a1 / 1e6, 1),
            },
            "content_capped": {
                "seconds": round(t_a2, 2), "tokens": int(n_a2),
                "mtok_per_s": round(n_a2 / t_a2 / 1e6, 1),
            },
        }

        print(json.dumps(out))
        return 0
    finally:
        spark.stop()
        if not args.keep and not args.index_dir:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
