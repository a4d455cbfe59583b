"""1M-scale probe for the ES 0.19 parent/child family + the late-r5
scoring surfaces (script_filter / custom_filters_score).

Parent key = the synthetic corpus's ``repo`` column (707 distinct keys
at 1M: org{i%7}/repo{i%101}). Parity strategy per section:

- has_child (selective): the planted 32-hex hash tokens are
  chunk-exact AND ``contains()``-exact (no cross-token false
  positives — the percolate probe's trick), so the parent set is
  verified against an INDEPENDENT full-scale corpus scan.
- has_child (hot) / has_parent: count identities vs direct corpus
  aggregates.
- top_children: aggregate identities at full scale (sum over parents
  == sum over all candidate docs; parent count == distinct candidate
  repos; avg == sum/count) — exactness per parent is gate+pytest
  territory at sf0.01.
- script_filter: subset-score identity (every returned doc satisfies
  the predicate and keeps its unfiltered score bit-identically).
- custom_filters_score: known-membership boost math on the top-k
  (each hit's factor recomputed from independently-evaluated filter
  membership) + genuine re-ranking asserted.

Usage:
  python tools/parent_child_scale_probe.py --rows 1000000
  (optionally --index-dir to reuse a built index across probe runs)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("parent-child-probe")
        .getOrCreate()
    )


def best_of(n, fn):
    best, res = float("inf"), None
    for _ in range(n):
        t0 = time.time()
        res = fn()
        best = min(best, time.time() - t0)
    return best, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--index-dir", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from elasticsearch_analysis_hashsplitter_spark.corpus import (
        PLANTED_HASHES,
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

    base = args.index_dir or tempfile.mkdtemp(prefix="hs_pc_probe_")
    idx = os.path.join(base, "idx")
    out: dict = {"rows": args.rows, "cores": args.cores, "reps": args.reps}
    spark = make_spark(args.cores)
    try:
        reuse = args.index_dir and os.path.exists(
            os.path.join(idx, "stats.json")
        )
        docs = generate_corpus(spark, args.rows, partitions=args.cores * 2)
        docs = docs.persist()
        docs.count()
        if not reuse:
            shutil.rmtree(idx, ignore_errors=True)
            t0 = time.time()
            build_index(docs, TOK_CFG, idx, n_slices=4)
            out["build_seconds"] = round(time.time() - t0, 1)
        eng = SearchEngine.open(spark, idx)

        hot = "printf"
        eng.search(hot, k=10).collect()  # warm stats/ranges

        # 1. has_child, selective planted-hash inner query -------------
        h = str(PLANTED_HASHES[0])
        node_h = qc.field_query(h, TOK_CFG, scored=False)
        t_hc, parents = best_of(
            args.reps,
            lambda: sorted(
                r["parent"]
                for r in eng.has_child(
                    node_h, docs, parent_col="repo"
                ).collect()
            ),
        )
        oracle_parents = sorted(
            r["repo"]
            for r in docs.where(F.contains("content", F.lit(h)))
            .select("repo").distinct().collect()
        )
        out["has_child_selective"] = {
            "seconds": round(t_hc, 2),
            "n_parents": len(parents),
            "parents_match_contains_oracle": parents == oracle_parents,
        }

        # 2. has_child, hot inner query (~73% of docs match) -----------
        node_hot = qc.field_query(hot, TOK_CFG, scored=False)
        t_base, n_match = best_of(
            args.reps, lambda: eng.docs(node_hot).count()
        )
        t_hot, n_hot = best_of(
            args.reps,
            lambda: eng.has_child(
                node_hot, docs, parent_col="repo"
            ).count(),
        )
        n_repos = docs.select("repo").distinct().count()
        out["has_child_hot"] = {
            "seconds": round(t_hot, 2),
            "n_parents": n_hot,
            "docset_baseline_seconds": round(t_base, 2),
            "overhead_x": round(t_hot / t_base, 2),
            "covers_all_parents": n_hot == n_repos,
            "matched_children": n_match,
        }

        # 3. has_parent -------------------------------------------------
        t_hp, n_kids = best_of(
            args.reps,
            lambda: eng.has_parent(
                "parent LIKE 'org3/%'", docs, parent_col="repo"
            ).count(),
        )
        n_direct = docs.where(F.col("repo").like("org3/%")).count()
        out["has_parent"] = {
            "seconds": round(t_hp, 2),
            "n_children": n_kids,
            "count_matches_corpus_scan": n_kids == n_direct,
        }

        # 4. top_children (sum over ~73%-selectivity candidates) --------
        t_tc, top = best_of(
            args.reps,
            lambda: eng.top_children(
                hot, docs, parent_col="repo", score_mode="sum", k=10
            ).collect(),
        )
        # full-scale aggregate identities — persist the two frames the
        # parity checks reuse so the full postings scan / parent agg
        # each run once instead of 2-3x
        sums = eng.top_children(
            hot, docs, parent_col="repo", score_mode="sum", k=100000
        ).persist()
        cnt_parents = sums.count()
        total_by_parent = sums.agg(F.sum("score")).collect()[0][0]
        sums.unpersist()
        node_sc = qc.field_query(hot, TOK_CFG, scored=True)
        hot_scores = eng.bm25_scores(list(node_sc.terms)).persist()
        total_by_doc = hot_scores.agg(F.sum("score")).collect()[0][0]
        cand_repos = (
            docs.join(hot_scores.select("doc_id"), "doc_id")
            .select("repo")
            .distinct()
            .count()
        )
        # drop the cache BEFORE the timed sections below — Spark's
        # CacheManager matches analyzed plans, so a live cache of the
        # hot-term score frame would silently serve the timed
        # search/script_filter/custom_filters_score runs and fake the
        # overhead ratios
        hot_scores.unpersist()
        avg_top = eng.top_children(
            hot, docs, parent_col="repo", score_mode="avg", k=5
        ).collect()
        out["top_children"] = {
            "seconds": round(t_tc, 2),
            "query_baseline_seconds": None,  # filled below
            "n_parents": cnt_parents,
            "sum_identity": abs(total_by_parent - total_by_doc)
            <= 1e-6 * abs(total_by_doc),
            "parents_equal_candidate_repos": cnt_parents == cand_repos,
            "top1": [top[0]["parent"], round(top[0]["score"], 2)],
            "avg_mode_top1": [
                avg_top[0]["parent"], round(avg_top[0]["score"], 4)
            ],
        }

        # plain scored query baseline for overhead ratios
        t_q, base_rows = best_of(
            args.reps, lambda: eng.search(hot, k=50).collect()
        )
        base_scores = {r["doc_id"]: r["score"] for r in base_rows}
        out["top_children"]["query_baseline_seconds"] = round(t_q, 2)
        out["top_children"]["overhead_x"] = round(t_tc / t_q, 2)

        # 5. script_filter ----------------------------------------------
        pred = "doc_id % 10 < 3"
        t_sf, sf_rows = best_of(
            args.reps,
            lambda: eng.script_filter(hot, pred, docs, k=10).collect(),
        )
        sf_ok = all(r["doc_id"] % 10 < 3 for r in sf_rows)
        # subset-score identity: a filtered hit that also sits in the
        # unfiltered top-50 must keep its score BIT-identically
        sf_scores_ok = all(
            base_scores[r["doc_id"]] == r["score"]
            for r in sf_rows
            if r["doc_id"] in base_scores
        )
        out["script_filter"] = {
            "seconds": round(t_sf, 2),
            "overhead_x": round(t_sf / t_q, 2),
            "all_satisfy_predicate": sf_ok,
            "surviving_scores_bit_identical": sf_scores_ok,
        }

        # 6. custom_filters_score (first-match-wins) ---------------------
        f0 = qc.prefix_query("ret", TOK_CFG)
        f1 = qc.field_query("malloc", TOK_CFG, scored=False)
        filters = [(f0, 1.5), (f1, 2.0)]
        t_cfs, cfs_rows = best_of(
            args.reps,
            lambda: eng.custom_filters_score(
                hot, filters, score_mode="first", k=10
            ).collect(),
        )
        # independently evaluate each hit's filter membership and redo
        # the boost math against the unconstrained score frame
        ids = [r["doc_id"] for r in cfs_rows]
        member = {}
        for name, fn in (("f0", f0), ("f1", f1)):
            got = {
                r["doc_id"]
                for r in eng.docs(fn)
                .where(F.col("doc_id").isin(ids))
                .collect()
            }
            member[name] = got
        full = {
            r["doc_id"]: r["score"]
            for r in eng.bm25_scores(list(node_sc.terms))
            .where(F.col("doc_id").isin(ids))
            .collect()
        }
        def factor(d):
            if d in member["f0"]:
                return 1.5
            if d in member["f1"]:
                return 2.0
            return 1.0
        cfs_ok = all(
            abs(r["score"] - full[r["doc_id"]] * factor(r["doc_id"]))
            <= 1e-9 * abs(r["score"])
            for r in cfs_rows
        )
        reranks = [r["doc_id"] for r in cfs_rows] != [
            r["doc_id"] for r in base_rows[:10]
        ]
        out["custom_filters_score"] = {
            "seconds": round(t_cfs, 2),
            "overhead_x": round(t_cfs / t_q, 2),
            "topk_boost_math_verified": cfs_ok,
            "genuinely_reranks": reranks,
        }

        print(json.dumps(out))
        return 0
    finally:
        spark.stop()
        if not args.index_dir:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
