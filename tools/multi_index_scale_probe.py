"""1M-scale probe for the multi-index coordinator (ES alias fan-out)
and the r5-final indices query.

The corpus is split into 4 shard indexes by ``doc_id % 4`` (ES's
default hash routing) next to ONE merged 1M index that serves as the
parity reference. Checks, all at full scale:

- dfs_query_then_fetch identity: coordinator top-k over the 4 shards
  must equal the merged index's top-k EXACTLY (docs; scores 1e-9) —
  the property the multi_index_search gate pins at sf0.01, here at 1M
  with real per-shard stats that genuinely differ from global.
- global_term_stats identity: coordinator-aggregated n_docs / df ==
  the merged index's stored stats, term by term (exact ints).
- indices query: rows attributed to the selected shards must carry
  the merged index's score for the MAIN value, all other rows the
  merged score for the no_match value (per-row dict lookup, 1e-9).
- count fan-out: per-shard counts summed == merged count.
- coordinator overhead: multi search seconds vs merged-engine search
  seconds (expect ~1x: 4 quarter-size pipelines run concurrently
  under local[32]; the merge is <= 4k rows).

Usage:
  python tools/multi_index_scale_probe.py --rows 1000000
  (--index-dir to reuse the built indexes across probe runs)
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

N_SHARDS = 4


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("multi-index-probe")
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
        generate_corpus,
    )
    from elasticsearch_analysis_hashsplitter_spark.operators.build import (
        build_index,
    )
    from elasticsearch_analysis_hashsplitter_spark.operators.multi import (
        MultiIndexEngine,
    )
    from elasticsearch_analysis_hashsplitter_spark.operators.search import (
        SearchEngine,
    )
    from elasticsearch_analysis_hashsplitter_spark.plans import (
        compile as qc,
    )

    from __spark_entry__ import TOK_CFG

    base = args.index_dir or tempfile.mkdtemp(prefix="hs_mi_probe_")
    merged_dir = os.path.join(base, "merged")
    shard_dirs = [os.path.join(base, f"s{i}") for i in range(N_SHARDS)]
    out: dict = {"rows": args.rows, "cores": args.cores,
                 "reps": args.reps, "shards": N_SHARDS}
    spark = make_spark(args.cores)
    try:
        reuse = args.index_dir and all(
            os.path.exists(os.path.join(d, "stats.json"))
            for d in [merged_dir] + shard_dirs
        )
        if not reuse:
            # corpus is only needed for the builds — a reused probe
            # run must not pay the 1M-row materialization
            docs = generate_corpus(
                spark, args.rows, partitions=args.cores * 2
            )
            docs = docs.persist()
            docs.count()
            t0 = time.time()
            shutil.rmtree(merged_dir, ignore_errors=True)
            build_index(docs, TOK_CFG, merged_dir, n_slices=4)
            out["build_merged_seconds"] = round(time.time() - t0, 1)
            t0 = time.time()
            for i, d in enumerate(shard_dirs):
                shutil.rmtree(d, ignore_errors=True)
                build_index(
                    docs.where(F.col("doc_id") % N_SHARDS == i),
                    TOK_CFG,
                    d,
                )
            out["build_shards_seconds"] = round(time.time() - t0, 1)
        whole = SearchEngine.open(spark, merged_dir)
        multi = MultiIndexEngine.open(
            spark, shard_dirs, [f"s{i}" for i in range(N_SHARDS)]
        )

        hot, nm_val, disj = "printf", "return", "printf return"
        whole.search(hot, k=10).collect()  # warm both stacks
        multi.search(hot, k=10).collect()

        # 1. dfs conjunctive identity + coordinator overhead ------------
        t_single, base_rows = best_of(
            args.reps, lambda: whole.search(hot, k=50).collect()
        )
        t_multi, multi_rows = best_of(
            args.reps, lambda: multi.search(hot, k=50).collect()
        )
        ids_ok = (
            [r["doc_id"] for r in multi_rows]
            == [r["doc_id"] for r in base_rows]
        )
        scores_ok = all(
            abs(m["score"] - b["score"]) <= 1e-9 * abs(b["score"])
            for m, b in zip(multi_rows, base_rows)
        )
        shard_attr_ok = all(
            r["index"] == f"s{r['doc_id'] % N_SHARDS}" for r in multi_rows
        )
        out["dfs_conjunctive"] = {
            "merged_seconds": round(t_single, 2),
            "multi_seconds": round(t_multi, 2),
            "overhead_x": round(t_multi / t_single, 2),
            "topk_ids_equal_merged": ids_ok,
            "scores_equal_merged_1e9": scores_ok,
            "shard_attribution_exact": shard_attr_ok,
        }

        # 2. dfs disjunctive identity ----------------------------------
        t_sd, base_d = best_of(
            args.reps, lambda: whole.search_any(disj, k=50).collect()
        )
        t_md, multi_d = best_of(
            args.reps, lambda: multi.search_any(disj, k=50).collect()
        )
        out["dfs_disjunctive"] = {
            "merged_seconds": round(t_sd, 2),
            "multi_seconds": round(t_md, 2),
            "overhead_x": round(t_md / t_sd, 2),
            "topk_ids_equal_merged": (
                [r["doc_id"] for r in multi_d]
                == [r["doc_id"] for r in base_d]
            ),
            "scores_equal_merged_1e9": all(
                abs(m["score"] - b["score"]) <= 1e-9 * abs(b["score"])
                for m, b in zip(multi_d, base_d)
            ),
        }

        # 3. global stats identity (exact ints) ------------------------
        node = qc.field_query(disj, TOK_CFG, scored=True)
        terms = sorted(set(node.terms))
        gs = multi.global_term_stats(terms)
        merged_df = {
            r["term"]: r["df"] for r in whole._term_stats(terms)
        }
        out["global_stats"] = {
            "n_docs_equal": gs["n_docs"] == whole.stats["n_docs"],
            "avgdl_rel_err": abs(gs["avgdl"] - whole.stats["avgdl"])
            / whole.stats["avgdl"],
            "df_all_equal": all(
                gs["dfs"].get(t) == merged_df.get(t) for t in terms
            ),
        }

        # 4. indices query at scale ------------------------------------
        # Branch coverage is score-dependent (one value's idf can own
        # the whole mixed top-k), so each branch is verified through a
        # run that can only contain it, plus the mixed run's per-row
        # check over whatever it surfaces.
        sel = ["s0", "s1"]
        main_terms = list(qc.field_query(hot, TOK_CFG).terms)
        nm_terms = list(qc.field_query(nm_val, TOK_CFG).terms)

        def merged_scores(terms, ids):
            return {
                r["doc_id"]: r["score"]
                for r in whole.bm25_scores(terms)
                .where(F.col("doc_id").isin(ids))
                .collect()
            }

        def branch_check(rows):
            ids = [r["doc_id"] for r in rows]
            ms = merged_scores(main_terms, ids)
            ns = merged_scores(nm_terms, ids)
            for r in rows:
                want = (
                    ms if r["doc_id"] % N_SHARDS in (0, 1) else ns
                ).get(r["doc_id"])
                if want is None or abs(r["score"] - want) > 1e-9 * abs(
                    want
                ):
                    return False
            return True

        t_iq, iq_rows = best_of(
            args.reps,
            lambda: multi.indices_search(
                sel, hot, no_match=nm_val, k=50
            ).collect(),
        )
        main_only = multi.indices_search(
            sel, hot, no_match="none", k=20
        ).collect()
        out["indices_query"] = {
            "seconds": round(t_iq, 2),
            "overhead_x_vs_single_query": round(t_iq / t_single, 2),
            "rows": len(iq_rows),
            "mixed_rows_per_branch": {
                "main": sum(1 for r in iq_rows if r["index"] in sel),
                "no_match": sum(
                    1 for r in iq_rows if r["index"] not in sel
                ),
            },
            "mixed_per_row_scores_match_merged_branch": branch_check(
                iq_rows
            ),
            "main_branch_rows_all_sel_shards": all(
                r["index"] in sel for r in main_only
            ),
            "main_branch_scores_match_merged": branch_check(main_only),
        }

        # 6. _msearch batch amortization -------------------------------
        # The per-query coordinator overhead (section 1) is fixed
        # per-pipeline driver cost; a 64-query batch should amortize it
        # toward the merged-engine batch kernel's cost.
        from elasticsearch_analysis_hashsplitter_spark.corpus import (
            _VOCAB,
        )
        from elasticsearch_analysis_hashsplitter_spark.operators.search import (  # noqa: E501
            bm25_topk_batch,
        )

        vals = {
            f"q{i}": str(_VOCAB[(7 * i) % len(_VOCAB)])
            for i in range(64)
        }
        qmap = {
            qid: list(qc.field_query(v, TOK_CFG).terms)
            for qid, v in vals.items()
        }
        bm25_topk_batch(whole, qmap, k=10).count()  # compile + warm
        multi.search_batch(vals, k=10).count()
        t_mb, _ = best_of(
            args.reps, lambda: bm25_topk_batch(whole, qmap, k=10).count()
        )
        t_ab, _ = best_of(
            args.reps, lambda: multi.search_batch(vals, k=10).count()
        )
        merged_batch = {
            (r["query_id"], r["rank"]): r
            for r in bm25_topk_batch(whole, qmap, k=10).collect()
        }
        alias_batch = {
            (r["query_id"], r["rank"]): r
            for r in multi.search_batch(vals, k=10).collect()
        }
        batch_parity = set(merged_batch) == set(alias_batch) and all(
            a["doc_id"] == merged_batch[key]["doc_id"]
            and abs(a["score"] - merged_batch[key]["score"])
            <= 1e-9 * abs(merged_batch[key]["score"])
            for key, a in alias_batch.items()
        )
        out["msearch_batch"] = {
            "queries": 64,
            "merged_batch_seconds": round(t_mb, 2),
            "alias_batch_seconds": round(t_ab, 2),
            "overhead_x": round(t_ab / t_mb, 2),
            "alias_qps": round(64 / t_ab, 1),
            "per_query_amortized_x_vs_single": round(
                (t_ab / 64) / t_multi, 3
            ),
            "parity_rows_scores_1e9": batch_parity,
        }

        # 7. concurrent alias serving ----------------------------------
        reqs = {
            f"r{i}": str(_VOCAB[(11 * i + 3) % len(_VOCAB)])
            for i in range(32)
        }
        multi.serve(dict(list(reqs.items())[:4]), k=10)  # warm lanes
        t0 = time.time()
        served = multi.serve(reqs, k=10, max_workers=8)
        t_serve = time.time() - t0
        spot = list(reqs)[::8]
        spot_ok = True
        for qid in spot:
            want = [
                (r["doc_id"], r["index"])
                for r in multi.search(reqs[qid], k=10).collect()
            ]
            if [(d, i) for d, _, i in served[qid]] != want:
                spot_ok = False
        t0 = time.time()
        served_w = multi.serve(
            reqs, k=10, max_workers=32, window_ms=150
        )
        t_serve_w = time.time() - t0
        wide_ok = all(
            [(d, i) for d, _, i in served_w[q]]
            == [(d, i) for d, _, i in served[q]]
            for q in reqs
        )
        out["alias_serving"] = {
            "clients": 8,
            "requests": 32,
            "qps": round(32 / t_serve, 1),
            "spot_answers_match_search": spot_ok,
            # all 32 clients at once + a wide window -> one or two
            # waves: per-wave x per-shard plan-compile amortizes and
            # throughput approaches the msearch batch path
            "qps_wide_window": round(32 / t_serve_w, 1),
            "wide_window_answers_identical": wide_ok,
        }

        # 5. count fan-out ---------------------------------------------
        pnode = qc.prefix_query("ret", TOK_CFG)
        out["count_fanout"] = {
            "multi": multi.count(pnode),
            "merged": whole.count(pnode),
            "equal": multi.count(pnode) == whole.count(pnode),
        }

        print(json.dumps(out))
        return 0
    finally:
        spark.stop()
        if not args.index_dir:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
