"""spark-submit entry point: query serving against a built index.

  spark-submit --py-files hashsplitter.zip tools/query_submit.py \\
      --index /path/to/index --op search --value "some_token" -k 10
  ... --op wildcard --value "d41?8*27e"
  ... --op range --lower 0000... --upper 2222...
  ... --op upsert --docs-json '[[7, "new content"], [900001, "inserted"]]'
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument(
        "--op",
        required=True,
        choices=["search", "search_any", "batch", "serve", "term", "chunk_term",
                 "prefix", "wildcard", "range", "count", "delete",
                 "delete_by_query", "upsert", "scroll", "mlt", "sort",
                 "highlight", "dis_max", "boosting", "match_all",
                 "custom_score", "analyze", "percolate", "has_child",
                 "has_parent", "top_children", "script_filter",
                 "custom_filters_score", "ids", "custom_boost_factor",
                 "multi_search", "msearch", "mserve", "indices", "scan",
                 "validate"],
    )
    p.add_argument("--query-kind", default="field",
                   choices=["field", "prefix", "wildcard"],
                   help="how --value compiles for --op scan")
    p.add_argument("--max-pages", type=int, default=0,
                   help="page cap for --op scan (0 = walk to "
                        "exhaustion, like --op scroll)")
    p.add_argument("--indices", default=None,
                   help="comma-separated extra index dirs — --index plus "
                        "these form the alias for --op multi_search / "
                        "indices (ES multi-index fan-out)")
    p.add_argument("--match-indices", default=None,
                   help="comma-separated index NAMES (dir basenames) that "
                        "run the main query for --op indices")
    p.add_argument("--no-match", default="none",
                   help="indices-query no_match branch: none | all | a "
                        "value string")
    p.add_argument("--filter-ids", default=None,
                   help="comma-separated doc ids for an ES ids filter on "
                        "--op search (constant-score membership)")
    p.add_argument("--factor", type=float, default=2.0,
                   help="boost factor for --op custom_boost_factor")
    p.add_argument("--parent-col", default="source",
                   help="corpus column playing ES's _parent routing key "
                        "(has_child / has_parent / top_children)")
    p.add_argument("--parent-pred", default=None,
                   help="has_parent: Catalyst predicate over the parent "
                        "key column `parent`, e.g. \"parent LIKE 'a%%'\"")
    p.add_argument("--score-mode", default=None,
                   help="top_children: max|sum|avg; "
                        "custom_filters_score: first|min|max|total|avg|"
                        "multiply (defaults: max / first)")
    p.add_argument("--filters-json", default=None,
                   help="custom_filters_score: JSON list of "
                        '[kind, value, boost] with kind in '
                        "field|prefix|wildcard")
    p.add_argument("--queries-json", default=None,
                   help="percolate: registered queries as a JSON list of "
                        '[name, kind, value] with kind in '
                        "field|prefix|wildcard|not_field (the ES "
                        "_percolator registry)")
    p.add_argument("--script", default=None,
                   help="custom_score: Catalyst SQL expression over "
                        "_score + source columns (ES script analogue)")
    p.add_argument("--tie-breaker", type=float, default=0.0,
                   help="dis_max tie breaker: score = max + "
                        "tie_breaker * (sum - max) over the clause "
                        "scores (0 = best clause wins)")
    p.add_argument("--negative-prefix", default=None,
                   help="ES boosting query negative clause: demote "
                        "docs matching this prefix query")
    p.add_argument("--negative-boost", type=float, default=0.2,
                   help="score multiplier for negative matches "
                        "(--op boosting)")
    p.add_argument("--must-not-prefix", default=None,
                   help="ES bool must_not: exclude docs matching this "
                        "prefix query (search / search_any)")
    p.add_argument("--min-should-match", type=int, default=1,
                   help="ES minimum_should_match over the analyzed "
                        "terms (search_any)")
    p.add_argument("--page-size", type=int, default=10,
                   help="rows per page for --op scroll")
    p.add_argument("--doc-id", type=int, default=None,
                   help="source document id for --op mlt")
    p.add_argument("--source-parquet", default=None,
                   help="corpus (_source) parquet for --op mlt/sort/"
                        "highlight: columns (doc_id, <text-col>, ...)")
    p.add_argument("--text-col", default="content")
    p.add_argument("--field", default=None,
                   help="sort field for --op sort")
    p.add_argument("--asc", action="store_true", default=False)
    p.add_argument("--docs-json", default=None,
                   help='inline docs for --op upsert: [[id, "text"], ...] '
                        "(each row replaces the stored doc with its id, "
                        "or inserts it if absent — the ES bulk index/"
                        "update model)")
    p.add_argument("--docs-parquet", default=None,
                   help="parquet path of (doc_id, content) rows for "
                        "--op upsert (the at-scale input form)")
    p.add_argument("--ids", default=None,
                   help="comma-separated doc ids for --op delete "
                        "(tombstoned: masked by every query, purged by "
                        "compact_submit)")
    p.add_argument("--value", default=None)
    p.add_argument("--values", default=None,
                   help="comma-separated query values for --op batch "
                        "(one BM25 top-k per value, ONE Spark job total) "
                        "or --op serve (concurrent clients, coalesced "
                        "into micro-batched jobs by a dispatcher)")
    p.add_argument("--workers", type=int, default=8,
                   help="client threads for --op serve")
    p.add_argument("--shards", type=int, default=0,
                   help="enable the doc-sharded serving layout with "
                        "this many shards before serving (0 = off); "
                        "coalesced batches then run as one "
                        "shuffle-free stage")
    p.add_argument("--no-coalesce", dest="coalesce", action="store_false",
                   default=True,
                   help="serve with per-request jobs instead of the "
                        "micro-batching dispatcher (pair with "
                        "--conf spark.scheduler.mode=FAIR)")
    p.add_argument("--lower", default=None)
    p.add_argument("--upper", default=None)
    p.add_argument("--include-lower", action="store_true", default=True)
    p.add_argument("--exclude-lower", dest="include_lower", action="store_false")
    p.add_argument("--include-upper", action="store_true", default=True)
    p.add_argument("--exclude-upper", dest="include_upper", action="store_false")
    p.add_argument("-k", type=int, default=10)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from elasticsearch_analysis_hashsplitter_spark.operators.search import (
        SearchEngine,
    )

    spark = SparkSession.builder.appName("hashsplitter-query").getOrCreate()

    if args.op in ("multi_search", "msearch", "mserve", "indices"):
        from elasticsearch_analysis_hashsplitter_spark.operators.multi import (
            MultiIndexEngine,
        )

        dirs = [args.index] + [
            d for d in (args.indices or "").split(",") if d
        ]
        if len(dirs) < 2:
            raise SystemExit(f"--op {args.op} needs --indices dir2[,...]")
        m = MultiIndexEngine.open(spark, dirs)
        if args.op == "mserve":
            vals = [v for v in (args.values or "").split(",") if v]
            if not vals:
                raise SystemExit("--op mserve needs --values a,b,...")
            got = m.serve(
                {f"q{i}": v for i, v in enumerate(vals)},
                k=args.k,
                max_workers=args.workers,
            )
            print(json.dumps(
                {qid: got[qid] for qid in sorted(got)}
            ))
            return 0
        if args.op == "msearch":
            vals = [v for v in (args.values or "").split(",") if v]
            if not vals:
                raise SystemExit("--op msearch needs --values a,b,...")
            rows = m.search_batch(
                {f"q{i}": v for i, v in enumerate(vals)}, k=args.k
            ).orderBy("query_id", "rank").collect()
            print(json.dumps([
                (r["query_id"], r["doc_id"], r["score"], r["index"])
                for r in rows
            ]))
            return 0
        if not args.value:
            raise SystemExit(f"--op {args.op} needs --value")
        if args.op == "multi_search":
            rows = m.search(args.value, k=args.k).collect()
        else:
            sel = [
                s for s in (args.match_indices or "").split(",") if s
            ]
            if not sel:
                raise SystemExit("--op indices needs --match-indices")
            rows = m.indices_search(
                sel, args.value, no_match=args.no_match, k=args.k
            ).collect()
        print(json.dumps(
            [(r["doc_id"], r["score"], r["index"]) for r in rows]
        ))
        return 0

    eng = SearchEngine.open(spark, args.index)

    def _must_not():
        if args.must_not_prefix is None:
            return None
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        return qc.prefix_query(args.must_not_prefix, eng.cfg)

    def _source():
        if not args.source_parquet:
            raise SystemExit(f"--op {args.op} needs --source-parquet")
        return spark.read.parquet(args.source_parquet)

    if args.op == "search":
        fl = None
        if args.filter_ids:
            from elasticsearch_analysis_hashsplitter_spark.plans import (
                compile as qc,
            )

            fl = qc.ids_query(
                i for i in args.filter_ids.split(",") if i
            )
        rows = eng.search(args.value, k=args.k,
                          must_not=_must_not(), filter=fl).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op == "scan":
        if not args.value:
            raise SystemExit("--op scan needs --value")
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        builders = {
            "field": lambda v: qc.field_query(v, eng.cfg, scored=False),
            "prefix": lambda v: qc.prefix_query(v, eng.cfg),
            "wildcard": lambda v: qc.wildcard_query(v, eng.cfg),
        }
        pages = [
            [int(r["doc_id"]) for r in page]
            for page in eng.scroll_scan(
                builders[args.query_kind](args.value),
                page_size=args.page_size,
                max_pages=args.max_pages or None,
            )
        ]
        print(json.dumps(pages))
    elif args.op == "validate":
        if not args.value:
            raise SystemExit("--op validate needs --value")
        print(json.dumps(eng.validate(args.value)))
    elif args.op == "ids":
        if not args.ids:
            raise SystemExit("--op ids needs --ids a,b,...")
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        rows = eng.docs(
            qc.ids_query(i for i in args.ids.split(",") if i)
        ).collect()
        print(json.dumps(sorted(r["doc_id"] for r in rows)))
    elif args.op == "custom_boost_factor":
        if not args.value:
            raise SystemExit("--op custom_boost_factor needs --value")
        rows = eng.custom_boost_factor(
            args.value, args.factor, k=args.k
        ).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op == "search_any":
        rows = eng.search_any(
            args.value, k=args.k, must_not=_must_not(),
            min_should_match=args.min_should_match,
        ).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op == "dis_max":
        vals = [v for v in (args.values or "").split(",") if v]
        if not vals:
            raise SystemExit("--op dis_max needs --values a,b,...")
        rows = eng.dis_max(
            vals, k=args.k, tie_breaker=args.tie_breaker
        ).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op == "boosting":
        if args.negative_prefix is None:
            raise SystemExit("--op boosting needs --negative-prefix")
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        neg = qc.prefix_query(args.negative_prefix, eng.cfg)
        rows = eng.boosting(
            args.value, neg, negative_boost=args.negative_boost, k=args.k
        ).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op == "match_all":
        rows = eng.match_all(k=args.k).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op == "scroll":
        pages = [
            [(r["doc_id"], r["score"]) for r in page]
            for page in eng.scroll(args.value, page_size=args.page_size)
        ]
        print(json.dumps({"pages": len(pages),
                          "rows": sum(len(p) for p in pages),
                          "first": pages[0] if pages else [],
                          "last": pages[-1] if pages else []}))
    elif args.op == "mlt":
        if args.doc_id is None:
            raise SystemExit("--op mlt needs --doc-id")
        rows = eng.more_like_this(
            args.doc_id, _source(), text_col=args.text_col, k=args.k
        ).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op == "sort":
        if not args.field:
            raise SystemExit("--op sort needs --field")
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        node = qc.field_query(args.value, eng.cfg, scored=False)
        # ES multi-clause sort: --field "lang,-n_chars" (leading '-'
        # = desc); a single bare name keeps the --asc flag semantics
        clauses = [f for f in args.field.split(",") if f]
        spec = [
            (f[1:], False) if f.startswith("-") else (f, True)
            for f in clauses
        ]
        if len(spec) == 1 and not args.field.startswith("-"):
            spec = [(spec[0][0], args.asc)]
        rows = eng.sort_search(
            node, _source(), spec, k=args.k
        ).collect()
        names = [f for f, _ in spec]
        print(json.dumps(
            [tuple([r["doc_id"]] + [r[f] for f in names]) for r in rows]
        ))
    elif args.op == "highlight":
        hits = eng.term(args.value)
        rows = (
            eng.highlight(hits, _source(), args.value,
                          text_col=args.text_col)
            .orderBy("doc_id").limit(args.k).collect()
        )
        print(json.dumps(
            [(r["doc_id"], r["n_matches"], r["fragment"]) for r in rows]
        ))
    elif args.op == "batch":
        from elasticsearch_analysis_hashsplitter_spark.operators.search import (
            bm25_topk_batch,
        )
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        qmap = {
            v: list(qc.field_query(v, eng.cfg, scored=True).terms)
            for v in (args.values or "").split(",")
            if v
        }
        rows = bm25_topk_batch(eng, qmap, k=args.k).collect()
        out: dict[str, list] = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["score"])
            )
        print(json.dumps(out))
    elif args.op == "serve":
        if args.shards:
            eng.enable_serving_layout(args.shards)
        served = eng.serve(
            {v: v for v in (args.values or "").split(",") if v},
            k=args.k,
            max_workers=args.workers,
            coalesce=args.coalesce,
        )
        print(json.dumps(served))
    elif args.op == "custom_score":
        if not args.script:
            raise SystemExit("--op custom_score needs --script")
        rows = eng.custom_score(
            args.value, args.script, _source(), k=args.k
        ).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op in ("has_child", "has_parent", "top_children"):
        if args.op in ("has_child", "top_children") and not args.value:
            raise SystemExit(f"--op {args.op} needs --value")
        if args.op == "has_parent":
            if not args.parent_pred:
                raise SystemExit("--op has_parent needs --parent-pred")
            rows = eng.has_parent(
                args.parent_pred, _source(), parent_col=args.parent_col
            ).collect()
            print(json.dumps(sorted(r["doc_id"] for r in rows)))
        elif args.op == "has_child":
            from elasticsearch_analysis_hashsplitter_spark.plans import (
                compile as qc,
            )

            node = qc.field_query(args.value, eng.cfg, scored=False)
            rows = eng.has_child(
                node, _source(), parent_col=args.parent_col
            ).collect()
            print(json.dumps(sorted(r["parent"] for r in rows)))
        else:
            rows = eng.top_children(
                args.value, _source(), parent_col=args.parent_col,
                score_mode=args.score_mode or "max", k=args.k,
            ).collect()
            print(json.dumps([(r["parent"], r["score"]) for r in rows]))
    elif args.op == "script_filter":
        if not args.value:
            raise SystemExit("--op script_filter needs --value")
        if not args.script:
            raise SystemExit("--op script_filter needs --script")
        rows = eng.script_filter(
            args.value, args.script, _source(), k=args.k
        ).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op == "custom_filters_score":
        if not args.value:
            raise SystemExit("--op custom_filters_score needs --value")
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        builders = {
            "field": lambda v: qc.field_query(v, eng.cfg, scored=False),
            "prefix": lambda v: qc.prefix_query(v, eng.cfg),
            "wildcard": lambda v: qc.wildcard_query(v, eng.cfg),
        }
        spec = json.loads(args.filters_json or "[]")
        filters = [
            (builders[kind](value), float(boost))
            for kind, value, boost in spec
        ]
        rows = eng.custom_filters_score(
            args.value, filters, score_mode=args.score_mode or "first",
            k=args.k,
        ).collect()
        print(json.dumps([(r["doc_id"], r["score"]) for r in rows]))
    elif args.op == "analyze":
        # ES _analyze against this index's analyzer: token stream with
        # position + offsets (driver-side pure kernels; same functions
        # the distributed analyze_stream vectorizes)
        import re as _re

        from elasticsearch_analysis_hashsplitter_spark.functions.tokenize import (
            chunk_tokens_with_offsets,
            chunk_value_with_offsets,
        )

        if args.value is None:
            raise SystemExit("--op analyze needs --value")
        if eng.cfg.token_mode == "value":
            toks = [
                {"token": t, "position": i, "start_offset": s,
                 "end_offset": e}
                for i, (t, s, e) in enumerate(
                    chunk_value_with_offsets(args.value, eng.cfg)
                )
            ]
        else:
            pairs = [
                (m.group(0), m.start())
                for m in _re.finditer(eng.cfg.token_pattern, args.value)
            ]
            toks = [
                {"token": t, "position": pos, "start_offset": s,
                 "end_offset": e}
                for t, pos, s, e in chunk_tokens_with_offsets(
                    pairs, eng.cfg
                )
            ]
        print(json.dumps({"tokens": toks}))
    elif args.op == "range":
        df = eng.range(args.lower, args.upper, args.include_lower,
                       args.include_upper)
        print(json.dumps([r["doc_id"] for r in df.limit(args.k * 100).collect()]))
    elif args.op == "count":
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        node = qc.field_query(args.value, eng.cfg, scored=False)
        print(json.dumps({"count": eng.count(node)}))
    elif args.op == "delete":
        ids = [int(x) for x in (args.ids or "").split(",") if x]
        added = eng.delete_docs(ids)
        print(json.dumps(
            {"tombstoned": added, "deleted_total": eng.deleted_count}
        ))
    elif args.op == "upsert":
        from elasticsearch_analysis_hashsplitter_spark.streaming.incremental import (
            upsert_docs,
        )

        if args.docs_parquet:
            docs = spark.read.parquet(args.docs_parquet)
        elif args.docs_json:
            docs = spark.createDataFrame(
                [(int(i), str(t)) for i, t in json.loads(args.docs_json)],
                "doc_id long, content string",
            )
        else:
            raise SystemExit("--op upsert needs --docs-json or --docs-parquet")
        res = upsert_docs(spark, args.index, docs, eng.cfg)
        print(json.dumps({"upserted": res["upserted"],
                          "replaced": res["replaced"],
                          "n_docs": res["stats"]["n_docs"]}))
    elif args.op == "percolate":
        # ES percolate: match doc(s) against the registered query set.
        # Single-doc shape (--value = the doc text) or batch shape
        # (--source-parquet with --id-col/--text-col).
        from elasticsearch_analysis_hashsplitter_spark.operators.percolate import (  # noqa: E501
            Percolator,
        )
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        if not args.queries_json:
            raise SystemExit("--op percolate needs --queries-json")
        perc = Percolator(spark, eng.cfg)
        for name, kind, value in json.loads(args.queries_json):
            if kind == "field":
                node = qc.field_query(value, eng.cfg, scored=False)
            elif kind == "prefix":
                node = qc.prefix_query(value, eng.cfg)
            elif kind == "wildcard":
                node = qc.wildcard_query(value, eng.cfg)
            elif kind == "not_field":
                node = qc.bool_filter(
                    must_not=[qc.field_query(value, eng.cfg, scored=False)]
                )
            else:
                raise SystemExit(f"unknown percolate query kind {kind!r}")
            perc.register(name, node)
        if args.value is not None:
            docs = spark.createDataFrame(
                [(0, args.value)], "doc_id long, text string"
            )
            out = perc.percolate(docs)
            print(json.dumps(sorted(r["query_name"] for r in out.collect())))
        else:
            out = perc.percolate(
                _source(), id_col="doc_id", text_col=args.text_col
            )
            rows = out.orderBy("doc_id", "query_name").collect()
            print(json.dumps(
                [[r["doc_id"], r["query_name"]] for r in rows]
            ))
    elif args.op == "delete_by_query":
        from elasticsearch_analysis_hashsplitter_spark.plans import (
            compile as qc,
        )

        node = qc.field_query(args.value, eng.cfg, scored=False)
        added = eng.delete_by_query(node)
        print(json.dumps(
            {"tombstoned": added, "deleted_total": eng.deleted_count}
        ))
    else:
        df = getattr(eng, args.op)(args.value)
        print(json.dumps([r["doc_id"] for r in df.limit(args.k * 100).collect()]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
