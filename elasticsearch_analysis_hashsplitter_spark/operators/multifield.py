"""Multi-field indexes: one corpus, several hashsplitter-mapped fields.

The reference is an ES *field* mapper — an index can declare several
``hashsplitter`` fields, each with its own chunk_length / prefixes /
size (HashSplitterFieldMapper.TypeParser, field settings per mapping
JSON). The Spark-idiomatic layout is one postings/lexicon/docstats set
per field under a shared root (independent tables = independent
pruning, no cross-field term collisions, per-field configs evolve
independently); this module is the thin routing layer.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import HashSplitterConfig
from ..plans import compile as qc
from ..plans import ir
from .build import build_index
from .search import SearchEngine


def _fields_file(index_dir: str) -> str:
    return os.path.join(index_dir, "fields.json")


class MultiFieldEngine:
    """field name -> SearchEngine router (``engine[field].term(...)``)."""

    def __init__(self, engines: dict[str, SearchEngine]):
        self.engines = engines

    def __getitem__(self, field: str) -> SearchEngine:
        return self.engines[field]

    def fields(self) -> list[str]:
        return sorted(self.engines)

    def search_scored(
        self,
        values: dict[str, str],
        k: int = 10,
        require_all: bool = False,
        mode: str = "sum",
        tie_breaker: float = 0.0,
    ) -> DataFrame:
        """Cross-field scored BM25 top-k — the ES multi-field bool
        query shape over several hashsplitter-mapped fields (the
        reference registers one query per mapped field and ES sums the
        should-clause scores; HashSplitterFieldMapper.java fieldQuery
        per field). Each field's value is analyzed with THAT field's
        config and scored conjunctively over its chunk terms against
        its own sub-index statistics (df/avgdl per field, exactly as ES
        per-field similarity); the per-field score frames are combined
        on doc_id BEFORE ranking.

        ``mode="sum"`` (default): bool-should / multi_match
        most_fields — combined score is the sum of matching fields'
        scores. ``mode="max"``: multi_match best_fields — Lucene
        DisjunctionMaxQuery across the per-field clauses,
        ``max + tie_breaker * (sum - max)``. Same union + single
        groupBy plan either way; only the aggregate expression differs.

        ``require_all=False`` (default): docs matching ANY field rank.
        ``require_all=True``: bool-must — docs must match every field.
        Top-k ties break on doc_id asc, as everywhere in the engine.
        """
        if mode not in ("sum", "max"):
            raise ValueError(f"unknown combine mode: {mode!r}")
        parts = []
        any_engine = next(iter(self.engines.values()))
        for fname in sorted(values):
            eng = self.engines[fname]
            node = qc.field_query(values[fname], eng.cfg, scored=True)
            if isinstance(node, ir.MatchNone) or not isinstance(
                node, ir.ScoredTerms
            ):
                if require_all:
                    return any_engine._empty_scored()
                continue
            parts.append(eng.bm25_scores(list(node.terms)))
        if not parts:
            return any_engine._empty_scored()
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        if mode == "max":
            tb = float(tie_breaker)
            agg = union.groupBy("doc_id").agg(
                F.max("score").alias("mx"),
                F.sum("score").alias("sm"),
                F.count("*").alias("n_fields"),
            )
            agg = agg.withColumn(
                "score",
                F.col("mx") + F.lit(tb) * (F.col("sm") - F.col("mx")),
            )
        else:
            agg = union.groupBy("doc_id").agg(
                F.sum("score").alias("score"),
                F.count("*").alias("n_fields"),
            )
        if require_all:
            agg = agg.where(F.col("n_fields") == len(parts))
        return (
            agg.select("doc_id", "score")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )

    @classmethod
    def open(cls, spark: SparkSession, index_dir: str) -> "MultiFieldEngine":
        with open(_fields_file(index_dir)) as f:
            fields = json.load(f)["fields"]
        return cls(
            {
                name: SearchEngine.open(spark, os.path.join(index_dir, name))
                for name in fields
            }
        )


def build_multi_field_index(
    docs: DataFrame,
    field_configs: dict[str, tuple[str, HashSplitterConfig]],
    index_dir: str,
    id_col: str = "doc_id",
    **build_kwargs,
) -> dict[str, dict]:
    """Build one sub-index per mapped field.

    ``field_configs``: field name -> (source column, config). Each field
    build is an independent (and independently resumable) pipeline over
    the same corpus scan — fields do not share shuffles, exactly as ES
    fields do not share analyzers.
    """
    stats = {}
    for name, (col, cfg) in sorted(field_configs.items()):
        stats[name] = build_index(
            docs,
            cfg,
            os.path.join(index_dir, name),
            id_col=id_col,
            text_col=col,
            **build_kwargs,
        )
    os.makedirs(index_dir, exist_ok=True)
    with open(_fields_file(index_dir), "w") as f:
        json.dump({"fields": sorted(field_configs)}, f)
    return stats
