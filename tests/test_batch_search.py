"""Batched multi-query BM25: per-query results must be identical to the
single-query path (rank and score)."""

import pytest

from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
    bm25_topk_batch,
)
from elasticsearch_analysis_hashsplitter_spark.plans import compile as qc

from .test_spark_engine import SMALL_CORPUS, TOKEN_CFG, _corpus_df


@pytest.fixture(scope="module")
def eng(spark):
    return SearchEngine.from_corpus(
        _corpus_df(spark, SMALL_CORPUS), TOKEN_CFG, num_partitions=4
    )


def test_batch_matches_single(eng):
    qs = {
        "q_spark": list(qc.field_query("spark", TOKEN_CFG).terms),
        "q_join": list(qc.field_query("join", TOKEN_CFG).terms),
        "q_both": list(qc.field_query("spark join", TOKEN_CFG).terms),
        "q_hash": list(
            qc.field_query(
                "d41d8cd98f00b204e9800998ecf8427e", TOKEN_CFG
            ).terms
        ),
        "q_miss": ["Azzzz"],
    }
    batch = bm25_topk_batch(eng, qs, k=5)
    rows = batch.collect()
    by_q: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, terms in qs.items():
        single = [
            (r["doc_id"], r["score"])
            for r in eng.bm25_topk(terms, k=5).collect()
        ]
        got = by_q.get(qid, [])
        assert [d for d, _ in got] == [d for d, _ in single], qid
        for (_, gs), (_, es) in zip(got, single):
            assert gs == pytest.approx(es, rel=1e-9), qid


def test_batch_disjunctive(eng):
    qs = {
        "q1": list(qc.field_query("spark join", TOKEN_CFG).terms),
        "q2": list(qc.field_query("window stream", TOKEN_CFG).terms),
    }
    batch = bm25_topk_batch(eng, qs, k=5, conjunctive=False)
    rows = sorted(batch.collect(), key=lambda r: (r["query_id"], r["rank"]))
    for qid, terms in qs.items():
        single = [
            (r["doc_id"], r["score"])
            for r in eng.bm25_topk(terms, k=5, conjunctive=False).collect()
        ]
        got = [
            (r["doc_id"], r["score"]) for r in rows if r["query_id"] == qid
        ]
        assert [d for d, _ in got] == [d for d, _ in single], qid


def test_batch_empty(eng):
    assert bm25_topk_batch(eng, {}, k=5).count() == 0
