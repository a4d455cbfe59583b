"""Concurrent query serving: SearchEngine.serve must return exactly the
sequential search() answers for every client, with requests running from
a thread pool (scheduler-pool-tagged jobs)."""

from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
)

from .test_spark_engine import SMALL_CORPUS, TOKEN_CFG, _corpus_df


def test_serve_matches_sequential(spark):
    eng = SearchEngine.from_corpus(
        _corpus_df(spark, SMALL_CORPUS), TOKEN_CFG, num_partitions=4
    )
    values = ["spark", "join", "window", "stream", "spark join", "merge"]
    reqs = {f"c{i}": values[i % len(values)] for i in range(12)}
    served = eng.serve(reqs, k=5, max_workers=4)
    assert set(served) == set(reqs)
    for qid, value in reqs.items():
        want = [
            (r["doc_id"], r["score"])
            for r in eng.search(value, 5).collect()
        ]
        assert served[qid] == want, qid
    # scheduler-pool property is cleared after serving
    assert (
        spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None
    )
