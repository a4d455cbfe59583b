"""Structured-Streaming incremental index: segments appended per
micro-batch must answer queries identically to a batch-built index, and
compaction must preserve results."""

import pytest

from elasticsearch_analysis_hashsplitter_spark.config import HashSplitterConfig
from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
)
from elasticsearch_analysis_hashsplitter_spark.streaming.incremental import (
    compact_index,
    refresh_stats,
    stream_index,
)

CFG = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)

BATCH1 = [
    (0, "spark join window merge"),
    (1, "spark spark filter scan"),
    (2, "join window batch"),
]
BATCH2 = [
    (3, "window window spark"),
    (4, "merge sort scan filter spark join"),
]


def test_stream_segments_match_batch(spark, tmp_path):
    src = tmp_path / "src"
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    schema = "doc_id long, content string"
    spark.createDataFrame(BATCH1, schema).write.parquet(
        str(src / "b1")
    )

    q = stream_index(
        spark, str(src / "*"), schema, CFG, idx, ckpt, num_partitions=2
    )
    q.awaitTermination()
    refresh_stats(spark, idx, CFG)

    eng = SearchEngine.open(spark, idx)
    assert eng.stats["n_docs"] == 3
    assert sorted(r.doc_id for r in eng.term("spark").collect()) == [0, 1]

    # second batch arrives; availableNow drains only the new file
    spark.createDataFrame(BATCH2, schema).write.parquet(str(src / "b2"))
    q = stream_index(
        spark, str(src / "*"), schema, CFG, idx, ckpt, num_partitions=2
    )
    q.awaitTermination()
    refresh_stats(spark, idx, CFG)

    eng = SearchEngine.open(spark, idx)
    assert eng.stats["n_docs"] == 5
    assert sorted(r.doc_id for r in eng.term("spark").collect()) == [0, 1, 3, 4]

    # equivalence with a one-shot batch build
    batch_eng = SearchEngine.from_corpus(
        spark.createDataFrame(BATCH1 + BATCH2, schema), CFG, num_partitions=2
    )
    for value in ("spark", "join", "window"):
        s = sorted(r.doc_id for r in eng.term(value).collect())
        b = sorted(r.doc_id for r in batch_eng.term(value).collect())
        assert s == b
    stream_top = [
        (r.doc_id, round(r.score, 9)) for r in eng.search("spark", 5).collect()
    ]
    batch_top = [
        (r.doc_id, round(r.score, 9))
        for r in batch_eng.search("spark", 5).collect()
    ]
    assert stream_top == batch_top

    # compaction preserves everything
    cidx = str(tmp_path / "cidx")
    compact_index(spark, idx, cidx, CFG, num_partitions=2)
    ceng = SearchEngine.open(spark, cidx)
    assert ceng.stats["n_docs"] == 5
    comp_top = [
        (r.doc_id, round(r.score, 9)) for r in ceng.search("spark", 5).collect()
    ]
    assert comp_top == stream_top
