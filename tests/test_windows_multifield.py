"""Windowed event streaming (stream == batch oracle) and multi-field
index routing."""

import pytest

from pyspark.sql import functions as F

from elasticsearch_analysis_hashsplitter_spark.config import (
    CL4_LOWER_FIXED16,
    HashSplitterConfig,
)

SF_DIR = "/root/testdata/sf0.001"
EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_windowed_event_stats_stream_equals_batch(spark, tmp_path):
    from elasticsearch_analysis_hashsplitter_spark.streaming.windows import (
        stream_windowed_event_stats,
        windowed_event_stats,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_stats(events).collect()
    }
    assert batch  # non-degenerate

    src = str(tmp_path / "src")
    events.write.parquet(src)
    q = stream_windowed_event_stats(
        spark, src, EVENT_SCHEMA, str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    # append mode emits only watermark-closed windows; with availableNow
    # the final window may be held open, so assert subset + volume
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert streamed
    for key, val in streamed.items():
        assert batch[key] == val, key
    missing = set(batch) - set(streamed)
    # only windows near the stream's end may be missing (not yet closed)
    if missing:
        max_closed = max(ws for ws, _ in streamed)
        assert all(ws >= max_closed for ws, _ in missing)


def test_multi_field_index(spark, tmp_path):
    from elasticsearch_analysis_hashsplitter_spark.operators.multifield import (
        MultiFieldEngine,
        build_multi_field_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark join window", "0000111122223333"),
            (1, "merge sort spark", "0000111199999999"),
            (2, "window batch", "2222000000000000"),
        ],
        "doc_id long, body string, content_hash string",
    )
    body_cfg = HashSplitterConfig(
        chunk_length=4, token_mode="tokens", apply_input_cap=False
    )
    idx = str(tmp_path / "midx")
    stats = build_multi_field_index(
        docs,
        {
            "body": ("body", body_cfg),
            "content_hash": ("content_hash", CL4_LOWER_FIXED16),
        },
        idx,
        num_partitions=2,
    )
    assert stats["body"]["n_docs"] == 3
    eng = MultiFieldEngine.open(spark, idx)
    assert eng.fields() == ["body", "content_hash"]
    assert sorted(
        r.doc_id for r in eng["body"].term("spark").collect()
    ) == [0, 1]
    assert [
        r.doc_id for r in eng["content_hash"].wildcard("*3333").collect()
    ] == [0]
    assert sorted(
        r.doc_id
        for r in eng["content_hash"]
        .range("0000111100000000", "0000222200000000", True, True)
        .collect()
    ) == [0, 1]

    # cross-field scored BM25 (ES bool-should): per-field scores from
    # each field's OWN stats, summed on doc_id before ranking
    from elasticsearch_analysis_hashsplitter_spark.plans import (
        compile as qc,
    )

    got = eng.search_scored(
        {"body": "spark", "content_hash": "0000111122223333"}, k=3
    ).collect()
    body_terms = list(qc.field_query("spark", body_cfg).terms)
    hash_terms = list(
        qc.field_query("0000111122223333", CL4_LOWER_FIXED16).terms
    )
    body_s = {
        r["doc_id"]: r["score"]
        for r in eng["body"].bm25_scores(body_terms).collect()
    }
    hash_s = {
        r["doc_id"]: r["score"]
        for r in eng["content_hash"].bm25_scores(hash_terms).collect()
    }
    want = sorted(
        (
            (d, body_s.get(d, 0.0) + hash_s.get(d, 0.0))
            for d in set(body_s) | set(hash_s)
        ),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-12)
    # doc 0 matches BOTH fields -> must outrank content-only matches
    assert got[0]["doc_id"] == 0
    # require_all keeps only docs matching every field
    strict = eng.search_scored(
        {"body": "spark", "content_hash": "0000111122223333"},
        k=3,
        require_all=True,
    ).collect()
    assert [r["doc_id"] for r in strict] == [0]
    # a field value that matches nothing: should-mode falls back to the
    # other field; must-mode returns empty
    assert (
        eng.search_scored(
            {"body": "spark", "content_hash": "ffffffffffffffff"},
            k=3,
            require_all=True,
        ).count()
        == 0
    )
    loose = eng.search_scored(
        {"body": "spark", "content_hash": "ffffffffffffffff"}, k=3
    ).collect()
    assert sorted(r["doc_id"] for r in loose) == [0, 1]


def test_constant_score_paths(spark, tmp_path):
    from elasticsearch_analysis_hashsplitter_spark.operators.search import (
        SearchEngine,
    )

    docs = spark.createDataFrame(
        [(i, v) for i, v in enumerate(
            ["0000111122223333", "0000111199999999", "2222000000000000"]
        )],
        "doc_id long, content string",
    )
    eng = SearchEngine.from_corpus(docs, CL4_LOWER_FIXED16, num_partitions=2)
    rows = eng.search_wildcard("0000*", k=10, boost=2.5).collect()
    assert [(r.doc_id, r.score) for r in rows] == [(0, 2.5), (1, 2.5)]
    rows = eng.search_range(
        "0000111100000000", "0000222200000000", k=10
    ).collect()
    assert [(r.doc_id, r.score) for r in rows] == [(0, 1.0), (1, 1.0)]
