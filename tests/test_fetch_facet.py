"""ES host-API parity around every query: _source fetch (the index
stores no field values — HashSplitterFieldMapper maps store:NO, docs
are served from _source; here the corpus table plays that role) and
the terms facet (ES 0.19's aggregation surface)."""

import pytest

from elasticsearch_analysis_hashsplitter_spark.config import HashSplitterConfig
from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
)
from elasticsearch_analysis_hashsplitter_spark.plans import compile as qc

CFG = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)

ROWS = [
    (i, " ".join(["join"] * (1 + i % 3) + ["merg"] * (i % 2)),
     ["py", "rs", "go"][i % 3], 10 + i)
    for i in range(18)
]
SCHEMA = "doc_id long, content string, lang string, n_chars int"


@pytest.fixture(scope="module")
def src(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


@pytest.fixture(scope="module")
def eng(src):
    return SearchEngine.from_corpus(src, CFG, num_partitions=2)


def test_fetch_joins_source_columns(eng, src):
    top = eng.search("join", k=3)
    got = {
        r["doc_id"]: r
        for r in eng.fetch(top, src, ["lang", "n_chars"]).collect()
    }
    exp = {r["doc_id"]: r["score"] for r in top.collect()}
    assert set(got) == set(exp)
    truth = {i: (lang, n) for i, _, lang, n in ROWS}
    for d, row in got.items():
        assert row["score"] == exp[d]
        assert (row["lang"], row["n_chars"]) == truth[d]
    # k rows broadcast against the corpus — never a corpus shuffle
    plan = eng.fetch(top, src, ["lang"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_terms_facet_counts_and_tombstones(eng, src):
    node = qc.field_query("join", CFG, scored=False)
    got = [
        (r["value"], r["count"])
        for r in eng.terms_facet(node, src, "lang", size=10).collect()
    ]
    # every doc matches "join"; 18 docs over 3 langs round-robin
    assert got == [("go", 6), ("py", 6), ("rs", 6)]
    eng.delete_docs([0, 3, 6])  # three py docs
    got = [
        (r["value"], r["count"])
        for r in eng.terms_facet(node, src, "lang", size=2).collect()
    ]
    assert got == [("go", 6), ("rs", 6)]  # size cap + live counts


def test_stats_facet_numeric_summary(spark, src):
    # own engine: the module fixture's tombstones must not leak in
    e = SearchEngine.from_corpus(src, CFG, num_partitions=2)
    node = qc.field_query("join", CFG, scored=False)
    row = e.stats_facet(node, src, "n_chars").collect()[0]
    # all 18 docs match; n_chars = 10..27
    assert row["count"] == 18
    assert row["min"] == 10.0 and row["max"] == 27.0
    assert row["total"] == 333.0
    assert row["mean"] == pytest.approx(333 / 18, abs=1e-12)
    assert row["sum_of_squares"] == 6645.0  # sum(i^2, 10..27)
    e.delete_docs([17])  # tombstone-aware like every facet
    row = e.stats_facet(node, src, "n_chars").collect()[0]
    assert row["count"] == 17 and row["max"] == 26.0


def test_histogram_facet_buckets(spark, src):
    e = SearchEngine.from_corpus(src, CFG, num_partitions=2)
    node = qc.field_query("merg", CFG, scored=False)  # odd doc_ids only
    got = [
        (r["key"], r["count"])
        for r in e.histogram_facet(node, src, "n_chars", 10.0).collect()
    ]
    # odd i -> n_chars 11,13,15,17,19 (bucket 10) and 21,23,25,27 (20)
    assert got == [(10.0, 5), (20.0, 4)]
    with pytest.raises(ValueError, match="interval"):
        e.histogram_facet(node, src, "n_chars", 0)


def test_range_facet_bounds_overlap_and_empty(spark, src):
    e = SearchEngine.from_corpus(src, CFG, num_partitions=2)
    node = qc.field_query("join", CFG, scored=False)  # all 18 docs
    got = [
        (r["lo"], r["hi"], r["count"], r["min"], r["max"], r["total"])
        for r in e.range_facet(
            node, src, "n_chars",
            [(None, 20.0), (15.0, 25.0), (20.0, None), (900.0, None)],
        ).collect()
    ]
    # n_chars 10..27; lo inclusive / hi exclusive / None open;
    # overlapping ranges double-count (ES semantics); empty -> zero row
    assert got[0] == (None, 20.0, 10, 10.0, 19.0, sum(range(10, 20)) * 1.0)
    assert got[1] == (15.0, 25.0, 10, 15.0, 24.0, sum(range(15, 25)) * 1.0)
    assert got[2] == (20.0, None, 8, 20.0, 27.0, sum(range(20, 28)) * 1.0)
    assert got[3] == (900.0, None, 0, None, None, None)
    with pytest.raises(ValueError, match="at least one range"):
        e.range_facet(node, src, "n_chars", [])


def test_mget_live_indexed_docs_only(spark, src):
    e = SearchEngine.from_corpus(src, CFG, num_partitions=2)
    got = {
        r["doc_id"]: (r["lang"], r["n_chars"])
        for r in e.get([2, 5, 999], src, ["lang", "n_chars"]).collect()
    }
    assert got == {2: ("go", 12), 5: ("go", 15)}  # 999 -> found:false
    e.delete_docs([5])
    assert [r["doc_id"] for r in e.get([2, 5], src).collect()] == [2]
    assert e.get([], src).count() == 0
    # indexed means a docstats row, not mere source membership: a
    # source row the index never ingested is not served
    wider = src.unionByName(
        spark.createDataFrame([(400, "ghost", "py", 9)], SCHEMA)
    )
    assert [r["doc_id"] for r in e.get([2, 400], wider).collect()] == [2]


def test_query_facet_counts_zero_row_and_tombstones(spark, src):
    e = SearchEngine.from_corpus(src, CFG, num_partitions=2)
    main = qc.field_query("join", CFG, scored=False)  # all 18 docs
    facets = {
        "merg": qc.field_query("merg", CFG, scored=False),  # odd ids
        "none": qc.field_query("zzzz", CFG, scored=False),  # nothing
        "all": qc.field_query("join", CFG, scored=False),
    }
    got = [
        (r["name"], r["count"])
        for r in e.query_facet(main, facets).collect()
    ]
    # name asc; the no-match facet still renders its zero row (ES
    # always returns every requested facet)
    assert got == [("all", 18), ("merg", 9), ("none", 0)]
    e.delete_docs([1, 3])  # two odd (merg-matching) docs
    got = dict(
        (r["name"], r["count"])
        for r in e.query_facet(main, facets).collect()
    )
    assert got == {"all": 16, "merg": 7, "none": 0}
    with pytest.raises(ValueError, match="facet"):
        e.query_facet(main, {})


def test_terms_stats_facet_per_term_stats_and_order(spark, src):
    e = SearchEngine.from_corpus(src, CFG, num_partitions=2)
    node = qc.field_query("merg", CFG, scored=False)  # odd ids: 9 docs
    got = [
        (r["term"], r["count"], r["min"], r["max"], r["total"], r["mean"])
        for r in e.terms_stats_facet(node, src, "lang", "n_chars").collect()
    ]
    # odd i in 0..17: lang cycle py/rs/go on i%3 -> rs@1,7,13 go@5,11,17
    # py@3,9,15; n_chars = 10+i
    import itertools
    exp = {}
    for i in range(1, 18, 2):
        exp.setdefault(["py", "rs", "go"][i % 3], []).append(10 + i)
    want = sorted(
        (
            (t, len(v), float(min(v)), float(max(v)), float(sum(v)),
             sum(v) / len(v))
            for t, v in exp.items()
        ),
        key=lambda x: (-x[1], x[0]),
    )
    assert got == want
    # size cap keeps the count-desc/term-asc prefix
    capped = e.terms_stats_facet(node, src, "lang", "n_chars", size=2)
    assert [r["term"] for r in capped.collect()] == [t for t, *_ in want[:2]]


def test_date_histogram_facet_month_buckets(spark, src):
    from pyspark.sql import functions as F

    e = SearchEngine.from_corpus(src, CFG, num_partitions=2)
    node = qc.field_query("join", CFG, scored=False)  # all 18 docs
    # derived ts: 2021-01-01 + 20*doc_id days -> months with gaps
    ts_src = src.select(
        "doc_id",
        F.date_add(
            F.lit("2021-01-01").cast("date"),
            (F.col("doc_id") * 20).cast("int"),
        ).alias("ts"),
    )
    got = [
        (r["key"].strftime("%Y-%m"), r["count"])
        for r in e.date_histogram_facet(node, ts_src, "ts", "month").collect()
    ]
    import datetime
    exp = {}
    for i in range(18):
        d = datetime.date(2021, 1, 1) + datetime.timedelta(days=20 * i)
        exp[d.strftime("%Y-%m")] = exp.get(d.strftime("%Y-%m"), 0) + 1
    assert got == sorted(exp.items())  # key asc, empty buckets absent
    with pytest.raises(ValueError, match="interval"):
        e.date_histogram_facet(node, ts_src, "ts", "fortnight")
