"""Multi-index search (the ES alias / index-list fan-out the plugin
always ran under): ``dfs_query_then_fetch`` global weights must
reproduce the single-merged-index ranking EXACTLY when doc spaces are
disjoint — that identity (scores to 1e-9) is the core pin here, across
conjunctive, disjunctive, absent-term, pagination, and tombstone
scenarios. The ES-default ``query_then_fetch`` mode is pinned to
per-index local scoring, and config mismatches must refuse loudly."""

import pytest

from elasticsearch_analysis_hashsplitter_spark.config import HashSplitterConfig
from elasticsearch_analysis_hashsplitter_spark.operators.multi import (
    MultiIndexEngine,
)
from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
)
from elasticsearch_analysis_hashsplitter_spark.plans import compile as qc

CFG = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)

# 30 docs, same shape as the deletes suite: "join" hot, "merg" in two
# thirds, "scan" only in doc_ids % 8 == 0 (all EVEN — an absent-term
# index scenario for free), filler varying dl
DOCS = [
    (
        i,
        " ".join(
            ["join"] * (1 + i % 3)
            + (["merg"] * (1 + i % 2) if i % 3 != 2 else [])
            + (["scan"] if i % 8 == 0 else [])
            + [f"fil{j}" for j in range(i % 5)]
        ),
    )
    for i in range(30)
]


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, content string")


def _eng(spark, docs):
    return SearchEngine.from_corpus(_df(spark, docs), CFG, num_partitions=2)


@pytest.fixture(scope="module")
def whole(spark):
    return _eng(spark, DOCS)


@pytest.fixture(scope="module")
def parts(spark):
    even = _eng(spark, [d for d in DOCS if d[0] % 2 == 0])
    odd = _eng(spark, [d for d in DOCS if d[0] % 2 == 1])
    return even, odd


@pytest.fixture(scope="module")
def multi(parts):
    return MultiIndexEngine(list(parts), ["even", "odd"])


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _assert_same_ranking(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_dfs_equals_merged_conjunctive(multi, whole):
    got = _rows(multi.search("join merg", k=10))
    want = _rows(whole.search("join merg", k=10))
    _assert_same_ranking(got, want)


def test_dfs_equals_merged_disjunctive(multi, whole):
    got = _rows(multi.search_any("scan merg", k=12))
    want = _rows(whole.search_any("scan merg", k=12))
    _assert_same_ranking(got, want)


def test_term_absent_from_one_index(multi, whole):
    # "scan" lives only in even doc_ids: the odd index contributes
    # nothing to the conjunction and must not break the merge
    got = _rows(multi.search("join scan", k=10))
    want = _rows(whole.search("join scan", k=10))
    assert got and all(d % 2 == 0 for d, _ in got)
    _assert_same_ranking(got, want)


def test_index_attribution(multi):
    rows = multi.search("join merg", k=10).collect()
    for r in rows:
        assert r["index"] == ("even" if r["doc_id"] % 2 == 0 else "odd")


def test_after_pagination_walks_full_ranking(multi, whole):
    want = _rows(whole.search("join merg", k=30))
    walked = []
    cur = None
    while True:
        page = multi.search("join merg", k=4, after=cur).collect()
        if not page:
            break
        walked.extend((r["doc_id"], r["score"]) for r in page)
        last = page[-1]
        cur = (last["score"], last["doc_id"], last["index"])
    _assert_same_ranking(walked, want)


def test_after_requires_index_tiebreak(multi):
    with pytest.raises(ValueError, match=r"\(score, doc_id, index\)"):
        multi.search("join", k=5, after=(1.0, 3))


def test_query_then_fetch_scores_locally(multi, parts):
    # ES default mode: each index ranks with its OWN stats — rows for
    # an index must carry that engine's local scores, not global ones
    got = multi.search("join merg", k=30, dfs=False).collect()
    local = {}
    for eng, name in zip(parts, ("even", "odd")):
        for r in eng.search("join merg", k=30).collect():
            local[(name, r["doc_id"])] = r["score"]
    assert got
    for r in got:
        assert r["score"] == pytest.approx(
            local[(r["index"], r["doc_id"])], abs=1e-9
        )


def test_overlapping_doc_ids_kept_distinct(spark):
    a = _eng(spark, [(0, "join merg"), (1, "join")])
    b = _eng(spark, [(0, "join merg fil0"), (2, "merg")])
    m = MultiIndexEngine([a, b], ["a", "b"])
    rows = m.search("join merg", k=10).collect()
    zero = [(r["index"], r["score"]) for r in rows if r["doc_id"] == 0]
    assert len(zero) == 2  # same id in both indexes: two distinct hits
    assert {i for i, _ in zero} == {"a", "b"}
    # strict total order: the page cursor can split the (score, doc_id)
    # tie only because the index name participates
    full = [(r["score"], r["doc_id"], r["index"]) for r in rows]
    assert full == sorted(full, key=lambda t: (-t[0], t[1], t[2]))


def test_deletes_stay_masked_and_stats_stale(spark):
    even = _eng(spark, [d for d in DOCS if d[0] % 2 == 0])
    odd = _eng(spark, [d for d in DOCS if d[0] % 2 == 1])
    m = MultiIndexEngine([even, odd], ["even", "odd"])
    before = _rows(m.search("join merg", k=30))
    victims = [before[0][0], before[1][0]]
    for eng in (even, odd):
        eng.delete_docs([v for v in victims if v in
                         {d for d, _ in _rows(eng.search('join merg', k=30))}])
    after = _rows(m.search("join merg", k=30))
    assert not set(victims) & {d for d, _ in after}
    # Lucene stats-stale-until-merge, now ACROSS indexes: survivors'
    # global weights (summed stored dfs) are unchanged by the delete
    stale = {d: s for d, s in before}
    for d, s in after:
        assert s == pytest.approx(stale[d], abs=1e-9)


def test_unscored_fanout_and_count(multi, whole):
    node = qc.field_query("merg", CFG, scored=False)
    assert multi.count(node) == whole.count(node)
    rows = multi.docs(node).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in whole.docs(node).collect()
    )
    for r in rows:
        assert r["index"] == ("even" if r["doc_id"] % 2 == 0 else "odd")
    assert sorted(r["doc_id"] for r in multi.term("join merg").collect()) \
        == sorted(r["doc_id"] for r in whole.term("join merg").collect())


def test_config_mismatch_refuses(spark, parts):
    other = SearchEngine.from_corpus(
        _df(spark, DOCS[:4]),
        HashSplitterConfig(
            chunk_length=2, token_mode="tokens", apply_input_cap=False
        ),
        num_partitions=2,
    )
    with pytest.raises(ValueError, match="different analyzer"):
        MultiIndexEngine([parts[0], other])
    with pytest.raises(ValueError, match="duplicate"):
        MultiIndexEngine(list(parts), ["x", "x"])
    with pytest.raises(ValueError, match="at least one"):
        MultiIndexEngine([])


def test_open_multi_from_disk(spark, tmp_path):
    from elasticsearch_analysis_hashsplitter_spark.operators.build import (
        build_index,
    )

    dirs = []
    for name, par in (("idx_even", 0), ("idx_odd", 1)):
        d = str(tmp_path / name)
        build_index(
            _df(spark, [x for x in DOCS if x[0] % 2 == par]),
            CFG,
            d,
            id_col="doc_id",
            text_col="content",
        )
        dirs.append(d)
    m = MultiIndexEngine.open(spark, dirs)
    assert m.names == ["idx_even", "idx_odd"]
    got = _rows(m.search("join merg", k=10))
    want = _rows(
        _eng(spark, DOCS).search("join merg", k=10)
    )
    _assert_same_ranking(got, want)


# ---------------------------------------------------------------------------
# ES 0.19 indices query (IndicesQueryParser)
# ---------------------------------------------------------------------------


def test_indices_query_routes_per_index(multi, whole):
    # even runs "join merg", odd runs "join"; dfs global weights over a
    # disjoint split == full-corpus scoring restricted to each half
    got = multi.indices_search(
        ["even"], "join merg", no_match="join", k=30
    ).collect()
    full_main = dict(_rows(whole.search("join merg", k=30)))
    full_nm = dict(_rows(whole.search("join", k=30)))
    for r in got:
        if r["doc_id"] % 2 == 0:
            assert r["index"] == "even"
            assert r["score"] == pytest.approx(
                full_main[r["doc_id"]], abs=1e-9
            )
        else:
            assert r["index"] == "odd"
            assert r["score"] == pytest.approx(
                full_nm[r["doc_id"]], abs=1e-9
            )


def test_indices_query_no_match_none_skips(multi):
    got = multi.indices_search(["even"], "join", no_match="none", k=30)
    rows = got.collect()
    assert rows and all(r["doc_id"] % 2 == 0 for r in rows)
    assert all(r["index"] == "even" for r in rows)


def test_indices_query_no_match_all_constant_score(multi):
    got = multi.indices_search(
        ["even"], "join", no_match="all", k=60
    ).collect()
    odd = [r for r in got if r["index"] == "odd"]
    assert odd and all(r["score"] == 1.0 for r in odd)


def test_indices_query_unknown_names_inert(multi):
    # an index list addressing nothing this coordinator holds: every
    # member runs the no_match branch
    got = multi.indices_search(
        ["nope"], "join", no_match="none", k=30
    )
    assert got.count() == 0
    got2 = multi.indices_search(["nope"], "join", no_match="join", k=30)
    assert {r["index"] for r in got2.collect()} == {"even", "odd"}


# ---------------------------------------------------------------------------
# ES _msearch against the alias (search_batch)
# ---------------------------------------------------------------------------


def test_search_batch_equals_per_value_search(multi):
    vals = {"a": "join merg", "b": "join", "c": "scan"}
    got = multi.search_batch(vals, k=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, value in vals.items():
        want = multi.search(value, k=8).collect()
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [
            w["doc_id"] for w in want
        ], qid
        for r, w in zip(rows, want):
            assert r["score"] == pytest.approx(w["score"], abs=1e-9)
            assert r["index"] == w["index"]


def test_search_batch_skips_unmatchable_and_empty(multi):
    # "zzzz" analyzes to terms absent everywhere -> no rows for it;
    # an all-absent batch returns the empty frame with the full schema
    got = multi.search_batch({"a": "join", "z": "zzzz"}, k=5).collect()
    assert {r["query_id"] for r in got} == {"a"}
    empty = multi.search_batch({"z": "zzzz"}, k=5)
    assert empty.count() == 0
    assert empty.columns == [
        "query_id", "doc_id", "score", "rank", "index"
    ]


def test_serve_against_alias_matches_search(multi):
    reqs = {f"r{i}": v for i, v in enumerate(
        ["join merg", "join", "scan", "join merg", "merg"]
    )}
    got = multi.serve(reqs, k=6, max_workers=4, window_ms=20)
    assert set(got) == set(reqs)
    for qid, value in reqs.items():
        want = [
            (r["doc_id"], r["score"], r["index"])
            for r in multi.search(value, k=6).collect()
        ]
        assert [(d, i) for d, _, i in got[qid]] == [
            (d, i) for d, _, i in want
        ], qid
        for (_, gs, _), (_, ws, _) in zip(got[qid], want):
            assert gs == pytest.approx(ws, abs=1e-9)


def test_serve_result_cache_hits_and_invalidates(spark):
    even = _eng(spark, [d for d in DOCS if d[0] % 2 == 0])
    odd = _eng(spark, [d for d in DOCS if d[0] % 2 == 1])
    m = MultiIndexEngine([even, odd], ["even", "odd"])
    reqs = {f"r{i}": "join" for i in range(6)}  # one hot value
    first = m.serve(reqs, k=5, max_workers=3, result_cache=True)
    again = m.serve(reqs, k=5, max_workers=3, result_cache=True)
    assert again == first
    # a delete in ANY member index must invalidate cached answers
    victim = first["r0"][0][0]
    (even if victim % 2 == 0 else odd).delete_docs([victim])
    after = m.serve({"r": "join"}, k=5, max_workers=1,
                    result_cache=True)
    assert victim not in [d for d, _, _ in after["r"]]
