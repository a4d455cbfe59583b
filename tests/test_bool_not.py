"""ES bool must_not / minimum_should_match semantics (SURVEY.md §2.5 —
Lucene BooleanClause.Occur.MUST_NOT and minimumNumberShouldMatch, which
the host API composes around every plugin query unchanged).

Every doc-set result is checked against an independent pure-Python tree
evaluator over per-doc analyzed term sets — not against the engine's own
SQL rendering — so the distributed evaluation (single-scan bitmask with
the zero-bits widening, anti-join fallbacks) is verified, not mirrored.
"""

import pytest
from pyspark.sql import functions as F

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
from elasticsearch_analysis_hashsplitter_spark.plans.pattern import (
    glob_to_regex,
)

import re

CFG = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)

WORDS = [
    "spark", "sparse", "window", "windows", "flame", "flamingo",
    "join", "joint", "data", "date",
]


def _doc_text(i: int) -> str:
    # deterministic 3-word docs cycling the vocab with varied strides
    return " ".join(
        WORDS[(i * s + j) % len(WORDS)] for j, s in enumerate((1, 3, 7))
    )


N_DOCS = 40
DOC_TERMS = {
    i: set(analyze(_doc_text(i), CFG)) for i in range(N_DOCS)
}


def _eval(node: ir.Node, terms: set[str]) -> bool:
    """Independent reference evaluator for IR trees over a term set."""
    if isinstance(node, ir.MatchNone):
        return False
    if isinstance(node, ir.MatchAll):
        return True
    if isinstance(node, ir.TermEq):
        return node.term in terms
    if isinstance(node, ir.TermPrefixLen):
        return any(
            t.startswith(node.prefix)
            and node.min_len <= len(t) <= node.max_len
            for t in terms
        )
    if isinstance(node, ir.TermRangeLen):
        def ok(t):
            if not (node.min_len <= len(t) <= node.max_len):
                return False
            if node.lower is not None:
                if t < node.lower or (t == node.lower
                                      and not node.include_lower):
                    return False
            if node.upper is not None:
                if t > node.upper or (t == node.upper
                                      and not node.include_upper):
                    return False
            return True
        return any(ok(t) for t in terms)
    if isinstance(node, ir.TermPattern):
        rx = re.compile("^" + glob_to_regex(node.pattern, CFG) + "$")
        return any(rx.match(t) for t in terms)
    if isinstance(node, ir.ScoredTerms):
        ts = set(node.terms)
        if node.conjunctive:
            return ts <= terms
        return bool(ts & terms)
    if isinstance(node, ir.And):
        return all(_eval(c, terms) for c in node.children)
    if isinstance(node, ir.Or):
        return any(_eval(c, terms) for c in node.children)
    if isinstance(node, ir.Not):
        return not _eval(node.child, terms)
    raise TypeError(node)


def _expected(node: ir.Node) -> list[int]:
    return sorted(i for i, ts in DOC_TERMS.items() if _eval(node, ts))


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    return SearchEngine.from_corpus(df, CFG, num_partitions=4)


def _got(eng, node) -> list[int]:
    return [r["doc_id"] for r in eng.docs(node).orderBy("doc_id").collect()]


# ---------------------------------------------------------------- simplify
def test_simplify_not_folds():
    assert isinstance(ir.simplify(ir.Not(ir.MatchAll())), ir.MatchNone)
    assert isinstance(ir.simplify(ir.Not(ir.MatchNone())), ir.MatchAll)
    leaf = ir.TermEq("Aspar")
    assert ir.simplify(ir.Not(ir.Not(leaf))) == leaf
    # triple negation -> single
    assert ir.simplify(ir.Not(ir.Not(ir.Not(leaf)))) == ir.Not(leaf)


def test_bool_filter_shapes():
    a, b = ir.TermEq("Aspar"), ir.TermEq("Awind")
    # pure-negative bool folds to a bare complement (ES implicit match_all)
    n = qc.bool_filter(must_not=[a])
    assert n == ir.Not(a)
    # several must_not clauses fold to one complement of their union
    n = qc.bool_filter(must_not=[a, b])
    assert isinstance(n, ir.Not) and isinstance(n.child, ir.Or)
    # empty bool matches nothing (Lucene empty BooleanFilter)
    assert isinstance(qc.bool_filter(), ir.MatchNone)
    # must + should + must_not compose
    n = qc.bool_filter(must=[a], should=[b], must_not=[ir.TermEq("Aflam")])
    assert isinstance(n, ir.And) and len(n.children) == 3


# ----------------------------------------------------------- doc-set parity
def _fq(value):
    return qc.field_query(value, CFG, scored=False)


CASES = [
    # must + must_not (single-scan bitmask, zero vector unsatisfied)
    qc.bool_filter(must=[_fq("spark")], must_not=[qc.prefix_query("wind", CFG)]),
    # pure complement (zero-bits widening over every indexed doc)
    ir.Not(_fq("spark")),
    # OR with a negative arm — matches docs hitting NO leaf at all
    ir.Or([_fq("flame"), ir.Not(qc.prefix_query("da", CFG))]),
    # nested mix
    ir.And([
        qc.prefix_query("jo", CFG),
        ir.Or([_fq("date"), ir.Not(qc.wildcard_query("s?ar*", CFG))]),
    ]),
    # double negation
    ir.Not(ir.Not(_fq("window"))),
    # complement of a wildcard (TermPattern under Not)
    ir.Not(qc.wildcard_query("wind*", CFG)),
]


@pytest.mark.parametrize("node", CASES)
def test_docs_with_not_match_reference(eng, node):
    assert _got(eng, node) == _expected(node)


def test_not_scoredterms_falls_back_to_antijoin(eng):
    # a ScoredTerms leaf keeps the tree off the bitmask path, exercising
    # the pos/neg anti-join branch of _docs_inner
    st = qc.field_query("spark", CFG, scored=True)
    node = ir.And([_fq("join"), ir.Not(st)])
    expect = sorted(
        i for i, ts in DOC_TERMS.items()
        if _eval(_fq("join"), ts) and not _eval(st, ts)
    )
    assert _got(eng, node) == expect


def test_pure_not_scoredterms_complement(eng):
    st = qc.field_query("spark", CFG, scored=True)
    node = ir.Not(st)
    expect = sorted(i for i, ts in DOC_TERMS.items() if not _eval(st, ts))
    assert _got(eng, node) == expect


def test_not_respects_tombstones(spark):
    # own engine — delete_docs is engine-level state the shared fixture's
    # later tests must not observe
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    own = SearchEngine.from_corpus(df, CFG, num_partitions=4)
    node = ir.Not(_fq("spark"))
    base = _expected(node)
    victim = base[0]
    own.delete_docs([victim])
    assert _got(own, node) == [d for d in base if d != victim]


# ------------------------------------------------------------ scored paths
def test_search_must_not_excludes_without_rescoring(eng):
    ex = qc.prefix_query("wind", CFG)
    full = {
        r["doc_id"]: r["score"]
        for r in eng.search("spark", k=N_DOCS).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in eng.search("spark", k=N_DOCS, must_not=ex).collect()
    }
    excluded = set(_expected(ex))
    assert set(got) == set(full) - excluded
    for d, s in got.items():
        assert s == full[d]  # survivors keep bit-identical scores


def test_search_any_min_should_match(eng):
    value = "spark join data"
    node = qc.field_query(value, CFG, scored=True)
    terms = sorted(set(node.terms))
    full = {
        r["doc_id"]: r["score"]
        for r in eng.search_any(value, k=N_DOCS).collect()
    }
    for msm in (2, 3):
        got = {
            r["doc_id"]: r["score"]
            for r in eng.search_any(
                value, k=N_DOCS, min_should_match=msm
            ).collect()
        }
        expect = {
            d for d in full
            if sum(t in DOC_TERMS[d] for t in terms) >= msm
        }
        assert set(got) == expect
        for d, s in got.items():
            assert s == full[d]


def test_min_should_match_unsatisfiable_is_empty(eng):
    assert eng.search_any("spark", k=5, min_should_match=99).count() == 0


def test_min_should_match_conjunctive_raises(eng):
    with pytest.raises(ValueError):
        eng.bm25_scores(["Aspar", "Bk"], conjunctive=True,
                        min_should_match=2)


def test_search_filter_restricts_without_rescoring(eng):
    fl = qc.prefix_query("wind", CFG)
    full = {
        r["doc_id"]: r["score"]
        for r in eng.search("spark", k=N_DOCS).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in eng.search("spark", k=N_DOCS, filter=fl).collect()
    }
    assert set(got) == set(full) & set(_expected(fl))
    for d, s in got.items():
        assert s == full[d]
    # filter edge cases: MatchNone empties, MatchAll is identity
    assert eng.search("spark", k=5, filter=ir.MatchNone()).count() == 0
    ident = {
        r["doc_id"]: r["score"]
        for r in eng.search(
            "spark", k=N_DOCS, filter=ir.MatchAll()
        ).collect()
    }
    assert ident == full


def test_index_stats_counts_and_tombstones(spark):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    own = SearchEngine.from_corpus(df, CFG, num_partitions=4)
    row = own.index_stats().collect()[0]
    # total term OCCURRENCES, not distinct: re-analyze each doc
    total = sum(len(analyze(_doc_text(i), CFG)) for i in range(N_DOCS))
    assert row["docs_count"] == N_DOCS
    assert row["docs_deleted"] == 0
    assert row["total_terms"] == total
    assert abs(row["avgdl"] - total / N_DOCS) < 1e-9
    own.delete_docs([0, 1])
    row2 = own.index_stats().collect()[0]
    # ES semantics: live count shrinks, tombstones counted, scoring
    # stats stay stale until purge
    assert row2["docs_count"] == N_DOCS - 2
    assert row2["docs_deleted"] == 2
    assert row2["total_terms"] == total


def test_search_any_must_not(eng):
    ex = _fq("date")
    full = {
        r["doc_id"]: r["score"]
        for r in eng.search_any("spark flame", k=N_DOCS).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in eng.search_any(
            "spark flame", k=N_DOCS, must_not=ex
        ).collect()
    }
    assert set(got) == set(full) - set(_expected(ex))
    for d, s in got.items():
        assert s == full[d]
