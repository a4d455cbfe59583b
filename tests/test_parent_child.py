"""ES 0.19 parent/child family (has_child / has_parent /
top_children) plus the two remaining 0.19 scoring surfaces
(script filter, custom_filters_score).

Scores are checked against an INDEPENDENT pure-Python BM25 evaluator
over analyzed term bags (tf/dl/df recomputed from scratch), not
against the engine's own bm25_scores — the distributed
join/groupBy/left-join combines are verified, not mirrored.
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
N_PARENTS = 7  # deliberately not a divisor of N_DOCS: uneven fan-out
DOC_TOKENS = {i: analyze(_doc_text(i), CFG) for i in range(N_DOCS)}
PARENT = {i: f"p{i % N_PARENTS}" for i in range(N_DOCS)}
N_CHARS = {i: len(_doc_text(i)) for i in range(N_DOCS)}


def _bm25_scores_py(value: str) -> dict[int, float]:
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


def _match_docs(node: ir.Node) -> set[int]:
    """Independent doc-set eval: which docs contain every / any chunk
    term per the IR tree (leaves only — tests use leaf filters)."""
    def ev(n):
        if isinstance(n, ir.TermEq):
            return {
                i for i, toks in DOC_TOKENS.items() if n.term in toks
            }
        if isinstance(n, ir.ScoredTerms):
            return {
                i for i, toks in DOC_TOKENS.items()
                if all(t in toks for t in n.terms)
            }
        if isinstance(n, ir.And):
            out = set(range(N_DOCS))
            for c in n.children:
                out &= ev(c)
            return out
        if isinstance(n, ir.Or):
            out = set()
            for c in n.children:
                out |= ev(c)
            return out
        raise AssertionError(f"unhandled {n}")
    return ev(node)


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    return SearchEngine.from_corpus(df, CFG, num_partitions=4)


@pytest.fixture(scope="module")
def source(spark):
    return spark.createDataFrame(
        [
            (i, PARENT[i], N_CHARS[i], _doc_text(i))
            for i in range(N_DOCS)
        ],
        "doc_id long, source string, n_chars long, text string",
    )


# ---------------------------------------------------------------------------
# has_child / has_parent
# ---------------------------------------------------------------------------


def test_has_child_is_distinct_parents_of_matching_children(eng, source):
    # "windows" (not "flame", which every parent has a child for):
    # 8/40 children covering 6/7 parents — the selectivity guard below
    # genuinely exercises the distinct/semi-join against a strict subset
    node = qc.field_query("windows", CFG, scored=False)
    got = sorted(
        r["parent"] for r in eng.has_child(node, source).collect()
    )
    want = sorted({PARENT[i] for i in _match_docs(ir.simplify(node))})
    assert got == want
    # selective: neither empty nor every parent
    assert 0 < len(want) < N_PARENTS


def test_has_child_match_none_is_empty(eng, source):
    got = eng.has_child(ir.MatchNone(), source)
    assert got.count() == 0
    assert got.columns == ["parent"]


def test_has_child_respects_tombstones(spark, source):
    """Deleting every matching child of a parent removes the parent —
    the inner query runs the tombstone-aware doc-set path."""
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    e2 = SearchEngine.from_corpus(df, CFG, num_partitions=4)
    node = qc.field_query("flame", CFG, scored=False)
    matches = _match_docs(ir.simplify(node))
    victim_parent = PARENT[min(matches)]
    victims = [i for i in matches if PARENT[i] == victim_parent]
    before = {r["parent"] for r in e2.has_child(node, source).collect()}
    assert victim_parent in before
    e2.delete_docs(victims)
    after = {r["parent"] for r in e2.has_child(node, source).collect()}
    assert after == {PARENT[i] for i in matches if i not in victims}
    assert victim_parent not in after


def test_has_parent_children_of_matching_parents(eng, source):
    got = [
        r["doc_id"]
        for r in eng.has_parent(
            "parent IN ('p1', 'p3')", source
        ).collect()
    ]
    want = sorted(i for i in range(N_DOCS) if PARENT[i] in ("p1", "p3"))
    assert got == want


def test_has_parent_masks_tombstoned_children(spark, source):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    e2 = SearchEngine.from_corpus(df, CFG, num_partitions=4)
    kids = [
        r["doc_id"]
        for r in e2.has_parent("parent = 'p2'", source).collect()
    ]
    e2.delete_docs(kids[:2])
    after = [
        r["doc_id"]
        for r in e2.has_parent("parent = 'p2'", source).collect()
    ]
    assert after == kids[2:]


# ---------------------------------------------------------------------------
# top_children
# ---------------------------------------------------------------------------


def _top_children_py(value: str, mode: str, k: int = 10):
    scores = _bm25_scores_py(value)
    per_parent = {}
    for d, s in scores.items():
        per_parent.setdefault(PARENT[d], []).append(s)
    agg = {
        "max": max,
        "sum": sum,
        "avg": lambda xs: sum(xs) / len(xs),
    }[mode]
    combined = {p: agg(xs) for p, xs in per_parent.items()}
    return sorted(combined.items(), key=lambda x: (-x[1], x[0]))[:k]


@pytest.mark.parametrize("mode", ["max", "sum", "avg"])
def test_top_children_matches_independent_eval(eng, source, mode):
    got = eng.top_children(
        "spark", source, score_mode=mode, k=10
    ).collect()
    want = _top_children_py("spark", mode)
    assert [r["parent"] for r in got] == [p for p, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_top_children_modes_genuinely_differ(eng, source):
    """With uneven fan-out, sum and max must produce different scores
    (otherwise the gate would not distinguish the modes)."""
    mx = {
        r["parent"]: r["score"]
        for r in eng.top_children(
            "spark", source, score_mode="max", k=10
        ).collect()
    }
    sm = {
        r["parent"]: r["score"]
        for r in eng.top_children(
            "spark", source, score_mode="sum", k=10
        ).collect()
    }
    assert any(
        sm[p] != pytest.approx(mx[p]) for p in set(mx) & set(sm)
    )


def test_top_children_rejects_unknown_mode(eng, source):
    with pytest.raises(ValueError, match="score_mode"):
        eng.top_children("spark", source, score_mode="median")


def test_top_children_empty_value(eng, source):
    out = eng.top_children("", source)
    assert out.count() == 0
    assert out.columns == ["parent", "score"]


# ---------------------------------------------------------------------------
# script filter
# ---------------------------------------------------------------------------


def test_script_filter_cuts_membership_keeps_scores(eng, source):
    got = eng.script_filter(
        "spark", "n_chars % 2 = 0", source, k=40
    ).collect()
    base = _bm25_scores_py("spark")
    want = sorted(
        (
            (d, s)
            for d, s in base.items()
            if N_CHARS[d] % 2 == 0
        ),
        key=lambda x: (-x[1], x[0]),
    )[:40]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_script_filter_true_predicate_equals_search(eng, source):
    got = eng.script_filter("spark", "1 = 1", source, k=10).collect()
    plain = eng.search("spark", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in plain
    ]


# ---------------------------------------------------------------------------
# custom_filters_score
# ---------------------------------------------------------------------------


def _cfs_py(value, filt_sets, mode, k=10):
    scores = _bm25_scores_py(value)
    out = {}
    for d, s in scores.items():
        boosts = [
            (pos, b) for pos, (ds, b) in enumerate(filt_sets) if d in ds
        ]
        if not boosts:
            f = 1.0
        elif mode == "first":
            f = min(boosts)[1]
        elif mode == "min":
            f = min(b for _, b in boosts)
        elif mode == "max":
            f = max(b for _, b in boosts)
        elif mode == "total":
            f = sum(b for _, b in boosts)
        elif mode == "avg":
            f = sum(b for _, b in boosts) / len(boosts)
        elif mode == "multiply":
            f = math.prod(b for _, b in boosts)
        out[d] = s * f
    return sorted(out.items(), key=lambda x: (-x[1], x[0]))[:k]


def _cfs_filters():
    return [
        (qc.prefix_query("windo", CFG), 1.5),
        (qc.field_query("flame", CFG, scored=False), 2.0),
    ]


def _cfs_filter_sets():
    prefix_docs = {
        i
        for i, toks in DOC_TOKENS.items()
        if any(
            w.startswith("windo")
            for w in _doc_text(i).split()
        )
    }
    flame_docs = _match_docs(
        ir.simplify(qc.field_query("flame", CFG, scored=False))
    )
    return [(prefix_docs, 1.5), (flame_docs, 2.0)]


@pytest.mark.parametrize(
    "mode", ["first", "min", "max", "total", "avg", "multiply"]
)
def test_custom_filters_score_matches_independent_eval(
    eng, source, mode
):
    got = eng.custom_filters_score(
        "spark", _cfs_filters(), score_mode=mode, k=40
    ).collect()
    want = _cfs_py("spark", _cfs_filter_sets(), mode, k=40)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_custom_filters_score_first_differs_from_max(eng, source):
    """The gate's first-filter-smaller-boost layout: a doc matching
    both filters takes 1.5 under first, 2.0 under max."""
    sets = _cfs_filter_sets()
    both = sets[0][0] & sets[1][0] & set(_bm25_scores_py("spark"))
    assert both, "fixture must contain a doc matching both filters"
    first = {
        r["doc_id"]: r["score"]
        for r in eng.custom_filters_score(
            "spark", _cfs_filters(), score_mode="first", k=40
        ).collect()
    }
    mx = {
        r["doc_id"]: r["score"]
        for r in eng.custom_filters_score(
            "spark", _cfs_filters(), score_mode="max", k=40
        ).collect()
    }
    d = min(both)
    assert first[d] == pytest.approx(mx[d] * 1.5 / 2.0, rel=1e-9)


def test_custom_filters_score_no_filters_equals_search(eng, source):
    got = eng.custom_filters_score("spark", [], k=10).collect()
    plain = eng.search("spark", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in plain
    ]


def test_custom_filters_score_rejects_unknown_mode(eng):
    with pytest.raises(ValueError, match="score_mode"):
        eng.custom_filters_score("spark", [], score_mode="median")
