"""ES ids query (IdsQueryParser / IdsFilterParser) and the 0.19
custom_boost_factor query.

DocIds is the one IR leaf whose predicate reads the doc id rather than
the term dictionary, so it is excluded from the single-scan bitmask
path and composed via joins — these tests pin that composition (And /
Or / Not / pure DocIds), index-membership semantics (absent ids match
nothing), tombstone masking at the docs() boundary, and the
empty-list -> MatchNone fold. custom_boost_factor is pinned as an
exact scale of search()'s scores with identical ranks.
"""

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

WORDS = ["spark", "window", "flame", "join", "data", "merge"]
N_DOCS = 24


def _doc_text(i: int) -> str:
    return " ".join(
        WORDS[(i * s + j) % len(WORDS)] for j, s in enumerate((1, 5))
    )


DOC_TOKENS = {i: analyze(_doc_text(i), CFG) for i in range(N_DOCS)}


def _docs_with(word: str) -> set[int]:
    terms = set(qc.field_query(word, CFG).terms)
    return {
        i for i, toks in DOC_TOKENS.items()
        if terms <= set(toks)
    }


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    return SearchEngine.from_corpus(df, CFG, num_partitions=4)


def _ids(df) -> set[int]:
    return {r["doc_id"] for r in df.collect()}


def test_ids_query_builder_dedups_and_sorts():
    node = qc.ids_query([5, 3, 5, "7"])
    assert node == ir.DocIds((3, 5, 7))


def test_empty_ids_folds_to_match_none():
    assert isinstance(ir.simplify(qc.ids_query([])), ir.MatchNone)


def test_pure_ids_respects_index_membership(eng):
    # 900 and -1 were never ingested: an ids query only matches
    # documents that exist in the index
    got = _ids(eng.docs(qc.ids_query([0, 7, 900, -1])))
    assert got == {0, 7}


def test_ids_and_term_composition(eng):
    want_word = _docs_with("spark")
    ids = [0, 1, 2, 3, 900]
    node = ir.And([qc.field_query("spark", CFG, scored=False),
                   qc.ids_query(ids)])
    assert _ids(eng.docs(node)) == want_word & {0, 1, 2, 3}


def test_ids_or_composition(eng):
    want_word = _docs_with("flame")
    node = ir.Or([qc.field_query("flame", CFG, scored=False),
                  qc.ids_query([0, 1])])
    assert _ids(eng.docs(node)) == want_word | {0, 1}


def test_not_ids_is_complement(eng):
    node = ir.Not(qc.ids_query([2, 4, 900]))
    assert _ids(eng.docs(node)) == set(range(N_DOCS)) - {2, 4}


def test_ids_filter_on_scored_search_keeps_scores(eng):
    base = {
        r["doc_id"]: r["score"]
        for r in eng.search("spark", k=N_DOCS).collect()
    }
    allowed = sorted(base)[: max(1, len(base) // 2)]
    got = eng.search(
        "spark", k=N_DOCS, filter=qc.ids_query(allowed + [900])
    ).collect()
    assert {r["doc_id"] for r in got} == set(allowed)
    for r in got:  # constant-score filter: survivor scores untouched
        assert r["score"] == base[r["doc_id"]]


def test_ids_query_masks_tombstones(spark):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    e2 = SearchEngine.from_corpus(df, CFG, num_partitions=2)
    assert _ids(e2.docs(qc.ids_query([1, 2, 3]))) == {1, 2, 3}
    e2.delete_docs([2])
    assert _ids(e2.docs(qc.ids_query([1, 2, 3]))) == {1, 3}


def test_custom_boost_factor_scales_scores_rank_identical(eng):
    base = eng.search("spark", k=10).collect()
    boosted = eng.custom_boost_factor("spark", 2.5, k=10).collect()
    assert [r["doc_id"] for r in boosted] == [r["doc_id"] for r in base]
    for b, s in zip(boosted, base):
        assert b["score"] == pytest.approx(s["score"] * 2.5, rel=1e-12)


# ---------------------------------------------------------------------------
# search_type=scan scroll + _validate/query
# ---------------------------------------------------------------------------


def test_scroll_scan_pages_cover_doc_set_in_order(eng):
    node = qc.field_query("spark", CFG, scored=False)
    want = sorted(_docs_with("spark"))
    pages = [
        [r["doc_id"] for r in page]
        for page in eng.scroll_scan(node, page_size=3)
    ]
    assert [i for p in pages for i in p] == want
    assert all(len(p) <= 3 for p in pages)
    # pages strictly increase, never overlap
    flat = [i for p in pages for i in p]
    assert flat == sorted(set(flat))


def test_scroll_scan_match_none_yields_nothing(eng):
    assert list(eng.scroll_scan(ir.MatchNone(), page_size=5)) == []


def test_scroll_scan_raises_on_mid_scan_delete(spark):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    e2 = SearchEngine.from_corpus(df, CFG, num_partitions=2)
    gen = e2.scroll_scan(ir.MatchAll(), page_size=4)
    next(gen)
    e2.delete_docs([0])
    with pytest.raises(RuntimeError, match="mutated"):
        next(gen)


def test_validate_valid_value_renders_chunk_plan(eng):
    out = eng.validate("spark")
    assert out["valid"] is True
    # the compiled rewrite names every positioned chunk term
    terms = sorted(set(qc.field_query("spark", CFG).terms))
    for t in terms:
        assert t in out["explanation"]


def test_validate_ir_node_and_invalid(eng):
    out = eng.validate(qc.bool_filter(
        must=[qc.prefix_query("spa", CFG)],
        must_not=[qc.ids_query([3])],
    ))
    assert out["valid"] is True
    assert "ids:(3)" in out["explanation"]
    assert "NOT" in out["explanation"]

    class Boom:
        def __str__(self):
            raise ValueError("unparseable")

    bad = eng.validate(Boom())
    assert bad["valid"] is False and "ValueError" in bad["error"]


def test_large_ids_list_uses_broadcast_join_and_matches(eng):
    # past _DOC_IDS_INLINE_MAX the leaf switches from a literal In()
    # to a broadcast semi join — answers must be identical, and the
    # plan must carry the join instead of a giant literal list
    big = list(range(0, 5000, 2)) + [10**9]
    df = eng.docs(qc.ids_query(big))
    want = {i for i in range(N_DOCS) if i % 2 == 0}
    assert _ids(df) == want
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


def test_sort_search_multi_clause(spark):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    e2 = SearchEngine.from_corpus(df, CFG, num_partitions=2)
    src = spark.createDataFrame(
        [(i, i % 3, 100 - i) for i in range(N_DOCS)],
        "doc_id long, grp long, val long",
    )
    node = qc.field_query("spark", CFG, scored=False)
    got = [
        (r["grp"], r["val"], r["doc_id"])
        for r in e2.sort_search(
            node, src, [("grp", True), ("val", False)], k=N_DOCS
        ).collect()
    ]
    match = sorted(_docs_with("spark"))
    want = sorted(
        [(i % 3, 100 - i, i) for i in match],
        key=lambda t: (t[0], -t[1], t[2]),
    )
    assert got == want
    # single bare name keeps the old signature behavior
    one = e2.sort_search(node, src, "val", k=3).collect()
    assert [r["val"] for r in one] == sorted(
        100 - i for i in match
    )[:3]
