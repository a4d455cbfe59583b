"""more_like_this / sort-by-field / highlight (ES host-API surfaces the
reference's users touch around every plugin query — SURVEY.md §2.5).

Expectations come from independent pure-Python reconstructions (term
selection, sort order, fragment strings), never from the engine's own
helpers.
"""

import math

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

CFG = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)

DOCS = {
    0: "spark streams join windows spark",
    1: "spark joins data frames quickly",
    2: "window functions join sorted frames",
    3: "flamingo data lake spark spark spark",
    4: "sorted windows stream data",
    5: "join join join spark window",
    6: "unrelated tokens entirely here now",
}


@pytest.fixture(scope="module")
def src(spark):
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in DOCS.items()],
        "doc_id long, text string, n_chars long",
    )


@pytest.fixture(scope="module")
def eng(spark, src):
    return SearchEngine.from_corpus(
        src, CFG, id_col="doc_id", text_col="text", num_partitions=2
    )


# ------------------------------------------------------------------- MLT
def _expected_selection(doc_id: int, max_terms: int) -> list[str]:
    """Pure-Python term selection: tf*idf with the engine's BM25 idf,
    df recomputed from scratch over the corpus."""
    n = len(DOCS)
    all_terms = {i: analyze(t, CFG) for i, t in DOCS.items()}
    tf: dict[str, int] = {}
    for t in all_terms[doc_id]:
        tf[t] = tf.get(t, 0) + 1
    df = {
        t: sum(1 for ts in all_terms.values() if t in set(ts))
        for t in tf
    }
    scored = sorted(
        (-(tf[t] * math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))), t)
        for t in tf
    )
    return [t for _, t in scored[:max_terms]]


def test_mlt_matches_manual_selection(eng, src):
    sel = _expected_selection(0, 3)
    want = {
        r["doc_id"]: r["score"]
        for r in eng.bm25_topk(sel, k=20, conjunctive=False).collect()
        if r["doc_id"] != 0
    }
    got = {
        r["doc_id"]: r["score"]
        for r in eng.more_like_this(
            0, src, text_col="text", k=20, max_query_terms=3
        ).collect()
    }
    assert got == want


def test_mlt_excludes_source_doc(eng, src):
    got = [
        r["doc_id"]
        for r in eng.more_like_this(3, src, text_col="text", k=20).collect()
    ]
    assert 3 not in got
    assert got  # similar docs exist


def test_mlt_min_doc_freq_filters_rare_terms(eng, src):
    # every term of doc 6 is unique to it (df == 1); min_doc_freq=2
    # leaves no query terms -> empty result
    assert (
        eng.more_like_this(
            6, src, text_col="text", k=10, min_doc_freq=2
        ).count()
        == 0
    )


def test_mlt_unknown_doc_raises(eng, src):
    with pytest.raises(ValueError):
        eng.more_like_this(999, src, text_col="text")


# ------------------------------------------------------------------ sort
def test_sort_search_orders_by_field(eng, src):
    node = qc.field_query("spark", CFG, scored=False)
    matched = {r["doc_id"] for r in eng.docs(node).collect()}
    expect = sorted(
        ((len(DOCS[d]), d) for d in matched), key=lambda x: (-x[0], x[1])
    )
    got = [
        (r["n_chars"], r["doc_id"])
        for r in eng.sort_search(
            node, src, "n_chars", k=10, ascending=False
        ).collect()
    ]
    assert got == [(c, d) for c, d in expect]
    # ascending flips the order (same tie-break direction on doc_id)
    got_asc = [
        (r["n_chars"], r["doc_id"])
        for r in eng.sort_search(
            node, src, "n_chars", k=10, ascending=True
        ).collect()
    ]
    assert got_asc == sorted(expect, key=lambda x: (x[0], x[1]))


def test_sort_search_k_truncates(eng, src):
    node = qc.field_query("spark", CFG, scored=False)
    assert eng.sort_search(node, src, "n_chars", k=2).count() == 2


# ------------------------------------------------------------- highlight
def _hl(eng, src, hits, value, frag_tokens=5):
    return {
        r["doc_id"]: (r["n_matches"], r["fragment"])
        for r in eng.highlight(
            hits, src, value, text_col="text", frag_tokens=frag_tokens
        ).collect()
    }


def test_highlight_fragments_and_counts(eng, src):
    hits = eng.term("spark")
    got = _hl(eng, src, hits, "spark")
    # doc 0: "spark streams join windows spark" — first match at token 1,
    # window starts at 1 (clamped), 5 tokens, only the first marked
    assert got[0] == (
        2,
        "<em>spark</em> streams join windows spark",
    )
    # doc 3: match at token 4 of 6 -> window tokens 2..6
    assert got[3] == (
        3,
        "data lake <em>spark</em> spark spark",
    )
    # doc 5: match at token 4 of 5 -> window clipped at the end
    assert got[5] == (1, "join join <em>spark</em> window")


def test_highlight_drops_hits_without_literal_token(eng, src, spark):
    # a hit frame may contain docs that matched via the chunk-AND
    # false-positive family; docs without the literal token emit no row
    fake_hits = spark.createDataFrame(
        [(0,), (6,)], "doc_id long"
    )
    got = _hl(eng, src, fake_hits, "spark")
    assert 0 in got and 6 not in got


def test_highlight_multiword_value_raises(eng, src):
    with pytest.raises(ValueError):
        eng.highlight(eng.term("spark"), src, "two words")


# ---------------------------------------------------------------- scroll
def test_scroll_pages_reassemble_total_order(eng):
    one_shot = [
        (r["doc_id"], r["score"])
        for r in eng.search("spark", k=100).collect()
    ]
    for page_size in (1, 2, 100):
        walked = [
            (r["doc_id"], r["score"])
            for page in eng.scroll("spark", page_size=page_size)
            for r in page
        ]
        assert walked == one_shot
        # every non-final page is exactly page_size rows
        sizes = [
            len(page) for page in eng.scroll("spark", page_size=page_size)
        ]
        assert all(s == page_size for s in sizes[:-1])


def test_scroll_max_pages_bounds_iteration(eng):
    pages = list(eng.scroll("spark", page_size=1, max_pages=2))
    assert len(pages) == 2


def test_scroll_disjunctive_and_empty(eng):
    walked = [
        r["doc_id"]
        for page in eng.scroll("spark window", page_size=3,
                               conjunctive=False)
        for r in page
    ]
    # reference = the SAME exhaustive scorer scroll uses for every page
    # (the pruned search_any plan is rank-identical but not bit-identical,
    # which is exactly why scroll never mixes the two)
    node = qc.field_query("spark window", CFG, scored=True)
    one_shot = [
        r["doc_id"]
        for r in eng.bm25_topk(
            list(node.terms), k=100, conjunctive=False
        ).collect()
    ]
    assert walked == one_shot
    assert list(eng.scroll("zzzz", page_size=5)) == []


def test_scroll_bad_page_size_raises(eng):
    with pytest.raises(ValueError):
        next(eng.scroll("spark", page_size=0))
