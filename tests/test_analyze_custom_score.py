"""ES `_analyze` attribute-stream parity (A1 tokenizer / A2 filter
offsets+positions) and the ES 0.19 custom_score query.

Tokenizer attributes are golden-tested against the reference's own
semantics (HashSplitterTokenizer.java:119-123 sets term + offsets per
chunk; HashSplitterTokenFilter.java:99 offsets chunks at tokStart +
curPos and leaves position increments at 1). custom_score scores are
checked against an independent pure-Python BM25 + script evaluator.
"""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_hashsplitter_spark.config import (
    REFERENCE_INPUT_CAP,
    HashSplitterConfig,
)
from elasticsearch_analysis_hashsplitter_spark.functions.tokenize import (
    analyze,
    chunk_stream_frame,
    chunk_tokens_with_offsets,
    chunk_value_with_offsets,
)
from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
)
from elasticsearch_analysis_hashsplitter_spark.operators.text import (
    analyze_stream,
)
from elasticsearch_analysis_hashsplitter_spark.plans import compile as qc

CFG = HashSplitterConfig(chunk_length=4, size=32, apply_input_cap=False)
CAP_CFG = HashSplitterConfig(chunk_length=4)  # reference 1024-cap + trim
TOK_CFG = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)


# ---------------------------------------------------------------------------
# A2 filter attribute stream (pure)
# ---------------------------------------------------------------------------


def test_filter_offsets_anchor_at_token_start():
    """HashSplitterTokenFilter.java:99: offsets are tokStart + curPos,
    NOT within-token — a second token's chunks inherit its upstream
    start offset."""
    out = chunk_tokens_with_offsets([("abcdefgh", 0), ("xyz", 9)], CFG)
    assert out == [
        ("Aabcd", 0, 0, 4),
        ("Befgh", 1, 4, 8),
        ("Axyz", 2, 9, 12),  # prefix counter reset, offset from tokStart
    ]


def test_filter_positions_run_across_the_stream():
    out = chunk_tokens_with_offsets([("aaaaa", 0), ("bb", 6)], CFG)
    assert [p for _, p, _, _ in out] == [0, 1, 2]
    # short last chunk of token 1: gram size 1, offsets (4, 5)
    assert out[1] == ("Ba", 1, 4, 5)


def test_filter_terms_match_unattributed_a2():
    toks = ["abcdefghij", "k", "lmnopqr"]
    starts = [0, 11, 13]
    attributed = chunk_tokens_with_offsets(list(zip(toks, starts)), CFG)
    assert [t for t, _, _, _ in attributed] == analyze(
        " ".join(toks), TOK_CFG
    )


# ---------------------------------------------------------------------------
# A1 vectorized attribute stream == pure reference
# ---------------------------------------------------------------------------

TRICKY = [
    "0123456789abcdef",       # exact multiple of L
    "short",                  # short last chunk
    "abcd",                   # single full chunk
    "a",                      # single short chunk
    "",                       # empty -> no tokens
    None,                     # null -> no tokens
    "x" * 1030,               # beyond the reference 1024 cap
    "y" * 1020 + "    zz",    # cap cuts inside trailing whitespace
]


@pytest.mark.parametrize("cfg", [CFG, CAP_CFG], ids=["nocap", "cap"])
def test_chunk_stream_frame_matches_pure_reference(cfg):
    frame = chunk_stream_frame(pd.Series(TRICKY, dtype="object"), cfg)
    for r, v in enumerate(TRICKY):
        want = chunk_value_with_offsets(v, cfg)
        got = frame[frame["row"] == r]
        assert (
            list(zip(got["term"], got["start_offset"], got["end_offset"]))
            == want
        )
        assert list(got["pos"]) == list(range(len(want)))


def test_cap_applies_before_chunking():
    v = "z" * (REFERENCE_INPUT_CAP + 40)
    frame = chunk_stream_frame(pd.Series([v]), CAP_CFG)
    L = CAP_CFG.chunk_length
    assert len(frame) == REFERENCE_INPUT_CAP // L
    assert frame["end_offset"].max() == REFERENCE_INPUT_CAP


# ---------------------------------------------------------------------------
# distributed analyze_stream
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def stream_df(spark):
    rows = [(i, t) for i, t in enumerate(TRICKY)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_analyze_stream_matches_pure(stream_df):
    got = {
        (r["doc_id"], r["pos"]): (
            r["term"], r["start_offset"], r["end_offset"]
        )
        for r in analyze_stream(stream_df, CFG).collect()
    }
    want = {}
    for i, v in enumerate(TRICKY):
        for p, (t, s, e) in enumerate(chunk_value_with_offsets(v, CFG)):
            want[(i, p)] = (t, s, e)
    assert got == want


def test_analyze_stream_is_single_stage(stream_df):
    """The _analyze op is a narrow map over the scan — no Exchange."""
    plan = (
        analyze_stream(stream_df, CFG)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# custom_score
# ---------------------------------------------------------------------------

WORDS = [
    "spark", "sparse", "window", "windows", "flame", "flamingo",
    "join", "joint", "data", "date",
]
N_DOCS = 40


def _doc_text(i: int) -> str:
    return " ".join(
        WORDS[(i * s + j) % len(WORDS)] for j, s in enumerate((1, 3, 7, 11))
    )


DOC_TOKENS = {i: analyze(_doc_text(i), TOK_CFG) for i in range(N_DOCS)}


def _bm25_scores(value: str) -> dict[int, float]:
    terms = sorted(set(qc.field_query(value, TOK_CFG).terms))
    dls = {i: len(t) for i, t in DOC_TOKENS.items()}
    avgdl = sum(dls.values()) / N_DOCS
    df = {
        t: sum(1 for toks in DOC_TOKENS.values() if t in toks)
        for t in terms
    }
    k1, b = TOK_CFG.bm25_k1, TOK_CFG.bm25_b
    out = {}
    for i, toks in DOC_TOKENS.items():
        if not all(t in toks for t in terms):
            continue
        out[i] = sum(
            math.log(1 + (N_DOCS - df[t] + 0.5) / (df[t] + 0.5))
            * sum(1 for x in toks if x == t) * (k1 + 1)
            / (
                sum(1 for x in toks if x == t)
                + k1 * (1 - b + b * dls[i] / avgdl)
            )
            for t in terms
        )
    return out


@pytest.fixture(scope="module")
def cs_eng(spark):
    df = spark.createDataFrame(
        [(i, _doc_text(i)) for i in range(N_DOCS)],
        "doc_id long, content string",
    )
    return SearchEngine.from_corpus(df, TOK_CFG, num_partitions=4)


@pytest.fixture(scope="module")
def cs_source(spark):
    return spark.createDataFrame(
        [(i, len(_doc_text(i)), i % 7) for i in range(N_DOCS)],
        "doc_id long, n_chars long, rank_boost long",
    )


def test_custom_score_identity_script_equals_search(cs_eng, cs_source):
    got = cs_eng.custom_score("spark", "_score", cs_source, k=10).collect()
    want = cs_eng.search("spark", k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9)


def test_custom_score_field_script_reranks(cs_eng, cs_source):
    """The script REPLACES the score (ES custom_score semantics) and a
    field-driven script genuinely re-ranks vs plain BM25."""
    script = "_score * (1.0 + rank_boost)"
    got = cs_eng.custom_score("spark", script, cs_source, k=10).collect()
    base = _bm25_scores("spark")
    want = sorted(
        ((d, s * (1.0 + d % 7)) for d, s in base.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    # and it differs from the unscripted ranking
    plain = [d for d, _ in sorted(
        base.items(), key=lambda x: (-x[1], x[0])
    )[:10]]
    assert [r["doc_id"] for r in got] != plain


def test_custom_score_column_script(cs_eng, cs_source):
    got = cs_eng.custom_score(
        "spark", F.col("_score") * 2.0, cs_source, k=5
    ).collect()
    want = cs_eng.search("spark", k=5).collect()
    for g, w in zip(got, want):
        assert g["doc_id"] == w["doc_id"]
        assert g["score"] == pytest.approx(2 * w["score"], rel=1e-9)


def test_custom_score_empty_value_is_empty(cs_eng, cs_source):
    assert cs_eng.custom_score("", "_score", cs_source).count() == 0
