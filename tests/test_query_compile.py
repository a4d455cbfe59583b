"""Tier-3 integration scenarios (reference hit counts), evaluated by the
pure-Python oracle over the compiled IR.

Every (query -> expected count) pair is copied from the reference
integration tests (FIXTURES.md §5):
HashSplitterFieldMapperTests.java / HashSplitterQueryParsersTests.java.
The same scenarios are re-run against the Spark engine in
test_spark_engine.py — this file pins the *compiler + semantics*.
"""

import pytest

from elasticsearch_analysis_hashsplitter_spark.config import (
    BASIC,
    CHUNKLENGTH2,
    CL4_LOWER,
    CL4_LOWER_FIXED16,
    CL4_LOWER_SQL,
)
from elasticsearch_analysis_hashsplitter_spark.plans import compile as qc

from .oracle import OracleIndex

# --- 5.1 hashes_cl2: 9 docs, config chunklength2 -------------------------
HASHES_CL2 = [
    "0011223344556677",
    "00______________",
    "__11____________",
    "____22__________",
    "______33________",
    "________44______",
    "__________55____",
    "____________66__",
    "______________77",
]


@pytest.fixture(scope="module")
def idx_cl2():
    return OracleIndex(dict(enumerate(HASHES_CL2)), CHUNKLENGTH2)


@pytest.mark.parametrize(
    "value,expected",
    [
        ("0011223344556677", 1),   # exact (:212-214)
        ("00112233445566", 1),     # prefix-of, documented side effect (:216-218)
        ("0011223344556", 0),      # incomplete last chunk (:220-222)
        ("0011223344556688", 0),   # sibling (:224-226)
    ],
)
def test_field_query_counts(idx_cl2, value, expected):
    assert idx_cl2.count(qc.field_query(value, CHUNKLENGTH2)) == expected
    assert idx_cl2.count(qc.field_query(value, CHUNKLENGTH2, scored=False)) == expected


@pytest.mark.parametrize(
    "value,expected",
    [
        ("00112233445566", 1),     # :134-136
        ("0011223344556", 1),      # incomplete last chunk ok for prefix (:138-140)
        ("00112233445567", 0),     # :142-144
    ],
)
def test_prefix_query_counts(idx_cl2, value, expected):
    assert idx_cl2.count(qc.prefix_query(value, CHUNKLENGTH2)) == expected


def test_basic_single_doc_field_query():
    # HashSplitterFieldMapperTests.java:97-120, config basic (chunk 1)
    idx = OracleIndex({0: "01234567"}, BASIC)
    assert idx.count(qc.field_query("01234567", BASIC)) == 1
    assert idx.count(qc.field_query("0123456", BASIC)) == 1  # prefix-of
    assert idx.count(qc.field_query("01234568", BASIC)) == 0


# --- 5.2 hashes_cl4_fixed16: 17 docs, range scenarios --------------------
HASHES_FIXED16 = [
    "0000000000000000", "0000111099999999", "0000111100000000",
    "0000111100000001", "0000111100010000", "0000111122223333",
    "0000111199999999", "0000199900000000", "0000199999999999",
    "0000222200000000", "0000222200000001", "1111000000000000",
    "1111000000000001", "2222000000000000", "2222000000000001",
    "3333000000000000", "3333000000000001",
]


@pytest.fixture(scope="module")
def idx_f16():
    return OracleIndex(dict(enumerate(HASHES_FIXED16)), CL4_LOWER_FIXED16)


@pytest.mark.parametrize(
    "lo,hi,ilo,ihi,expected",
    [
        ("1111000000000000", "2222000000000000", True, True, 3),    # :384-386
        ("0000111100000000", "0000111100009999", True, True, 2),    # :388-390
        ("0000111100000000", "0000222200000000", True, True, 8),    # :392-394
        ("0000111100000000", "0000222200000000", False, True, 7),   # :396-398
        ("0000111100000000", "0000222200000000", True, False, 7),   # :400-402
        ("0000111100000000", "0000222200000000", False, False, 6),  # :404-406
        ("0000111122223333", "0000111122223333", True, True, 1),    # singleton
        ("0000111122223333", "0000111122223333", True, False, 0),
        (None, None, True, True, 17),                               # :416-418
        ("000011110000", "000022220000", True, True, 9),            # :420-422
        ("00001111000000", "00002222000000", True, True, 7),        # :424-426
    ],
)
def test_range_query_counts(idx_f16, lo, hi, ilo, ihi, expected):
    node = qc.range_filter(lo, hi, ilo, ihi, CL4_LOWER_FIXED16)
    assert idx_f16.count(node) == expected


def test_half_open_ranges_engine_extension(idx_f16):
    # Reference NPEs here (divergence #2); engine semantics: one-sided.
    n_low = idx_f16.count(
        qc.range_filter("2222000000000000", None, True, False, CL4_LOWER_FIXED16)
    )
    assert n_low == 4  # 2222*, 3333* docs
    n_up = idx_f16.count(
        qc.range_filter(None, "0000111100000001", False, True, CL4_LOWER_FIXED16)
    )
    assert n_up == 4  # 0000000000000000, 0000111099999999, 111100000000/1


# --- 5.3 hash_single: 1 doc, chunk-term + wildcard scenarios --------------
DOC_SINGLE = {0: "0000111122223333"}


@pytest.fixture(scope="module")
def idx_single():
    return OracleIndex(DOC_SINGLE, CL4_LOWER)


@pytest.fixture(scope="module")
def idx_single_f16():
    return OracleIndex(DOC_SINGLE, CL4_LOWER_FIXED16)


@pytest.mark.parametrize(
    "term,expected",
    [("b1111", 1), ("a000", 0), ("z9999", 0)],
)
def test_chunk_term_query(idx_single, term, expected):
    assert idx_single.count(qc.chunk_term_query(term)) == expected


@pytest.mark.parametrize(
    "pattern,expected",
    [
        ("????1111*", 1),  # :154-156
        ("000*", 1),       # :158-159
        ("*3333", 0),      # variable size cannot anchor suffix (:161-162)
        ("000*3", 0),      # :164-165
        ("99*99", 0),      # :167-168
    ],
)
def test_wildcard_variable(idx_single, pattern, expected):
    node = qc.wildcard_query(pattern, CL4_LOWER)
    assert idx_single.count(node) == expected


@pytest.mark.parametrize(
    "pattern,expected",
    [
        ("*3333", 1),   # fixed size anchors the suffix (:258-260)
        ("000*3", 1),   # :262-264
        ("????1111*", 1),
        ("99*99", 0),
    ],
)
def test_wildcard_fixed16(idx_single_f16, pattern, expected):
    node = qc.wildcard_query(pattern, CL4_LOWER_FIXED16)
    assert idx_single_f16.count(node) == expected


def test_wildcard_sql_style():
    # '_'/'%' via mapping config (:171-186)
    idx = OracleIndex(DOC_SINGLE, CL4_LOWER_SQL)
    assert idx.count(qc.wildcard_query("____1111%", CL4_LOWER_SQL)) == 1


# --- 5.4 term-dictionary operator micro-fixtures --------------------------
def test_prefix_length_micro():
    # PrefixLengthQueryTests.java:119-133 — docs a, aa, aaa, aaaa; the test
    # feeds raw terms, so use chunk_length=1... the raw terms there have no
    # position prefix; emulate with an index whose terms are the raw values.
    from elasticsearch_analysis_hashsplitter_spark.plans import ir

    idx = OracleIndex({}, BASIC)
    idx.postings = {t: {i: 1} for i, t in enumerate(["a", "aa", "aaa", "aaaa"])}
    node = ir.TermPrefixLen("a", 2, 3)
    assert {t for t in idx._term_match(node)} == {"aa", "aaa"}


def test_term_range_length_micro():
    # TermRangeLengthQueryTests.java:119-122 — docs a, bb, ccc, dddd
    from elasticsearch_analysis_hashsplitter_spark.plans import ir

    idx = OracleIndex({}, BASIC)
    idx.postings = {t: {i: 1} for i, t in enumerate(["a", "bb", "ccc", "dddd"])}
    node = ir.TermRangeLen(None, None, False, False, 2, 3)
    assert {t for t in idx._term_match(node)} == {"bb", "ccc"}
