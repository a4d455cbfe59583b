"""Tier-1 golden token-stream tests.

Vectors copied from the reference test suite (FIXTURES.md §3):
HashSplitterTokenizerTests.java / HashSplitterTokenFilterTests.java and
README.md:26-39.
"""

import numpy as np
import pandas as pd
import pytest

from elasticsearch_analysis_hashsplitter_spark.config import (
    DEFAULT_PREFIXES,
    HashSplitterConfig,
)
from elasticsearch_analysis_hashsplitter_spark.functions.tokenize import (
    analyze,
    analyze_series,
    chunk_series,
    chunk_tokens,
    chunk_value,
    term_freqs,
)

README_HASH = "d41d8cd98f00b204e9800998ecf8427e"


GOLDEN = [
    # (input, chunk_length, prefixes, expected) — HashSplitterTokenizerTests
    ("0123456789", 1, DEFAULT_PREFIXES,
     ["A0", "B1", "C2", "D3", "E4", "F5", "G6", "H7", "I8", "J9"]),
    ("0123456789", 2, DEFAULT_PREFIXES, ["A01", "B23", "C45", "D67", "E89"]),
    ("0123456789", 1, "⁰¹²³⁴⁵⁶⁷⁸⁹",
     ["⁰0", "¹1", "²2", "³3", "⁴4", "⁵5", "⁶6", "⁷7", "⁸8", "⁹9"]),
    # short last chunk keeps its real length (:130-148)
    ("001", 2, "ab", ["a00", "b1"]),
    # README.md:26-39 example
    (README_HASH, 4, "ABCDEFGH",
     ["Ad41d", "B8cd9", "C8f00", "Db204", "Ee980", "F0998", "Gecf8", "H427e"]),
]


@pytest.mark.parametrize("value,length,prefixes,expected", GOLDEN)
def test_chunk_value_golden(value, length, prefixes, expected):
    cfg = HashSplitterConfig(chunk_length=length, prefixes=prefixes)
    assert chunk_value(value, cfg) == expected


@pytest.mark.parametrize("value,length,prefixes,expected", GOLDEN)
def test_chunk_series_matches_pure(value, length, prefixes, expected):
    cfg = HashSplitterConfig(chunk_length=length, prefixes=prefixes)
    arr = chunk_series(pd.Series([value, None, "", value]), cfg)
    assert arr.to_pylist() == [expected, [], [], expected]


def test_reset_equivalent_independent_values():
    # reset vector (:152-187): same tokenizer re-used must restart prefixes
    cfg = HashSplitterConfig(chunk_length=2, prefixes="abcd")
    assert chunk_value("0011", cfg) == ["a00", "b11"]
    assert chunk_value("2233", cfg) == ["a22", "b33"]


def test_prefix_wraps_modulo_alphabet():
    # HashSplitterTokenizer.java:126-127 — wrap documented in README:119-121
    cfg = HashSplitterConfig(chunk_length=1, prefixes="ab")
    assert chunk_value("0123", cfg) == ["a0", "b1", "a2", "b3"]


def test_input_cap_and_trim():
    # 1024-char read + Java trim (HashSplitterTokenizer.java:109-112)
    cfg = HashSplitterConfig(chunk_length=4, prefixes="ABCDEFGH")
    long = "x" * 2000
    assert len(chunk_value(long, cfg)) == 1024 // 4
    assert chunk_value("  01  ", cfg) == ["A01"]
    nocap = HashSplitterConfig(
        chunk_length=4, prefixes="AB", apply_input_cap=False
    )
    assert len(chunk_value(long, nocap)) == 500


def test_token_filter_resets_prefix_per_token():
    # HashSplitterTokenFilter.java:82-83 (+ filter golden vectors :138-144)
    cfg = HashSplitterConfig(chunk_length=2, prefixes="ab")
    assert chunk_tokens(["0011", "2233"], cfg) == ["a00", "b11", "a22", "b33"]
    assert chunk_tokens(["001"], cfg) == ["a00", "b1"]


def test_analyze_token_mode():
    cfg = HashSplitterConfig(
        chunk_length=4, token_mode="tokens", apply_input_cap=False
    )
    assert analyze("spark join", cfg) == ["Aspar", "Bk", "Ajoin"]
    assert term_freqs("spark spark join", cfg) == {
        "Aspar": 2, "Bk": 2, "Ajoin": 1,
    }


def test_analyze_series_token_mode_matches_pure():
    cfg = HashSplitterConfig(
        chunk_length=4, token_mode="tokens", apply_input_cap=False
    )
    texts = ["spark join window", "", "the quick brown fox jumps", None,
             "spark spark spark"]
    arr = analyze_series(pd.Series(texts), cfg)
    expected = [analyze(t or "", cfg) for t in texts]
    assert arr.to_pylist() == expected


def test_offsets_golden():
    # HashSplitterTokenizerTests offset assertions: chunk spans
    from elasticsearch_analysis_hashsplitter_spark.functions.tokenize import (
        chunk_value_with_offsets,
    )

    cfg = HashSplitterConfig(chunk_length=2, prefixes=DEFAULT_PREFIXES)
    assert chunk_value_with_offsets("0123456789", cfg) == [
        ("A01", 0, 2), ("B23", 2, 4), ("C45", 4, 6), ("D67", 6, 8),
        ("E89", 8, 10),
    ]
    # short last chunk keeps its real span (:130-148)
    cfg2 = HashSplitterConfig(chunk_length=2, prefixes="ab")
    assert chunk_value_with_offsets("001", cfg2) == [
        ("a00", 0, 2), ("b1", 2, 3),
    ]


def test_vectorized_random_equivalence():
    rng = np.random.RandomState(42)
    cfg = HashSplitterConfig(chunk_length=3, prefixes="xyz")
    vocab = "abcdef0123"
    vals = [
        "".join(rng.choice(list(vocab), size=rng.randint(0, 20)))
        for _ in range(200)
    ]
    arr = chunk_series(pd.Series(vals), cfg)
    assert arr.to_pylist() == [chunk_value(v, cfg) for v in vals]
