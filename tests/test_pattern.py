"""Tier-1 golden search-pattern compilation tests.

Vectors copied from HashSplitterSearchTokenizerTests.java (FIXTURES.md §4);
config chunk_length=4, prefixes="abcd" unless noted.
"""

import re

import pytest

from elasticsearch_analysis_hashsplitter_spark.config import HashSplitterConfig
from elasticsearch_analysis_hashsplitter_spark.plans.pattern import (
    glob_to_regex,
    literal_prefix,
    search_chunks,
)

VAR = HashSplitterConfig(chunk_length=4, prefixes="abcd")
FIX12 = HashSplitterConfig(chunk_length=4, prefixes="abcd", size=12)


GOLDEN = [
    # (pattern, cfg, expected chunk patterns)
    ("00001??12222", FIX12, ["a0000", "b1??1", "c2222"]),          # :112-129
    ("?????11?????", FIX12, ["b?11?"]),                            # :131-137
    ("00001*", VAR, ["a0000", "b1???"]),                           # :141-154
    ("0000111*", VAR, ["a0000", "b111?"]),                         # :156-166
    ("00001*", FIX12, ["a0000", "b1???"]),                         # :170-183
    ("*12222", FIX12, ["b???1", "c2222"]),                         # :199-212
    ("*1112222", FIX12, ["b?111", "c2222"]),                       # :214-223
    ("0*12222", FIX12, ["a0???", "b???1", "c2222"]),               # :227-244
    ("0*2", FIX12, ["a0???", "c???2"]),                            # :246-256
]


@pytest.mark.parametrize("pattern,cfg,expected", GOLDEN)
def test_search_chunks_golden(pattern, cfg, expected):
    assert search_chunks(pattern, cfg) == expected


def test_invalid_star_uses_deleted_fallback():
    # multiple '*', or mid-'*' with variable size -> all '*' deleted
    # (HashSplitterSearchTokenizer.java:158-170, README.md:252-255)
    assert search_chunks("99*99", VAR) == ["a9999"]
    assert search_chunks("000*3", VAR) == ["a0003"]
    assert search_chunks("0*0*0", FIX12) == ["a000?"]


def test_fixed_size_suffix_and_enclosed():
    cl4_fixed16 = HashSplitterConfig(
        chunk_length=4, prefixes="abcdefghijklmnopqrstuvwxyz", size=16
    )
    assert search_chunks("*3333", cl4_fixed16) == ["d3333"]
    assert search_chunks("000*3", cl4_fixed16) == ["a000?", "d???3"]


def test_sql_wildcards():
    cfg = HashSplitterConfig(
        chunk_length=4, prefixes="abcd", size=12, wildcard_one="_",
        wildcard_any="%",
    )
    assert search_chunks("%12222", cfg) == ["b___1", "c2222"]


def test_lone_star_matches_everything():
    assert search_chunks("*", VAR) == []
    assert search_chunks("*", FIX12) == []


def test_glob_to_regex_trailing_one_must_consume():
    # WildcardTermEnum.java:135-138: 'cat' must NOT match 'ca??'
    rx = re.compile(glob_to_regex("ca??", VAR))
    assert not rx.fullmatch("cat")
    assert rx.fullmatch("cats")


@pytest.mark.parametrize(
    "pat,matches,rejects",
    [
        # WildcardTermEnumTests.java:92-211, terms a0000 b1111 c2222 d3333
        ("c2222", ["c2222"], ["b1111"]),
        ("c2*", ["c2222"], ["d3333"]),
        ("*2", ["c2222"], ["a0000"]),
        ("c2???", ["c2222"], ["c222", "c22222"]),
        ("????2", ["c2222"], ["c222"]),
        ("c?2*", ["c2222"], ["c3333"]),
    ],
)
def test_wildcard_term_enum_vectors(pat, matches, rejects):
    rx = re.compile(glob_to_regex(pat, VAR))
    for m in matches:
        assert rx.fullmatch(m), (pat, m)
    for r in rejects:
        assert not rx.fullmatch(r), (pat, r)


def test_literal_prefix():
    assert literal_prefix("c2*", VAR) == "c2"
    assert literal_prefix("c2???", VAR) == "c2"
    assert literal_prefix("*2", VAR) == ""
    assert literal_prefix("c2222", VAR) == "c2222"
