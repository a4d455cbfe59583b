"""Randomized engine↔oracle parity: seeded random hash corpora and
random term/prefix/range/wildcard queries; Spark doc-sets must equal the
pure-Python oracle's for every query. One engine build per config, many
queries per build (collected as doc-id sets, not counts, for a stricter
check)."""

import numpy as np
import pytest

from elasticsearch_analysis_hashsplitter_spark.config import (
    CHUNKLENGTH2,
    CL4_LOWER_FIXED16,
)
from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
)
from elasticsearch_analysis_hashsplitter_spark.plans import compile as qc

from .oracle import OracleIndex

RNG = np.random.RandomState(20260816)


def _hexes(n, length, rng):
    return [
        "".join(rng.choice(list("0123456789abcdef"), size=length))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def corpus_f16(spark):
    # skewed: clustered prefixes so ranges/prefixes hit interesting splits
    vals = _hexes(40, 16, RNG)
    vals += [v[:8] + w[8:] for v, w in zip(vals[:20], vals[20:40])]
    vals += [vals[0], vals[1]]  # exact dupes
    docs = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, content string"
    )
    eng = SearchEngine.from_corpus(docs, CL4_LOWER_FIXED16, num_partitions=4)
    orc = OracleIndex(dict(enumerate(vals)), CL4_LOWER_FIXED16)
    return vals, eng, orc


def _docset(df):
    return sorted(r.doc_id for r in df.collect())


def test_random_ranges(corpus_f16):
    vals, eng, orc = corpus_f16
    rng = np.random.RandomState(7)
    for i in range(10):
        a, b = rng.choice(vals, 2)
        lo, hi = (a, b) if a <= b else (b, a)
        if rng.rand() < 0.3:
            hi = lo  # singleton / empty corner
        ilo, ihi = bool(rng.rand() < 0.5), bool(rng.rand() < 0.5)
        # truncated bounds exercise the short-chunk branches
        if rng.rand() < 0.4:
            lo = lo[: rng.randint(1, 16)]
        node = qc.range_filter(lo, hi, ilo, ihi, CL4_LOWER_FIXED16)
        assert _docset(eng.docs(node)) == sorted(orc.docs(node)), (
            i, lo, hi, ilo, ihi,
        )


def test_random_wildcards(corpus_f16):
    vals, eng, orc = corpus_f16
    rng = np.random.RandomState(11)
    for i in range(10):
        base = list(rng.choice(vals))
        # random ?-masking and one optional *
        for j in range(16):
            if rng.rand() < 0.4:
                base[j] = "?"
        pat = "".join(base)
        r = rng.rand()
        if r < 0.3:
            cut = rng.randint(1, 15)
            pat = pat[:cut] + "*"
        elif r < 0.6:
            cut = rng.randint(1, 15)
            pat = "*" + pat[cut:]
        node = qc.wildcard_query(pat, CL4_LOWER_FIXED16)
        assert _docset(eng.docs(node)) == sorted(orc.docs(node)), (i, pat)


def test_random_terms_and_prefixes(corpus_f16):
    vals, eng, orc = corpus_f16
    rng = np.random.RandomState(13)
    for i in range(10):
        v = str(rng.choice(vals))
        cut = rng.randint(1, 17)
        value = v[:cut]
        tnode = qc.field_query(value, CL4_LOWER_FIXED16, scored=False)
        assert _docset(eng.docs(tnode)) == sorted(orc.docs(tnode)), (i, value)
        pnode = qc.prefix_query(value, CL4_LOWER_FIXED16)
        assert _docset(eng.docs(pnode)) == sorted(orc.docs(pnode)), (i, value)


def test_random_variable_size_cl2(spark):
    rng = np.random.RandomState(17)
    vals = _hexes(30, 16, rng) + _hexes(10, 13, rng) + _hexes(10, 9, rng)
    docs = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, content string"
    )
    eng = SearchEngine.from_corpus(docs, CHUNKLENGTH2, num_partitions=4)
    orc = OracleIndex(dict(enumerate(vals)), CHUNKLENGTH2)
    for i in range(8):
        v = str(rng.choice(vals))
        value = v[: rng.randint(1, len(v) + 1)]
        for node in (
            qc.field_query(value, CHUNKLENGTH2, scored=False),
            qc.prefix_query(value, CHUNKLENGTH2),
            qc.wildcard_query(value[:6] + "*", CHUNKLENGTH2),
        ):
            assert _docset(eng.docs(node)) == sorted(orc.docs(node)), (
                i, value,
            )
