"""Winnowing fingerprints: kernel parity vs a loop-based paper
implementation, the w+k-1 detection guarantee, pair semantics, the
hot-fingerprint cap's exact-recount contract, and a map-only plan audit.
"""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from elasticsearch_analysis_hashsplitter_spark.operators.winnow import (
    WINNOW_MOD,
    winnow_fingerprints,
    winnow_pairs,
    winnow_powers,
)


def _norm(text: str) -> str:
    return re.sub(r"[^A-Za-z0-9]", "", text).lower()


def _ref_fps(text: str, k: int, w: int) -> set[int]:
    """The paper's algorithm, literally: per-gram polynomial hash,
    rightmost-minimum selection per window, (pos, hash) records,
    distinct hashes out. Deliberately includes the positional
    tie-break the operator omits — their output SETS must agree."""
    s = _norm(text)
    if len(s) < k:
        return set()
    powers = winnow_powers(k)
    hs = [
        sum(ord(s[i + j]) * powers[j] for j in range(k)) % WINNOW_MOD
        for i in range(len(s) - k + 1)
    ]
    if len(hs) <= w:
        return {min(hs)}
    picked = set()
    for p in range(len(hs) - w + 1):
        win = hs[p : p + w]
        m = min(win)
        # rightmost minimal position (the paper's robust tie-break)
        pos = p + max(i for i, h in enumerate(win) if h == m)
        picked.add((pos, m))
    return {h for _, h in picked}


def _spark_fps(spark, rows, k=10, w=8):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, k=k, w=w).collect()
    by_doc: dict[int, set] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    return by_doc


CRAFTED = [
    "",  # empty
    "ab",  # shorter than k after norm
    "abcdefghij",  # exactly k: one gram, one window
    "abcdefghijk",  # two grams, still < w windows
    "aaaaaaaaaaaaaaaaaaaaaaaa",  # all grams identical: max ties
    "The QUICK brown-fox #42 jumps!! over the lazy dog, twice over.",
    "abab" * 12,  # period-2 text: dense hash collisions across windows
    "x" * 9 + "qwertyuiopasdfghjklzxcvbnm0123456789" * 3,
]


def test_kernel_matches_paper_reference(spark):
    rows = [(i, t) for i, t in enumerate(CRAFTED)]
    got = _spark_fps(spark, rows)
    for i, t in enumerate(CRAFTED):
        ref = _ref_fps(t, 10, 8)
        assert got.get(i, set()) == ref, f"doc {i}: {t!r}"


def test_kernel_matches_reference_small_kw(spark):
    rows = [(i, t) for i, t in enumerate(CRAFTED)]
    got = _spark_fps(spark, rows, k=3, w=2)
    for i, t in enumerate(CRAFTED):
        assert got.get(i, set()) == _ref_fps(t, 3, 2), f"doc {i}"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab ", min_size=0, max_size=80))
def test_reference_set_invariants(t):
    """Pure-Python properties of the reference (no Spark in the hypothesis
    loop): every fingerprint is some window's min; density bounded by
    window count; distinct-set equals the no-tie-break window-min set."""
    k, w = 3, 4
    ref = _ref_fps(t, k, w)
    s = _norm(t)
    if len(s) < k:
        assert ref == set()
        return
    powers = winnow_powers(k)
    hs = [
        sum(ord(s[i + j]) * powers[j] for j in range(k)) % WINNOW_MOD
        for i in range(len(s) - k + 1)
    ]
    if len(hs) <= w:
        assert ref == {min(hs)}
        return
    plain = {min(hs[p : p + w]) for p in range(len(hs) - w + 1)}
    assert ref == plain  # tie-break immaterial to the SET
    assert len(ref) <= len(hs) - w + 1


def test_detection_guarantee(spark):
    """Two docs sharing a normalized substring of length >= w + k - 1
    share at least one fingerprint (the winnowing theorem, k=10 w=8:
    17 chars)."""
    shared = "zqxjkvbwpymf01234"  # 17 normalized chars
    assert len(shared) == 17
    rows = [
        (1, "left padding words then " + shared + " and a distinct tail"),
        (2, "совершенно other префикс " + shared + "!!! unrelated suffix"),
    ]
    got = _spark_fps(spark, rows)
    assert got[1] & got[2], "guaranteed shared fingerprint missing"


def test_pairs_match_bruteforce_sets(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and AGAIN!"),
        (3, "completely different content about winnowing fingerprints"),
        (4, "totally unrelated short text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.n_common
        for r in winnow_pairs(df, min_common=1).collect()
    }
    fps = {i: _ref_fps(t, 10, 8) for i, t in rows}
    ids = sorted(fps)
    want = {}
    for x in ids:
        for y in ids:
            if x < y and fps[x] & fps[y]:
                want[(x, y)] = len(fps[x] & fps[y])
    assert got == want
    # min_common raises precision monotonically
    hi = {
        (r.doc_a, r.doc_b): r.n_common
        for r in winnow_pairs(df, min_common=5).collect()
    }
    assert hi == {p: c for p, c in want.items() if c >= 5}


def test_hot_fp_cap_exact_recount(spark):
    """Capped tier: survivors keep the EXACT n_common; capped results are
    a subset of the exact results; a planted boilerplate fingerprint
    that is every pair's only link disappears under the cap."""
    boiler = "standard license header text common to every file here"
    rows = [(i, boiler + f" unique body {i} " + "zyx" * (i + 2))
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.doc_a, r.doc_b): r.n_common
        for r in winnow_pairs(df, min_common=1).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.n_common
        for r in winnow_pairs(df, min_common=1, max_fp_df=3).collect()
    }
    assert set(capped) <= set(exact)
    for p, c in capped.items():
        assert c == exact[p]  # recount over ALL fps, not surviving ones
    assert len(capped) < len(exact)  # the cap genuinely fired


def test_fingerprints_stage_is_map_only(spark):
    """The extraction half must not shuffle: no Exchange anywhere in the
    optimized fingerprint plan (normalize + kernel + explode fuse into
    one stage over the scan)."""
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body text number "), F.col("id"),
                 F.lit(" with enough characters to fingerprint")).alias("text"),
    )
    plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_short_and_empty_docs_absent(spark):
    rows = [(1, ""), (2, "a-b!c"), (3, "0123456789")]  # norms: "", "abc", k
    got = _spark_fps(spark, rows)
    assert 1 not in got and 2 not in got
    assert got[3] == _ref_fps("0123456789", 10, 8)


def test_bad_params_raise(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)
    # int64 accumulator bound: k * 255 * (MOD-1) must stay < 2^63 —
    # beyond it numpy would wrap silently and the SQL oracle would
    # disagree, so the operator must refuse instead
    with pytest.raises(ValueError, match="overflow"):
        winnow_fingerprints(df, k=37)
    winnow_fingerprints(df, k=36)  # boundary accepted
