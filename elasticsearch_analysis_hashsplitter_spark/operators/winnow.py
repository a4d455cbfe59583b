"""Winnowing document fingerprints (rolling k-gram hash + window min).

Implements the MOSS fingerprinting scheme (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
hash every character k-gram of the normalized text with a polynomial
(Rabin-Karp) rolling hash, slide a window of ``w`` consecutive gram
hashes, and keep the minimum of each window. The guarantee: any two
documents sharing a normalized substring of length >= ``w + k - 1``
share at least one selected fingerprint, while the expected density of
selected positions is only ``2 / (w + 1)`` — so the pair join below is
sparse even though detection is substring-exact.

A classic tie-break subtlety becomes a non-issue here: the paper breaks
min ties by position (rightmost) only so that repeated selections of
the *same occurrence* collapse; since the fingerprint SET keeps distinct
hash values per document, every tie-break yields the same set — each
window contributes exactly ``min(h)`` — and the operator, the numpy
kernel, and the DuckDB oracle need no argmin at all.

Scale story (100 TB): fingerprint extraction is a MAP-ONLY stage — the
normalization is a codegen'd Catalyst projection and the hash/window
kernel is one vectorized Arrow UDF pass per document, so there is no
shuffle until the fingerprints themselves (≈ ``2/(w+1)`` of the gram
count, 16-byte rows) hit the pair self-join, which shuffles on the
fingerprint value exactly like the shingle join in
:mod:`~elasticsearch_analysis_hashsplitter_spark.operators.dedup`. Hot
fingerprints (boilerplate) get the same df-cap treatment as hot
shingles: candidate generation only, with an exact recount so reported
overlaps never change.

The hash is the standard polynomial k-gram hash
``sum(byte[i+j] * B^(k-1-j)) mod M`` — the values a Rabin-Karp O(1)
rolling recurrence produces, computed as a vectorized windowed dot
product instead (a batch matrix op beats a data-dependent scalar loop
in a columnar engine, and the mod-arithmetic stays exactly replicable
in the DuckDB oracle's 64-bit integer SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: polynomial rolling-hash parameters. B > 255 makes the k-gram -> hash
#: map injective before the modulus; M is a ~2^50 prime sized by two
#: constraints: (a) every intermediate stays in int64 in BOTH numpy and
#: DuckDB SQL — byte * power < 255 * M < 2^58, summed over k <= 10 grams
#: < 2^61.5; (b) the fingerprint space is big enough that birthday
#: collisions between UNRELATED k-grams stay negligible at corpus scale
#: (expected colliding value pairs ~ F^2 / 2M: with a 2^30 modulus a 1M-doc
#: corpus's ~2e8 fingerprints already produce ~2e7 spurious df>=2 values —
#: i.e. tens of millions of false candidate pairs, and even the 500-doc
#: sf0.01 gate showed 48 collision-artifact pairs; at 1e15 the same 1M-doc
#: corpus expects ~20 across the whole run, ~500 even at 1e9 fingerprints).
WINNOW_BASE = 257
WINNOW_MOD = 1_000_000_000_000_037


def winnow_powers(k: int) -> list[int]:
    """``[B^(k-1), ..., B, 1] mod M`` — the per-position multipliers of
    the polynomial k-gram hash (shared by the kernel and the SQL
    oracle, which inlines them as literals)."""
    return [pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD) for j in range(k)]


def winnow_norm_col(text: str | Column = "text") -> Column:
    """Winnowing's canonical text normalization: strip every character
    outside ``[A-Za-z0-9]``, THEN lowercase. Stripping first leaves pure
    ASCII, on which ``lower()`` is engine-independent — lowercasing
    unicode first could differ between the JVM and the DuckDB oracle
    (e.g. Kelvin sign -> 'k')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.lower(F.regexp_replace(c, "[^A-Za-z0-9]", ""))


def _winnow_kernel(k: int, w: int):
    """Arrow UDF: normalized ascii string -> sorted distinct winnowed
    fingerprints (array<long>). One vectorized pass per document.

    Deliberately per-document, NOT batch-concatenated: a variant that
    concatenated the whole Arrow batch into one buffer (k + w strided
    passes over ~10 MB) measured 2.3x SLOWER per core than this loop —
    a sub-1 KB per-doc hash array stays L1-resident across all k + w
    passes, while the big buffer streams main memory k + w times. At
    ~18k docs/s/core the kernel is nowhere near the bottleneck of the
    pair pipeline (the fingerprint shuffle is)."""
    powers = np.asarray(winnow_powers(k), dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fps(norm: pd.Series) -> pd.Series:
        out = []
        for s in norm:
            b = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(
                np.int64
            )
            n = b.size - k + 1
            if n < 1:
                out.append(np.empty(0, dtype=np.int64))
                continue
            h = np.zeros(n, dtype=np.int64)
            for j in range(k):
                h += b[j : j + n] * powers[j]
            h %= WINNOW_MOD
            if n <= w:  # shorter than one window: the doc IS the window
                sel = h.min(initial=WINNOW_MOD)
                out.append(np.asarray([sel], dtype=np.int64))
                continue
            m = n - w + 1  # window starts
            wm = h[:m].copy()
            for j in range(1, w):
                np.minimum(wm, h[j : j + m], out=wm)
            out.append(np.unique(wm))
        return pd.Series(out)

    return fps


def winnow_fingerprints(
    df: DataFrame,
    k: int = 10,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, fp long): the distinct winnowed fingerprints of each
    document (none for documents whose normalized text is shorter than
    ``k``). Map-only — normalization, hashing, window minima and the
    distinct all happen inside one stage; the length predicate prunes
    sub-k documents before the kernel runs."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1: k={k}, w={w}")
    from .dedup import _parallelize_source

    df = _parallelize_source(df)
    # the unreduced accumulation sum(byte * power) stays in int64 only
    # for k * 255 * (WINNOW_MOD - 1) < 2^63, i.e. k <= 36 at the ~2^50
    # modulus — beyond that numpy would silently wrap (and the SQL
    # oracle would overflow differently), so refuse loudly
    k_max = (2**63 - 1) // (255 * (WINNOW_MOD - 1))
    if k > k_max:
        raise ValueError(
            f"k={k} overflows the int64 hash accumulator "
            f"(max {k_max} at modulus {WINNOW_MOD})"
        )
    norm = df.select(
        F.col(id_col).alias("doc_id"), winnow_norm_col(text_col).alias("s")
    ).where(F.length("s") >= k)
    kern = _winnow_kernel(k, w)
    return norm.select("doc_id", F.explode(kern("s")).alias("fp"))


def winnow_pairs(
    df: DataFrame,
    min_common: int = 2,
    k: int = 10,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_fp_df: int | None = None,
) -> DataFrame:
    """-> (doc_a, doc_b, n_common) for document pairs sharing at least
    ``min_common`` winnowed fingerprints (doc_a < doc_b). Any shared
    normalized substring of length >= ``w + k - 1`` guarantees at least
    one shared fingerprint, so ``min_common`` tunes precision against
    boilerplate, not detection length.

    ``max_fp_df``: hot-fingerprint cap for candidate GENERATION only
    (license headers and templates produce fingerprints shared by
    thousands of docs, whose self-join is quadratic in their df).
    Surviving candidate pairs get an exact recount over ALL
    fingerprints, so reported ``n_common`` and the ``min_common`` cut
    are unchanged — only pairs whose every common fingerprint is hot
    are missed (the same recall trade as ``max_shingle_df`` in
    :func:`~.dedup.ngram_jaccard_pairs`; ``None`` = exact, required
    for the oracle gate)."""
    # materialize the fingerprint table ONCE: both sides of the pair
    # self-join (and the capped tier's df filter + recount) would
    # otherwise re-run the rolling-hash Arrow kernel per reference —
    # the two join exchanges differ in their projections, so Spark's
    # ReuseExchange cannot dedupe them. localCheckpoint, not persist:
    # ContextCleaner frees the blocks when the result is collected
    # (same rationale as minhash_dedup_pairs). Fingerprint rows are
    # ~2/(w+1) of the k-gram count — far smaller than the text.
    fps = winnow_fingerprints(df, k, w, id_col, text_col).localCheckpoint(
        eager=False
    )
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    if max_fp_df is None:
        common = (
            a.join(b, "fp")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_common"))
        )
    else:
        light = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_fp_df)
            .select("fp")
        )
        la = a.join(light, "fp")
        lb = b.join(light, "fp")
        cand = (
            la.join(lb, "fp")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        common = (
            cand.join(a, "doc_a")
            .join(b, ["doc_b", "fp"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_common"))
        )
    return common.where(F.col("n_common") >= min_common).select(
        "doc_a", "doc_b", "n_common"
    )
