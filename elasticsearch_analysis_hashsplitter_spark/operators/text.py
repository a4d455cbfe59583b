"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are JVM-side Catalyst expressions (split / filter /
aggregate / md5) — no Python UDFs — so they stay inside whole-stage
codegen and scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import JVM_WS_RUN_REGEX

#: tiny per-language marker-word sets for the n-gram-free language-ID
#: heuristic (deterministic, SQL-replicable)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "fr": ("le", "la", "et", "les", "des", "en", "un", "est", "que", "pour"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + (
    "on", "with", "as", "at", "by", "an", "be", "this", "are", "or",
)


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokens, split on the engine's canonical whitespace set
    (``JVM_WS_RUN_REGEX`` — identical to the Arrow index
    tokenizer and to the DuckDB oracle CTEs; Java's ``\\s`` is ASCII-only
    and even disagrees with DuckDB RE2's ``\\s`` on \\x0B)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, JVM_WS_RUN_REGEX), lambda t: t != "")


def token_count(text: str | Column = "text") -> Column:
    return F.size(tokens_col(text))


def avg_token_len(text: str | Column = "text") -> Column:
    toks = tokens_col(text)
    return F.when(F.size(toks) > 0,
                  F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
                  / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(text: str | Column = "text",
                   stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens_col(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: str | Column = "text") -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    token-length sanity (the classic cheap pre-filter for web corpora)."""
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when((sw > 0.0) & (sw < 0.8), F.lit(1.0)).otherwise(F.lit(0.0))
    alen = avg_token_len(text)
    alen_ok = F.when((alen >= 2.0) & (alen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + sw_ok + alen_ok) / F.lit(3.0)


def language_id(text: str | Column = "text") -> Column:
    """Marker-word-ratio argmax language ID; 'und' when no markers hit.

    Deterministic tie-break: language code ascending.
    """
    toks = tokens_col(text)
    best = F.lit("und")
    best_n = F.lit(0)
    def _marker_hits(code):
        markers = LANG_MARKERS[code]
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    for code in sorted(LANG_MARKERS):
        hits = _marker_hits(code)
        take = hits > best_n
        best = F.when(take, F.lit(code)).otherwise(best)
        best_n = F.when(take, hits).otherwise(best_n)
    return best


#: BPE-ish subword pre-tokenization regex (GPT-2-style contractions +
#: letter/digit runs + punctuation runs), usable for token *counting*
#: without a vocabulary.
#: (RE2-safe subset — no lookahead — so the same pattern runs in DuckDB)
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count(text: str | Column = "text") -> Column:
    """Approximate BPE token count: number of pre-token pieces (each BPE
    merge only splits within a piece, so this lower-bounds real BPE by a
    near-constant factor on natural text)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), 0))


def fingerprint(text: str | Column = "text") -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (bag-of-words identity, robust to token reordering)."""
    toks = F.array_sort(F.array_distinct(tokens_col(text)))
    return F.md5(F.concat_ws(" ", toks))


def text_metrics(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """One-pass metrics projection over a documents table."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.round(avg_token_len(text_col), 4).alias("avg_token_len"),
        F.round(stopword_ratio(text_col), 4).alias("stopword_ratio"),
        F.round(quality_score(text_col), 4).alias("quality"),
        language_id(text_col).alias("lang_id"),
        fingerprint(text_col).alias("fingerprint"),
    )


def filter_documents(
    df: DataFrame,
    min_quality: float = 0.5,
    lang: str | None = None,
    min_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The standard pre-training corpus cut: keep rows passing the cheap
    quality heuristics (and optionally a language / minimum-length gate).
    Pure Catalyst — the predicate fuses into the scan, so at 100 TB this
    is a single filtered pass with full column pruning upstream of
    whatever consumes the survivors."""
    cond = quality_score(text_col) >= min_quality
    if lang is not None:
        cond = cond & (language_id(text_col) == lang)
    if min_tokens is not None:
        cond = cond & (token_count(text_col) >= min_tokens)
    return df.where(cond)


def analyze_stream(
    df: DataFrame,
    cfg,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed ES ``_analyze`` for the plugin's A1 analyzer: one row
    per emitted token with the full attribute set the reference
    tokenizer exposes — ``(doc_id, pos, term, start_offset,
    end_offset)`` (HashSplitterTokenizer.java:119-123; ES's
    ``_analyze`` API renders exactly these attributes per token).

    Narrow map: :func:`~..functions.tokenize.chunk_stream_frame` runs
    inside ``mapInPandas`` (Arrow-batched, zero per-token Python), so
    the op is a single shuffle-free stage whose output partitioning
    follows the input scan — at 100 TB this parallelizes per input
    split with no exchange.
    """
    from ..functions.tokenize import chunk_stream_frame

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).cast("string").alias("_text"),
    )

    def gen(batches):
        for pdf in batches:
            out = chunk_stream_frame(pdf["_text"], cfg)
            out.insert(
                0, "doc_id", pdf["doc_id"].to_numpy()[out.pop("row")]
            )
            yield out

    return src.mapInPandas(
        gen,
        schema=(
            "doc_id long, pos int, term string, "
            "start_offset int, end_offset int"
        ),
    )
