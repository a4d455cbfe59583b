"""Index-time analysis: positioned-chunk tokenization.

Reimplements (from behavior, not code) the reference analyzers:

* A1 ``HashSplitterTokenizer`` — whole value chunked into ``chunk_length``
  pieces, each prepended with a position-marker char that wraps modulo the
  prefix alphabet; short last chunk keeps its real length; input capped at
  1024 chars and Java-trimmed
  (/root/reference/src/main/java/org/elasticsearch/index/analysis/
  HashSplitterTokenizer.java:105-129).
* A2 ``HashSplitterTokenFilter`` — same transform applied to each upstream
  token, with the prefix counter reset per token
  (HashSplitterTokenFilter.java:75-106, reset :82-83).

Two layers:

* pure-Python reference functions (``chunk_value`` / ``chunk_tokens``) used
  by the query compiler (driver-side, tiny inputs) and by tests/oracles;
* vectorized pandas/Arrow kernels (``chunk_series`` / ``term_freq_series``)
  used inside pandas UDFs on executors — no per-row Python in the hot path
  beyond Arrow list assembly.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import REFERENCE_INPUT_CAP, HashSplitterConfig, java_trim

# ---------------------------------------------------------------------------
# The engine's canonical whitespace set
# ---------------------------------------------------------------------------

#: Exactly the codepoints Arrow's ``utf8_split_whitespace`` (the index
#: tokenizer, :func:`_analyze_tokens_arrow`) splits on — probed
#: empirically over U+0000..U+FEFF; equals Python ``str.isspace()``:
#: ASCII whitespace INCLUDING the \x1C-\x1F separators (which Unicode
#: White_Space — hence Java ``(?U)\s`` — excludes) plus NEL, NBSP, and
#: the U+1680/U+2000-200A/U+2028/29/202F/205F/3000 spaces. Every other
#: tokenizing surface (JVM dl expression, text-pipeline tokens_col,
#: DuckDB oracle CTEs) must use this set, or dl/text-metrics/dedup
#: results silently diverge from the index tokenizer on non-ASCII
#: whitespace (r2 advisor; the old Java ``\s``/DuckDB RE2 ``\s`` pair
#: additionally disagreed with EACH OTHER on \x0B).
WHITESPACE_CODEPOINTS: tuple[int, ...] = tuple(
    list(range(0x09, 0x0E))          # \t \n \v \f \r
    + list(range(0x1C, 0x21))        # FS GS RS US and space
    + [0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)

#: Whitespace-run regex for RE2 (DuckDB ``regexp_split_to_array``): an
#: explicit class of ``\x{..}`` escapes — RE2's ``\s`` is ASCII-only and
#: RE2's ``(?U)`` means *ungreedy*, so the class must be spelled out.
WS_RUN_REGEX = (
    "[\\x{9}-\\x{D}\\x{1C}-\\x{20}\\x{85}\\x{A0}\\x{1680}"
    "\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]+"
)

#: The SAME set for Java (Spark ``F.split``): ``(?U)\s`` is Unicode
#: White_Space, plus the \x1C-\x1F separators White_Space lacks =
#: exactly WHITESPACE_CODEPOINTS (asserted codepoint-by-codepoint in
#: tests/test_oracle_whitespace.py). Spelled via the property, not the
#: explicit class, because Java's regex engine runs the property lookup
#: 2.2x faster than the 29-char class scan (measured on the tokenizing
#: hot path — shingles/simhash/text metrics regressed ~60% with the
#: class). NEVER hand this to RE2/DuckDB: there ``(?U)`` flips
#: greediness instead.
JVM_WS_RUN_REGEX = r"(?U)[\s\x{1C}-\x{1F}]+"

# ---------------------------------------------------------------------------
# Pure-Python reference implementations (driver-side / oracle)
# ---------------------------------------------------------------------------


def chunk_value(value: str, cfg: HashSplitterConfig) -> list[str]:
    """A1: split ``value`` into prefixed chunks.

    Golden-tested against HashSplitterTokenizerTests.java vectors.
    """
    if value is None:
        return []
    if cfg.apply_input_cap:
        value = java_trim(value[:REFERENCE_INPUT_CAP])
    L = cfg.chunk_length
    return [
        cfg.prefix_at(i) + value[i * L : (i + 1) * L]
        for i in range((len(value) + L - 1) // L)
    ]


def chunk_value_with_offsets(
    value: str, cfg: HashSplitterConfig
) -> list[tuple[str, int, int]]:
    """A1 with character offsets: [(term, start, end)] — the offset
    attribute the reference tokenizer sets per chunk
    (HashSplitterTokenizer.java:123, ``offsetAtt.setOffset(oldPos,
    oldPos+gramSize)``); asserted by the reference golden tests."""
    if value is None:
        return []
    if cfg.apply_input_cap:
        value = java_trim(value[:REFERENCE_INPUT_CAP])
    L = cfg.chunk_length
    out = []
    for i in range((len(value) + L - 1) // L):
        start = i * L
        end = min(start + L, len(value))
        out.append((cfg.prefix_at(i) + value[start:end], start, end))
    return out


def chunk_tokens_with_offsets(
    tokens: Iterable[tuple[str, int]], cfg: HashSplitterConfig
) -> list[tuple[str, int, int, int]]:
    """A2 with stream attributes: ``[(term, position, start, end)]`` for
    upstream ``(token, token_start_offset)`` pairs — exactly the
    attributes the reference token filter emits
    (HashSplitterTokenFilter.java:99, ``offsetAtt.setOffset(tokStart +
    curPos, tokStart + curPos + curGramSize)``; the filter never touches
    the position-increment attribute, so every chunk advances the stream
    position by 1). ``position`` is the 0-based running chunk index
    across the whole stream."""
    out: list[tuple[str, int, int, int]] = []
    L = cfg.chunk_length
    pos = 0
    for tok, tok_start in tokens:
        for i in range((len(tok) + L - 1) // L):
            cur = i * L
            gram = min(L, len(tok) - cur)
            out.append(
                (
                    cfg.prefix_at(i) + tok[cur : cur + gram],
                    pos,
                    tok_start + cur,
                    tok_start + cur + gram,
                )
            )
            pos += 1
    return out


def chunk_tokens(tokens: Iterable[str], cfg: HashSplitterConfig) -> list[str]:
    """A2: chunk each upstream token; prefix counter resets per token."""
    out: list[str] = []
    L = cfg.chunk_length
    for tok in tokens:
        out.extend(
            cfg.prefix_at(i) + tok[i * L : (i + 1) * L]
            for i in range((len(tok) + L - 1) // L)
        )
    return out


def analyze(value: str, cfg: HashSplitterConfig) -> list[str]:
    """Full index-time analysis for a field value under ``cfg.token_mode``."""
    if value is None:
        return []
    if cfg.token_mode == "value":
        return chunk_value(value, cfg)
    return chunk_tokens(re.findall(cfg.token_pattern, value), cfg)


def term_freqs(value: str, cfg: HashSplitterConfig) -> dict[str, int]:
    """Term -> tf map for one document (order-independent)."""
    freqs: dict[str, int] = {}
    for t in analyze(value, cfg):
        freqs[t] = freqs.get(t, 0) + 1
    return freqs


# ---------------------------------------------------------------------------
# Vectorized kernels (executor-side, called from pandas UDFs)
# ---------------------------------------------------------------------------


def _chunk_flat(values: pd.Series, cfg: HashSplitterConfig) -> tuple[np.ndarray, np.ndarray]:
    """Chunk every string in ``values`` (A1, no cap/trim — callers pre-apply).

    Returns ``(flat_terms, counts)``: all chunk terms in row-major order and
    the per-row chunk count. Vectorized: one ``str.slice`` pass per chunk
    position (bounded by max value length / chunk_length in the batch).
    """
    values = values.fillna("")
    L = cfg.chunk_length
    lens = values.str.len().to_numpy(dtype=np.int64)
    counts = (lens + L - 1) // L
    max_chunks = int(counts.max()) if len(counts) else 0
    if max_chunks == 0:
        return np.empty(0, dtype=object), counts
    cols = np.empty((len(values), max_chunks), dtype=object)
    for i in range(max_chunks):
        piece = values.str.slice(i * L, (i + 1) * L)
        cols[:, i] = (cfg.prefix_at(i) + piece).to_numpy(dtype=object)
    # row-major flatten, keep only real chunks (j < counts[row])
    mask = np.arange(max_chunks)[None, :] < counts[:, None]
    return cols[mask], counts


def chunk_series(values: pd.Series, cfg: HashSplitterConfig) -> pa.Array:
    """A1 vectorized: Series[str] -> Arrow ``list<string>`` of chunk terms."""
    vals = values.fillna("")
    if cfg.apply_input_cap:
        vals = vals.str.slice(0, REFERENCE_INPUT_CAP).map(java_trim)
    flat, counts = _chunk_flat(vals, cfg)
    offsets = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), pa.array(flat, type=pa.string())
    )


def chunk_stream_frame(
    values: pd.Series, cfg: HashSplitterConfig
) -> pd.DataFrame:
    """A1 attribute stream, vectorized: Series[str] -> DataFrame with one
    row per emitted chunk — ``(row, pos, term, start_offset,
    end_offset)`` — carrying exactly the attributes the reference
    tokenizer sets per token (HashSplitterTokenizer.java:119-123:
    term = prefix + gram, offsets = ``(oldPos, oldPos+gramSize)``; the
    0-based ``pos`` is the stream position, one increment per chunk).
    This is the distributed analogue of the ES ``_analyze`` API output
    for the plugin's analyzer. Same cap+trim and chunking as
    :func:`chunk_series`; all offset arithmetic is numpy over the
    per-row chunk counts — no per-token Python."""
    vals = values.fillna("")
    if cfg.apply_input_cap:
        vals = vals.str.slice(0, REFERENCE_INPUT_CAP).map(java_trim)
    flat, counts = _chunk_flat(vals, cfg)
    lens = vals.str.len().to_numpy(dtype=np.int64)
    total = int(counts.sum())
    row = np.repeat(np.arange(len(vals), dtype=np.int64), counts)
    # stream position within each row: global arange minus the row's
    # first flat index
    firsts = np.zeros(len(vals), dtype=np.int64)
    if len(vals):
        firsts[1:] = np.cumsum(counts)[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(firsts, counts)
    start = pos * cfg.chunk_length
    end = np.minimum(start + cfg.chunk_length, np.repeat(lens, counts))
    return pd.DataFrame(
        {
            "row": row,
            "pos": pos,
            "term": flat,
            "start_offset": start,
            "end_offset": end,
        }
    )


def analyze_series(values: pd.Series, cfg: HashSplitterConfig) -> pa.Array:
    """Full analysis per ``token_mode``: Series[str] -> list<string> terms."""
    if cfg.token_mode == "value":
        return chunk_series(values, cfg)
    if cfg.token_pattern == r"\S+":
        # fast path: everything stays in Arrow C++ — split, slice, concat
        # — with zero per-token Python string objects (2.4x measured)
        return _analyze_tokens_arrow(values, cfg)
    values = values.fillna("")
    toks = values.str.findall(cfg.token_pattern)
    tok_counts = toks.str.len().to_numpy(dtype=np.int64)
    flat_tokens = pd.Series(
        [t for row in toks for t in row], dtype="object"
    )
    flat_terms, chunk_counts = _chunk_flat(flat_tokens, cfg)
    # terms per row = sum of chunk counts over that row's tokens
    row_term_counts = np.zeros(len(values), dtype=np.int64)
    if len(flat_tokens):
        row_idx = np.repeat(np.arange(len(values)), tok_counts)
        np.add.at(row_term_counts, row_idx, chunk_counts)
    offsets = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(row_term_counts, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()),
        pa.array(flat_terms, type=pa.string()),
    )


def _analyze_tokens_arrow(
    values: pd.Series, cfg: HashSplitterConfig
) -> pa.Array:
    """Arrow-native A2 pipeline for the default whitespace tokenizer
    (``utf8_split_whitespace`` == regex ``\\S+`` token semantics):
    list-flatten tokens, per-position ``utf8_slice_codeunits`` +
    ``binary_join_element_wise`` chunking, row-major reassembly via one
    ``take`` — no Python string ever materializes."""
    import pyarrow.compute as pc

    L = cfg.chunk_length
    a = pa.array(values.fillna(""), type=pa.string())
    toks = pc.utf8_split_whitespace(a)
    tok_counts = (
        pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(toks)
    tok_lens = (
        pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    keep = tok_lens > 0  # leading/trailing-whitespace artifacts
    n = len(values)
    row_of_tok = np.repeat(np.arange(n, dtype=np.int64), tok_counts)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        row_of_tok = row_of_tok[keep]
        tok_lens = tok_lens[keep]
    ccounts = (tok_lens + L - 1) // L
    maxc = int(ccounts.max()) if len(ccounts) else 0
    if maxc == 0:
        offsets = np.zeros(n + 1, dtype=np.int64)
        return pa.ListArray.from_arrays(
            pa.array(offsets), pa.array([], type=pa.string())
        )
    cols = []
    for i in range(maxc):
        piece = pc.utf8_slice_codeunits(flat, i * L, (i + 1) * L)
        cols.append(
            pc.binary_join_element_wise(
                pa.scalar(cfg.prefix_at(i)), piece, pa.scalar("")
            )
        )
    big = pa.concat_arrays([c.cast(pa.string()) for c in cols])
    m = len(flat)
    total = int(ccounts.sum())
    starts = np.zeros(m, dtype=np.int64)
    if m:
        starts[1:] = np.cumsum(ccounts)[:-1]
    js = np.arange(total, dtype=np.int64) - np.repeat(starts, ccounts)
    tok_idx = np.repeat(np.arange(m, dtype=np.int64), ccounts)
    terms = big.take(pa.array(js * m + tok_idx, type=pa.int64()))
    row_term_counts = np.zeros(n, dtype=np.int64)
    np.add.at(row_term_counts, row_of_tok, ccounts)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_term_counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets), terms)


def term_freq_series(values: pd.Series, cfg: HashSplitterConfig) -> pd.Series:
    """Series[str] -> Series[dict[term, tf]] (for ``map<string,int>`` UDFs)."""
    frame = term_counts_frame(values, cfg)
    return pd.Series(
        [
            dict(zip(t.tolist(), f.tolist()))
            for t, f in zip(frame["terms"], frame["tfs"])
        ],
        dtype="object",
    )


def term_counts_frame(values: pd.Series, cfg: HashSplitterConfig) -> pd.DataFrame:
    """Series[str] -> DataFrame(terms: object[np.ndarray[str]],
    tfs: object[np.ndarray[int]], dl: int64).

    Aggregating tf inside the UDF avoids a separate (doc_id, term) groupBy
    shuffle before the term-range repartition in the index build. The
    (row, term) -> count aggregation is one C-speed pandas groupby over
    the flat term stream; per-row arrays come out of np.split (no per-row
    Python work beyond list assembly).
    """
    arr = analyze_series(values, cfg)
    offsets = arr.offsets.to_numpy()
    flat = arr.values.to_numpy(zero_copy_only=False)
    n = len(values)
    dl = np.diff(offsets).astype(np.int64)
    if flat.size == 0:
        empty_s = np.empty(0, dtype=object)
        empty_i = np.empty(0, dtype=np.int64)
        return pd.DataFrame(
            {
                "terms": [empty_s] * n,
                "tfs": [empty_i] * n,
                "dl": dl,
            }
        )
    # factorize + integer-key sort: hash-based term coding then one
    # C-speed argsort on (row, code) composite keys. Per-row term order
    # is code order (not lexicographic) — irrelevant downstream, the
    # build re-sorts globally in the term shuffle.
    row_idx = np.repeat(np.arange(n, dtype=np.int64), dl)
    codes, uniques = pd.factorize(flat, sort=False)
    key = row_idx * np.int64(len(uniques)) + codes
    order = np.argsort(key, kind="stable")
    ks = key[order]
    change = np.flatnonzero(ks[1:] != ks[:-1]) + 1
    starts = np.concatenate(([0], change))
    tfs = np.diff(np.concatenate((starts, [len(ks)])))
    uk = ks[starts]
    rows = (uk // len(uniques)).astype(np.int64)
    terms = np.asarray(uniques, dtype=object)[
        (uk % len(uniques)).astype(np.int64)
    ]
    counts = np.zeros(n, dtype=np.int64)
    np.add.at(counts, rows, 1)
    bounds = np.cumsum(counts)[:-1]
    return pd.DataFrame(
        {
            "terms": np.split(terms, bounds),
            "tfs": np.split(tfs, bounds),
            "dl": dl,
        }
    )
