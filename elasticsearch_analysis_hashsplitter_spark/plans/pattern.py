"""Search-time pattern analysis (B1): user pattern -> positioned chunk patterns.

Behavioral reimplementation of the reference's search tokenizer
(/root/reference/src/main/java/org/elasticsearch/index/analysis/
HashSplitterSearchTokenizer.java:148-216). Pure driver-side Python —
query compilation never touches the cluster.

Normalization rules (golden-tested against
HashSplitterSearchTokenizerTests.java):

1. input capped at 1024 chars and Java-trimmed (:152-154);
2. wildcard_any ('*') handling (:157-186):
   * invalid — multiple '*', or a non-final '*' with variable size —
     ALL '*' are deleted (zero-length-match fallback, README.md:252-255);
   * single final '*' — stripped (prefix pattern);
   * single enclosed '*' with fixed size — expanded into
     ``size - len + 1`` copies of wildcard_one so total length == size;
3. pad with wildcard_one to a multiple of chunk_length (:188-196);
4. emit position-prefixed chunk patterns; chunks that are entirely
   wildcard_one are skipped but still consume their position (:212-215).
"""

from __future__ import annotations

from ..config import REFERENCE_INPUT_CAP, HashSplitterConfig, java_trim


def normalize_pattern(pattern: str, cfg: HashSplitterConfig) -> str:
    """Steps 1-3: returns the padded, '*'-free pattern string."""
    s = java_trim(pattern[:REFERENCE_INPUT_CAP])
    any_c, one_c = cfg.wildcard_any, cfg.wildcard_one
    pos = s.find(any_c)
    if pos != -1:
        n = len(s)
        if pos < n - 1 and (cfg.size_is_variable or s.find(any_c, pos + 1) != -1):
            # invalid: non-final '*' with variable size, or multiple '*'
            s = s.replace(any_c, "")
        elif pos == n - 1:
            s = s[:-1]
        else:  # single enclosed '*', fixed size: expand to '?'s
            s = s[:pos] + one_c * (cfg.size - n + 1) + s[pos + 1 :]
    L = cfg.chunk_length
    if len(s) % L != 0:
        s = s + one_c * (L - len(s) % L)
    return s


def search_chunks(pattern: str, cfg: HashSplitterConfig) -> list[str]:
    """Full B1: pattern -> list of position-prefixed chunk patterns.

    Each element is ``prefix_char + chunk_pattern`` where the chunk pattern
    contains only literals and wildcard_one. All-wildcard chunks are omitted
    (no constraint at that position) but their position prefix is consumed.
    """
    s = normalize_pattern(pattern, cfg)
    L = cfg.chunk_length
    skip = cfg.wildcard_one * L
    out: list[str] = []
    for i in range(len(s) // L):
        chunk = s[i * L : (i + 1) * L]
        if chunk == skip:
            continue
        out.append(cfg.prefix_at(i) + chunk)
    return out


def glob_to_regex(pattern: str, cfg: HashSplitterConfig) -> str:
    """Translate a term-level glob (wildcard_one / wildcard_any) to an
    anchored regex.

    Matches the reference matcher semantics
    (WildcardTermEnum.wildcardEquals, WildcardTermEnum.java:99-188)
    including the rule that a trailing wildcard_one must consume a
    character — ``'cat'`` does NOT match ``'ca??'`` (:135-138) — which
    anchored-regex ``.`` gives for free.
    """
    out = []
    for ch in pattern:
        if ch == cfg.wildcard_one:
            out.append(".")
        elif ch == cfg.wildcard_any:
            out.append(".*")
        elif ch in r"\.^$+{}[]|()?*":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def literal_prefix(pattern: str, cfg: HashSplitterConfig) -> str:
    """Longest leading literal run of a glob pattern — the term-dictionary
    seek key (WildcardTermEnum.java:56-69); maps to min/max-stats pruning
    via ``startswith`` on the term-sorted postings."""
    for i, ch in enumerate(pattern):
        if ch in (cfg.wildcard_one, cfg.wildcard_any):
            return pattern[:i]
    return pattern
