"""Engine configuration.

Mirrors the reference field-mapping settings (chunk_length, prefixes, size,
wildcard_one, wildcard_any) parsed by the reference's ``TypeParser``
(/root/reference/src/main/java/org/elasticsearch/index/mapper/hashsplitter/
HashSplitterFieldMapper.java:193-245, defaults at :79-83) plus BM25 scoring
parameters (not present in the reference, mandated by BASELINE.json
north_rule: Lucene-style BM25, k1=1.2, b=0.75).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

#: Default prefix alphabet — HashSplitterFieldMapper.java:80
DEFAULT_PREFIXES = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789,."
)

#: The reference tokenizer reads at most 1024 chars of the field value
#: (HashSplitterTokenizer.java:109-112).
REFERENCE_INPUT_CAP = 1024

_JAVA_TRIM_CHARS = "".join(chr(c) for c in range(0x21))


def java_trim(s: str) -> str:
    """Java ``String.trim()``: strips chars <= U+0020 from both ends."""
    return s.strip(_JAVA_TRIM_CHARS)


@dataclass(frozen=True)
class HashSplitterConfig:
    """Field / engine configuration.

    ``size is None`` means "variable" (the reference's default); an int pins
    the expected value length, enabling suffix wildcards and the total-range
    filter (README.md:89-106).

    ``token_mode``:
      * ``"value"``  — A1 semantics: the whole field value is one string to
        chunk (HashSplitterTokenizer.java:105-129), subject to the 1024-char
        cap + trim when ``apply_input_cap``.
      * ``"tokens"`` — A2 semantics: the value is first split into tokens
        (``token_pattern`` regex), each token chunked independently with the
        position-prefix counter reset per token
        (HashSplitterTokenFilter.java:75-106, reset at :82-83).
    """

    chunk_length: int = 1
    prefixes: str = DEFAULT_PREFIXES
    size: int | None = None
    wildcard_one: str = "?"
    wildcard_any: str = "*"
    token_mode: str = "value"
    token_pattern: str = r"\S+"
    apply_input_cap: bool = True
    # BM25 params (BASELINE.json north_rule; Lucene-style idf)
    bm25_k1: float = 1.2
    bm25_b: float = 0.75

    def __post_init__(self) -> None:
        if self.chunk_length < 1:
            raise ValueError("chunk_length must be greater than zero")
        if self.size is not None and self.size < 0:
            raise ValueError("size must be positive")
        if not self.prefixes:
            raise ValueError("prefixes must be non-empty")
        if self.token_mode not in ("value", "tokens"):
            raise ValueError("token_mode must be 'value' or 'tokens'")

    @property
    def size_is_variable(self) -> bool:
        return self.size is None

    @property
    def prefix_count(self) -> int:
        return len(self.prefixes)

    def prefix_at(self, position: int) -> str:
        """Position marker for chunk ``position``; wraps modulo the alphabet
        (HashSplitterTokenizer.java:126-127 — documented-against wrap)."""
        return self.prefixes[position % self.prefix_count]

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "HashSplitterConfig":
        return cls(**json.loads(s))


#: Config mirroring src/test/resources/basic-mapping.json
BASIC = HashSplitterConfig(chunk_length=1)
#: src/test/resources/chunklength2-mapping.json
CHUNKLENGTH2 = HashSplitterConfig(chunk_length=2)
#: chunklength4-prefixesLowercasedAlphabet-mapping.json
CL4_LOWER = HashSplitterConfig(
    chunk_length=4, prefixes="abcdefghijklmnopqrstuvwxyz"
)
#: chunklength4-prefixesLowercasedAlphabet-SqlWildcards-mapping.json
CL4_LOWER_SQL = HashSplitterConfig(
    chunk_length=4,
    prefixes="abcdefghijklmnopqrstuvwxyz",
    wildcard_one="_",
    wildcard_any="%",
)
#: chunklength4-prefixesLowercasedAlphabet-size16Fixed-mapping.json
CL4_LOWER_FIXED16 = HashSplitterConfig(
    chunk_length=4, prefixes="abcdefghijklmnopqrstuvwxyz", size=16
)

#: Engine default for the source-code / documents corpus: per-token chunking.
CODE_CORPUS = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)
