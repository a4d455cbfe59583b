"""Deterministic synthetic source-code corpus (BASELINE.json input_hint).

Schema: (repo string, path string, commit string, lang string,
content string) + derived doc_id — the Iceberg-table shape the engine
targets. Generated distributed (mapInPandas over ``spark.range``) with a
counter-based construction: every value is a pure function of the row id
and the seed, so any partitioning/parallelism yields identical rows —
which is what makes the two-parallelism scaling benchmark an
apples-to-apples comparison and the build resumable.

No external data; vocabulary and planted 32-hex hash tokens are fixed
in-module (FIXTURES.md §1).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

LANGS = ["java", "py", "js", "go", "c"]
EXT = {"java": "java", "py": "py", "js": "js", "go": "go", "c": "c"}

# small source-code-ish vocabulary (identifiers, keywords, literals)
_VOCAB = np.array(
    [
        "public", "static", "void", "main", "string", "args", "return",
        "import", "class", "def", "self", "init", "func", "package",
        "include", "stdio", "printf", "println", "system", "out", "int",
        "long", "float", "double", "char", "bool", "true", "false", "null",
        "none", "nil", "new", "delete", "malloc", "free", "struct", "enum",
        "interface", "implements", "extends", "override", "abstract",
        "final", "const", "let", "var", "function", "lambda", "yield",
        "async", "await", "try", "catch", "except", "finally", "throw",
        "raise", "error", "err", "panic", "recover", "defer", "goroutine",
        "channel", "select", "switch", "case", "default", "break",
        "continue", "for", "while", "do", "if", "else", "elif", "then",
        "foreach", "map", "filter", "reduce", "fold", "list", "array",
        "vector", "hashmap", "dict", "set", "tuple", "index", "key",
        "value", "node", "tree", "graph", "queue", "stack", "heap",
        "buffer", "stream", "reader", "writer", "parser", "lexer", "token",
        "0x1f", "0xff", "42", "1024", "3.14159", "1e9", "i", "j", "k", "n",
        "x", "y", "tmp", "result", "count", "total", "sum", "avg", "len",
        "size", "offset", "pos", "idx", "ptr", "ref", "obj", "ctx", "cfg",
        "opts", "params", "request", "response", "client", "server",
        "socket", "thread", "mutex", "lock", "atomic", "volatile",
    ],
    dtype=object,
)

#: 50 planted fixed-length 32-hex hash tokens (hash-field parity scenarios)
PLANTED_HASHES = np.array(
    [hashlib.md5(f"plant{i}".encode()).hexdigest() for i in range(50)],
    dtype=object,
)


def _mix(a: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """Cheap counter-based 64-bit mixer (splitmix64-style)."""
    k = (seed * 0x9E3779B97F4A7C15 + salt) & 0xFFFFFFFFFFFFFFFF
    z = a.astype(np.uint64) + np.uint64(k)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _content_for_ids(ids: np.ndarray, seed: int) -> list[str]:
    n_tokens = 50 + (_mix(ids, 1, seed) % np.uint64(351)).astype(np.int64)
    out = []
    for rid, nt in zip(ids.tolist(), n_tokens.tolist()):
        j = np.arange(nt, dtype=np.uint64)
        tok_idx = _mix(np.uint64(rid) * np.uint64(1_000_003) + j, 2, seed)
        toks = _VOCAB[(tok_idx % np.uint64(len(_VOCAB))).astype(np.int64)]
        if rid % 7 == 0:  # plant a fixed-length hash token
            toks = toks.copy()
            toks[int(_mix(np.array([rid]), 3, seed)[0] % np.uint64(nt))] = (
                PLANTED_HASHES[rid % 50]
            )
        out.append(" ".join(toks.tolist()))
    return out


def generate_corpus(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """-> DataFrame(doc_id, repo, path, commit, lang, content).

    ``start`` offsets the doc_id range (rows are a pure function of id +
    seed, so ``start=N`` yields exactly the rows a ``start=0`` corpus of
    ``N + n_rows`` would add after its first N — an append batch for
    refresh/ingest probes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            langs = [LANGS[i % len(LANGS)] for i in ids.tolist()]
            commits = [
                hashlib.sha1(f"commit{i}".encode()).hexdigest()
                for i in ids.tolist()
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "repo": [f"org{i % 7}/repo{i % 101}" for i in ids.tolist()],
                    "path": [
                        f"src/{lang}/mod{i % 211}/file{i}.{EXT[lang]}"
                        for i, lang in zip(ids.tolist(), langs)
                    ],
                    "commit": commits,
                    "lang": langs,
                    "content": _content_for_ids(ids, seed),
                }
            )

    rng = spark.range(start, start + n_rows, numPartitions=partitions)
    return rng.mapInPandas(
        gen,
        schema=(
            "doc_id long, repo string, path string, commit string, "
            "lang string, content string"
        ),
    )


def _unit_rows(ids: np.ndarray, dim: int, salt: int, seed: int) -> np.ndarray:
    """(len(ids), dim) unit vectors, each a pure function of (id, salt,
    seed): splitmix-mixed uniforms in [-1, 1), row-normalized."""
    j = np.arange(dim, dtype=np.uint64)
    raw = _mix(
        ids.astype(np.uint64)[:, None] * np.uint64(0x100000001B3) + j[None, :],
        salt,
        seed,
    )
    m = raw.astype(np.float64) / float(2**63) - 1.0
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m


def generate_embeddings(
    spark: SparkSession,
    n_rows: int,
    dim: int = 64,
    seed: int = 7,
    dup_every: int = 10,
    noise: float = 0.15,
    partitions: int | None = None,
) -> DataFrame:
    """-> DataFrame(vec_id long, embedding array<double>) — deterministic
    synthetic embedding table for the near-dup/ANN scale probes.

    Counter-based like :func:`generate_corpus` (every row a pure
    function of vec_id + seed, identical under any partitioning).
    Rows with ``vec_id % dup_every == dup_every - 1`` are PLANTED
    near-duplicates: ``normalize(base + noise * unit_perturbation)``
    of the vector at ``vec_id - (dup_every - 1)``, cosine ~= 0.99 at
    the default noise — so a probe knows exactly which pairs a
    near-dup operator must find and can measure recall at scale, not
    just wall time. All other rows are independent uniform unit
    vectors (random cosine concentrates at 0 +- 1/sqrt(dim))."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            is_dup = ids % dup_every == dup_every - 1
            base_ids = np.where(is_dup, ids - (dup_every - 1), ids)
            m = _unit_rows(base_ids, dim, 11, seed)
            if is_dup.any():
                pert = _unit_rows(ids[is_dup], dim, 13, seed)
                v = m[is_dup] + noise * pert
                m[is_dup] = v / np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(m)}
            )

    rng = spark.range(n_rows, numPartitions=partitions)
    return rng.mapInPandas(gen, schema="vec_id long, embedding array<double>")
