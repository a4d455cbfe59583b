"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``       — exact brute-force top-k against a query vector.
  The dot product is a JVM-side ``zip_with``/``aggregate`` expression
  (whole-stage codegen, no Python in the scan); top-k is
  TakeOrderedAndProject (per-partition heap + driver merge), so the
  full score column never shuffles.
* ``rp_lsh_buckets`` / ``rp_lsh_topk`` — random-hyperplane LSH: signature
  bits from dot products against seed-deterministic planes (vectorized
  Arrow UDF), candidates from matching any of ``bands`` signature bands,
  exact cosine re-rank. The scale path: candidate generation is an
  equality join on (band, key), never an all-pairs scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm_col(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def cosine_col(vec_col, query: list[float]):
    """JVM-side cosine similarity between a column and a literal vector."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(vec, q, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    qn = float(np.sqrt(np.dot(query, query))) or 1.0
    return dot / (_norm_col(vec) * F.lit(qn))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k. -> (vec_id, cos) ordered."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_col(vec_col, query), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _pair_cosine(a_vec, b_vec):
    dot = F.aggregate(
        F.zip_with(a_vec, b_vec, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (_norm_col(a_vec) * _norm_col(b_vec))


def cosine_near_duplicates(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup pairs: all (a < b) with cosine >=
    threshold. O(n^2) — the verification/oracle tier and the correct
    choice for per-bucket verification; use
    :func:`cosine_near_duplicates_lsh` to generate candidates at scale."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _pair_cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select(
            "id_a", "id_b", F.round(cos, 6).alias("cos")
        )
        .where(F.col("cos") >= threshold)
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            "cos",
        )
    )


def cosine_near_duplicates_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: random-hyperplane LSH band buckets generate candidate
    pairs (equality join on (band, key) — never an all-pairs product),
    exact cosine verifies. Precision is exact; recall < 1 by LSH
    construction (more bands -> higher recall)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    buckets = rp_lsh_buckets(df, dim, n_bits, bands, seed, id_col, vec_col)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    va = df.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    joined = cand.join(va, "vec_a").join(vb, "vec_b")
    cos = _pair_cosine(F.col("va"), F.col("vb"))
    return (
        joined.select("vec_a", "vec_b", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def _planes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(dim, n_bits)).astype(np.float64)


def rp_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_bits: int = 32,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, band, key): one row per signature band.

    Signature = sign bits of projections onto seed-deterministic random
    hyperplanes, computed as one matrix multiply per Arrow batch.
    """
    planes = _planes(dim, n_bits, seed)
    rows = n_bits // bands

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0  # (batch, n_bits)
        keys = np.zeros((m.shape[0], bands), dtype=np.int64)
        for j in range(rows):
            keys = keys * 2 + bits[:, j::rows][:, :bands]
        return pd.Series(list(keys.astype(np.int32)))

    return df.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(band_keys(F.col(vec_col))).alias("band", "key"),
    )


def rp_lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_bits: int = 32,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates sharing >= 1 signature band with the query,
    re-ranked by exact cosine. Recall < 1 by construction; the exact
    re-rank keeps precision exact for returned candidates."""
    dim = len(query)
    planes = _planes(dim, n_bits, seed)
    rows = n_bits // bands
    qbits = (np.asarray(query, dtype=np.float64) @ planes) > 0
    qkeys = np.zeros(bands, dtype=np.int64)
    for j in range(rows):
        qkeys = qkeys * 2 + qbits[j::rows][:bands]
    buckets = rp_lsh_buckets(df, dim, n_bits, bands, seed, id_col, vec_col)
    cond = None
    for i, qk in enumerate(qkeys):
        c = (F.col("band") == i) & (F.col("key") == int(qk))
        cond = c if cond is None else (cond | c)
    match = buckets.where(cond).select("vec_id").distinct()
    cand = df.join(
        F.broadcast(match), df[id_col] == match["vec_id"], "left_semi"
    )
    return cosine_topk(cand, query, k, id_col, vec_col)
