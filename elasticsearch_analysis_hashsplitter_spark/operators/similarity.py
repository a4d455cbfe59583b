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
    method: str = "broadcast",
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """Exact embedding near-dup pairs: all (a < b) with cosine >=
    threshold. O(n^2) comparisons by definition — the verification/
    oracle tier; use :func:`cosine_near_duplicates_lsh` to generate
    candidates at scale.

    ``method='broadcast'`` (default): normalize + broadcast one full copy
    of the vectors (2M rows x dim 64 float64 ~ 1 GB executor-side) and
    stream the other side through a vectorized kernel — each Arrow batch
    is ONE BLAS matrix product against the broadcast matrix, with only
    the >= threshold survivors materialized. 30x+ faster than the
    ``'pairs'`` Catalyst self-join (per-pair zip_with/aggregate fold),
    and no shuffle at all. Beyond ``max_broadcast_rows`` the broadcast
    tier refuses (raise) — at that size brute force is the wrong tool;
    use the LSH tier.
    """
    if method == "pairs":
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
    if method != "broadcast":
        raise ValueError(f"method: {method!r}")

    rows = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    collected = rows.limit(max_broadcast_rows + 1).collect()
    if len(collected) > max_broadcast_rows:
        raise ValueError(
            f"cosine_near_duplicates(method='broadcast') over "
            f">{max_broadcast_rows} rows — use the LSH tier "
            f"(cosine_near_duplicates_lsh) at this scale"
        )
    ids = np.array([r["vec_id"] for r in collected], dtype=np.int64)
    mat = np.array([r["v"] for r in collected], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    bc = rows.sparkSession.sparkContext.broadcast((ids, mat, norms))

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType(), False),
            T.StructField("vec_b", T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    def scan(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.stack(pdf["v"].to_numpy())
            a_norms = np.linalg.norm(a_mat, axis=1)
            a_norms[a_norms == 0] = 1.0
            # one BLAS product per Arrow batch; keep only a < b survivors
            sims = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
            sims = np.round(sims, 6)
            ii, jj = np.nonzero(
                (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
            )
            if not ii.size:
                continue
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[ii],
                    "vec_b": b_ids[jj],
                    "cos": sims[ii, jj],
                }
            )

    return rows.mapInPandas(scan, schema=out_schema)


def cosine_near_duplicates_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Scale path: random-hyperplane LSH band buckets generate candidate
    pairs (equality join on (band, key) — never an all-pairs product),
    exact cosine verifies. Precision is exact; recall < 1 by LSH
    construction (more bands -> higher recall).

    SIZE the band keys to the corpus: a band key has ``n_bits/bands``
    bits, i.e. ``2^(n_bits/bands)`` buckets per band, and the self-join
    is quadratic in bucket occupancy — the r5 1M-vector probe measured
    the 32/8 default (16 buckets/band, ~62k vectors each) at ~1.6e12
    candidate pairs, an all-pairs product in disguise. Pick
    ``n_bits/bands >= log2(n_vectors) + 4`` (e.g. 192/8 at 1M) so the
    expected bucket occupancy stays O(1); recall for pairs AT the
    threshold drops as keys widen, so re-check the planted-pair recall
    the probe measures. ``max_bucket_size`` drops over-cap buckets from
    candidate generation entirely (same knob as MinHash LSH): a natural
    embedding cluster bigger than the cap can't go quadratic — its
    pairs can still surface through the other bands."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    buckets = rp_lsh_buckets(df, dim, n_bits, bands, seed, id_col, vec_col)
    if max_bucket_size is not None:
        ok = (
            buckets.groupBy("band", "key")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") <= max_bucket_size)
            .select("band", "key")
        )
        buckets = buckets.join(ok, ["band", "key"])
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
    keep_vec: bool = False,
) -> DataFrame:
    """-> (vec_id, band, key): one row per signature band.

    Signature = sign bits of projections onto seed-deterministic random
    hyperplanes, computed as one matrix multiply per Arrow batch.
    ``keep_vec`` carries the vector column through (the serving-index
    shape — see :func:`rp_lsh_index`)."""
    planes = _planes(dim, n_bits, seed)
    rows = n_bits // bands
    if rows > 31:
        raise ValueError(
            f"n_bits//bands = {rows} bits per band key overflows the "
            "int32 key column (max 31); raise bands or lower n_bits"
        )

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0  # (batch, n_bits)
        keys = np.zeros((m.shape[0], bands), dtype=np.int64)
        for j in range(rows):
            keys = keys * 2 + bits[:, j::rows][:, :bands]
        return pd.Series(list(keys.astype(np.int32)))

    cols = [F.col(id_col).alias("vec_id")]
    if keep_vec:
        cols.append(F.col(vec_col))
    return df.select(
        *cols,
        F.posexplode(band_keys(F.col(vec_col))).alias("band", "key"),
    )


def query_band_keys(
    query: list[float], n_bits: int = 32, bands: int = 4, seed: int = 42
) -> list[int]:
    """Driver-side band keys for a query vector (same plane family as
    :func:`rp_lsh_buckets`)."""
    planes = _planes(len(query), n_bits, seed)
    rows = n_bits // bands
    qbits = (np.asarray(query, dtype=np.float64) @ planes) > 0
    qkeys = np.zeros(bands, dtype=np.int64)
    for j in range(rows):
        qkeys = qkeys * 2 + qbits[j::rows][:bands]
    return [int(x) for x in qkeys]


def query_probe_keys(
    query: list[float],
    n_bits: int = 32,
    bands: int = 4,
    seed: int = 42,
    n_probes: int = 1,
) -> list[list[int]]:
    """Multi-probe key sequence per band (Lv et al., VLDB 2007): the
    base key first, then keys reached by flipping the signature bits
    whose hyperplane projections have the SMALLEST absolute margin —
    the bits most likely to disagree with a true near neighbor's.
    Perturbation subsets are enumerated in ascending total-margin order
    via the classic shift/expand heap, so ``n_probes`` keys cost
    O(n_probes log n_probes) driver work, never 2^rows enumeration.

    Multi-probing trades a slightly wider (still partition-pruned) read
    for recall WITHOUT growing the index — the alternative, more
    bands/tables, multiplies index storage instead. -> one list of
    ``n_probes`` keys per band; element 0 equals
    :func:`query_band_keys`."""
    import heapq

    planes = _planes(len(query), n_bits, seed)
    rows = n_bits // bands
    proj = np.asarray(query, dtype=np.float64) @ planes
    out = []
    for b in range(bands):
        bit_idx = [j + b * rows for j in range(rows)]
        key = 0
        for j in range(rows):
            key = key * 2 + int(proj[bit_idx[j]] > 0)
        # (margin, key-XOR weight) sorted cheapest-flip first
        margins = sorted(
            (abs(float(proj[bit_idx[j]])), 1 << (rows - 1 - j))
            for j in range(rows)
        )
        keys = [key]
        heap = [(margins[0][0], (0,))]
        while heap and len(keys) < n_probes:
            score, subset = heapq.heappop(heap)
            flipped = key
            for p in subset:
                flipped ^= margins[p][1]
            keys.append(flipped)
            last = subset[-1]
            if last + 1 < rows:
                heapq.heappush(
                    heap,
                    (
                        score - margins[last][0] + margins[last + 1][0],
                        subset[:-1] + (last + 1,),
                    ),
                )
                heapq.heappush(
                    heap, (score + margins[last + 1][0], subset + (last + 1,))
                )
        out.append(keys)
    return out


#: Fixed sub-bucket fan-out inside each band partition of an
#: :func:`rp_lsh_index` table. Fixed (not a knob) so the query side can
#: reconstruct the partition value from the key alone — no metadata
#: sidecar to keep in sync between writer and reader.
_KEY_BUCKETS = 64


def rp_lsh_index(
    df: DataFrame,
    dim: int,
    path: str,
    n_bits: int = 32,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serving-path ANN index: one row per (vector, band) carrying the
    VECTOR ITSELF, persisted partitioned by ``(band, kb)`` where
    ``kb = key mod 64`` — and key-sorted inside every partition. Same
    lesson the 1M IVF probe taught (see :func:`ivf_index`): an id-only
    index leaves the dominant scan unpruned — the candidate fetch
    semi-join still reads the whole corpus. Storing the vector in every
    band row costs ``bands``x vector storage; that duplication IS the
    speed tier (the posting-list analogue: the index is the serving
    structure).

    Why the ``kb`` sub-partition: a query probes ONE key in EVERY band,
    so partitioning by band alone prunes nothing — the r5 1M probe
    measured that layout at 5.5 s/query, 3x SLOWER than exact brute
    force. With 64 key sub-buckets per band the query's partition
    filter ``(band=i AND kb=key_i mod 64)`` touches ~1/64 of the index,
    and the key sort lets parquet row-group min/max skip most of what
    remains. Returns the reloaded bucket table; pass it to
    :func:`rp_lsh_topk` via ``buckets=``."""
    b = rp_lsh_buckets(
        df, dim, n_bits, bands, seed, id_col, vec_col, keep_vec=True
    ).withColumn("kb", F.pmod(F.col("key"), F.lit(_KEY_BUCKETS)))
    (
        b.repartition("band", "kb")
        .sortWithinPartitions("band", "kb", "key")
        .write.mode("overwrite")
        .partitionBy("band", "kb")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)


def rp_lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets: DataFrame | None = None,
    n_probes: int = 1,
) -> DataFrame:
    """ANN top-k: candidates sharing >= 1 signature band with the query,
    re-ranked by exact cosine. Recall < 1 by construction; the exact
    re-rank keeps precision exact for returned candidates.

    ``n_probes``: keys probed per band (:func:`query_probe_keys`) —
    multi-probe LSH visits the buckets a near neighbor most plausibly
    hashed into (lowest-margin bit flips first), raising recall without
    widening the index. Each extra probe adds one (band, kb, key)
    disjunct to the same pruned scan; candidates stay deduped before
    the exact re-rank, so precision is unchanged.

    Default operating point: bands=8 over n_bits=32 (4 bits/band) —
    recall@10 ~0.71 measured on the natural sf0.1 embeddings, the speed
    tier of the RECALL.md curve (pinned by tests/test_recall_defaults.py
    against drift); bands=16 measures recall 1.0 there at the cost of
    much looser buckets. At corpus scale raise n_bits with the data
    volume so per-band keys keep selectivity, then re-measure with
    tools/recall_report.py.

    ``buckets``: a precomputed bucket table (:func:`rp_lsh_index`) — the
    serving path; omitted, the buckets are derived in-line (one pass
    over ``df``, fine for ad-hoc use). An index table carries the
    vectors, so candidates are re-ranked straight off the pruned band
    partitions (a vector matching in several bands is deduped on the
    TINY candidate set) — no join back to the base table; an id-only
    bucket frame falls back to the broadcast semi-join, which scans
    the base table in full — fine ad hoc, wrong as a serving path."""
    dim = len(query)
    probe_keys = query_probe_keys(query, n_bits, bands, seed, n_probes)
    if buckets is None:
        buckets = rp_lsh_buckets(df, dim, n_bits, bands, seed, id_col, vec_col)
    has_kb = "kb" in buckets.columns
    cond = None
    for i, pkeys in enumerate(probe_keys):
        ks = [int(x) for x in pkeys]
        c = (F.col("band") == i) & (
            F.col("key").isin(ks) if len(ks) > 1 else (F.col("key") == ks[0])
        )
        if has_kb:
            # reconstructed partition value (kb = key mod _KEY_BUCKETS,
            # fixed at write time) — this is what makes the partition
            # filter prunable: band alone matches EVERY partition
            kbs = sorted({k % _KEY_BUCKETS for k in ks})
            c = c & (
                F.col("kb").isin(kbs)
                if len(kbs) > 1
                else (F.col("kb") == kbs[0])
            )
        cond = c if cond is None else (cond | c)
    if vec_col in buckets.columns:
        cand = (
            buckets.where(cond)
            .select(F.col("vec_id").alias(id_col), vec_col)
            .dropDuplicates([id_col])
        )
    else:
        match = buckets.where(cond).select("vec_id").distinct()
        cand = df.join(
            F.broadcast(match), df[id_col] == match["vec_id"], "left_semi"
        )
    return cosine_topk(cand, query, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + probed exact re-rank
# ---------------------------------------------------------------------------


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    dim: int | None = None,
    seed: int = 42,
    sample_rows: int = 4096,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Driver-side k-means on a deterministic sample -> (n_centroids, dim).

    The quantizer is tiny (centroids broadcast everywhere); training on a
    bounded sample is the standard IVF recipe — at 100 TB you never
    k-means the full corpus, you sample. Deterministic: seeded numpy
    init, fixed Lloyd iterations, sample taken by ascending id (the
    corpus is already row-shuffled by construction; use a hash-sample
    upstream if ids correlate with content)."""
    rows = (
        df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample_rows)
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return c


def _nearest_centroid_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid kernel against the broadcast
    quantizer: one matrix product per batch."""
    c = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ c.T).argmax(axis=1).astype(np.int32))

    return nearest


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, centroid): nearest-centroid assignment, one matrix
    product per Arrow batch against the broadcast quantizer."""
    nearest = _nearest_centroid_udf(centroids)
    return df.select(
        F.col(id_col).alias("vec_id"), nearest(F.col(vec_col)).alias("centroid")
    )


def ivf_index(
    df: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Persist (id, vector, centroid) partitioned by centroid — the
    vectors THEMSELVES live in the index, so a query's candidate fetch
    is a partition-pruned scan of its ``nprobe`` centroid partitions
    and never touches the base table.

    The 1M probe (BENCH.md, r5) caught the previous id-only layout:
    with only (vec_id, centroid) persisted, :func:`ivf_topk` had to
    semi-join the probed ids back against the FULL vector table — the
    partition pruning saved nothing on the dominant scan, and the
    probed path measured SLOWER than exact brute force (0.79 vs
    0.55 s/query at 1M x 64-d, nprobe 32/256). Duplicating the vector
    bytes into the index is the standard IVF trade: the index IS the
    serving structure; at 100 TB the base table need not be read at
    query time at all."""
    nearest = _nearest_centroid_udf(centroids)
    a = df.select(
        F.col(id_col),
        F.col(vec_col),
        nearest(F.col(vec_col)).alias("centroid"),
    )
    a.write.mode("overwrite").partitionBy("centroid").parquet(path)
    return df.sparkSession.read.parquet(path)


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` centroids nearest the query,
    exact-cosine re-rank their members. Recall grows with nprobe
    (nprobe = n_centroids is exact); precision of returned rows is exact
    by construction (true cosines, same ordering as cosine_topk).

    Default operating point: nprobe=12 of the default 16 centroids —
    recall@10 >= 0.9 measured on the natural sf0.1 embeddings (RECALL.md
    curve; pinned by tests/test_recall_defaults.py so knob drift is
    caught). Scale deployments raise n_centroids and keep nprobe/
    n_centroids near this ratio, or tune from their own recall curve
    via tools/recall_report.py.

    Candidate fetch: when ``assignments`` carries the vector column
    (an :func:`ivf_index` table), the probed centroids' partitions are
    scanned directly (partition pruning — the only data read is
    nprobe/n_centroids of the index; plan-audited in
    tests/test_pipeline_ops.py). An id-only assignment table falls
    back to a broadcast semi-join against the base table, which scans
    the base table in full — fine ad hoc, wrong as a serving path."""
    c = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(c @ q))[: min(nprobe, len(c))]
    if assignments is None:
        assignments = ivf_assign(df, c, id_col, vec_col)
    probed = assignments.where(
        F.col("centroid").isin([int(j) for j in probe])
    )
    if vec_col in assignments.columns:
        cand = probed.select(id_col, vec_col)
    else:
        match = probed.select("vec_id")
        cand = df.join(
            F.broadcast(match), df[id_col] == match["vec_id"], "left_semi"
        )
    return cosine_topk(cand, query, k, id_col, vec_col)
