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
    # materialize the band buckets ONCE: the candidate self-join (and
    # the optional hot-bucket filter) would otherwise re-run the
    # signature pandas UDF per reference (the two join exchanges carry
    # different aliases, so ReuseExchange cannot collapse them).
    # (band, key, vec_id) rows are tiny — bands x one row per vector.
    buckets = rp_lsh_buckets(
        df, dim, n_bits, bands, seed, id_col, vec_col
    ).localCheckpoint(eager=False)
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


#: Cap on the key-sub-bucket fan-out inside each band partition of an
#: :func:`rp_lsh_index` table (64 = a 64x partition-pruning bound per
#: probe at full fan-out).
_KEY_BUCKETS = 64


def _pick_nkb(n: int, rows_per_bucket: int) -> int:
    """Key-bucket fan-out for an n-vector index: smallest power of two
    with <= rows_per_bucket vectors per (band, kb) partition, capped at
    ``_KEY_BUCKETS``. Power of two so bucket populations stay balanced
    for power-of-two key spaces under the mod map."""
    nkb = 1
    while nkb < _KEY_BUCKETS and nkb * rows_per_bucket < n:
        nkb *= 2
    return nkb


def _index_nkb(buckets: DataFrame) -> int:
    """Recover the key-bucket fan-out an :func:`rp_lsh_index` table was
    WRITTEN with, from its ``nkb=`` partition directory — driver-side
    path parse of the already-listed file index, no Spark job. Keeping
    nkb in the path (not a caller knob) means the query side can never
    drift from the writer: a mismatched modulus would silently drop
    candidates, not crash."""
    import re

    for f in buckets.inputFiles():
        m = re.search(r"/nkb=(\d+)/", f)
        if m:
            return int(m.group(1))
    # fallback (files relocated without the marker dir): one bounded
    # job over the constant partition column
    return int(buckets.select(F.max("nkb")).first()[0])


def rp_lsh_index(
    df: DataFrame,
    dim: int,
    path: str,
    n_bits: int = 32,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_bucket: int = 8192,
) -> DataFrame:
    """Serving-path ANN index: one row per (vector, band) carrying the
    VECTOR ITSELF, persisted partitioned by ``(nkb, band, kb)`` where
    ``kb = key mod nkb`` — and key-sorted inside every partition. Same
    lesson the 1M IVF probe taught (see :func:`ivf_index`): an id-only
    index leaves the dominant scan unpruned — the candidate fetch
    semi-join still reads the whole corpus. Storing the vector in every
    band row costs ``bands``x vector storage; that duplication IS the
    speed tier (the posting-list analogue: the index is the serving
    structure).

    Why the ``kb`` sub-partition: a query probes ONE key in EVERY band,
    so partitioning by band alone prunes nothing — the r5 1M probe
    measured that layout at 5.5 s/query, 3x SLOWER than exact brute
    force. With nkb key sub-buckets per band the query's partition
    filter ``(band=i AND kb=key_i mod nkb)`` touches ~1/nkb of the
    index, and the key sort lets parquet row-group min/max skip most of
    what remains.

    The fan-out is sized to the corpus: ``nkb = next_pow2(n_vectors /
    rows_per_bucket)`` capped at 64 — a 1M-vector index gets the full
    64x prune, a 10k-vector one doesn't pay a 1,024-tiny-file write
    (measured 25 s for 9k rows at fixed 64) for pruning it doesn't
    need. nkb is recorded as the leading partition directory
    (``nkb=…/band=…/kb=…``) so the reader recovers it from the path —
    writer and reader cannot disagree on the modulus. Returns the
    reloaded bucket table; pass it to :func:`rp_lsh_topk` via
    ``buckets=``."""
    nkb = _pick_nkb(df.count(), rows_per_bucket)
    b = (
        rp_lsh_buckets(
            df, dim, n_bits, bands, seed, id_col, vec_col, keep_vec=True
        )
        .withColumn("nkb", F.lit(nkb))
        .withColumn("kb", F.pmod(F.col("key"), F.lit(nkb)))
    )
    (
        b.repartition("band", "kb")
        .sortWithinPartitions("band", "kb", "key")
        .write.mode("overwrite")
        .partitionBy("nkb", "band", "kb")
        .parquet(path)
    )
    # record the hyperplane knobs beside the data: a query computing
    # band keys with different n_bits/bands/seed/dim hashes into
    # DIFFERENT buckets and recall silently collapses to ~0 — the same
    # writer/reader-drift class the nkb path marker closes for the
    # modulus. Underscore-prefixed, so Spark's parquet listing skips it.
    _write_rp_lsh_meta(
        path,
        {"n_bits": n_bits, "bands": bands, "seed": seed, "dim": dim,
         "nkb": nkb},
    )
    return df.sparkSession.read.parquet(path)


def _write_rp_lsh_meta(path: str, meta: dict) -> None:
    import json
    import os

    p = path[len("file:"):] if path.startswith("file:") else path
    try:
        with open(os.path.join(p, "_rp_lsh_meta.json"), "w") as fh:
            json.dump(meta, fh)
    except OSError:
        pass  # non-local filesystem: validation degrades gracefully


def _index_meta(buckets: DataFrame) -> dict | None:
    """Recover the knob record an :func:`rp_lsh_index` table was written
    with (driver-side path probe off the already-listed file index; no
    Spark job). None for ad-hoc bucket frames, relocated tables that
    lost the marker, or non-local filesystems."""
    import json
    import os
    import re

    for f in buckets.inputFiles():
        p = f[len("file:"):] if f.startswith("file:") else f
        root = re.split(r"/nkb=\d+/", p)[0]
        mp = os.path.join(root, "_rp_lsh_meta.json")
        try:
            with open(mp) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None
    return None


def _check_rp_lsh_knobs(
    buckets: DataFrame, n_bits: int, bands: int, seed: int, dim: int
) -> None:
    """Refuse a serving-index query whose key derivation disagrees with
    the writer's: mismatched hyperplanes match essentially nothing and
    the caller would see silent ~0 recall instead of an error."""
    meta = _index_meta(buckets)
    if meta is None:
        return
    got = {"n_bits": n_bits, "bands": bands, "seed": seed, "dim": dim}
    bad = {
        k: (meta[k], got[k])
        for k in ("n_bits", "bands", "seed", "dim")
        if k in meta and meta[k] != got[k]
    }
    if bad:
        raise ValueError(
            "rp_lsh query knobs disagree with the index's recorded "
            f"values (index, query): {bad} — pass the knobs the index "
            "was built with"
        )


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
    else:
        _check_rp_lsh_knobs(buckets, n_bits, bands, seed, dim)
    has_kb = "kb" in buckets.columns
    nkb = _index_nkb(buckets) if has_kb else 1
    cond = None
    for i, pkeys in enumerate(probe_keys):
        ks = [int(x) for x in pkeys]
        c = (F.col("band") == i) & (
            F.col("key").isin(ks) if len(ks) > 1 else (F.col("key") == ks[0])
        )
        if has_kb:
            # reconstructed partition value (kb = key mod nkb, read off
            # the index's own path marker) — this is what makes the
            # partition filter prunable: band alone matches EVERY
            # partition
            kbs = sorted({k % nkb for k in ks})
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


def rp_lsh_topk_batch(
    df: DataFrame,
    queries: dict,
    k: int = 10,
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets: DataFrame | None = None,
    n_probes: int = 1,
) -> DataFrame:
    """Batch ANN: top-k for MANY query vectors in ONE Spark job
    -> (query_id, vec_id, cos), ordered (query_id, rank).

    Why a batch tier exists at all: the 1M probe measured the pruned
    single-query scan so small that per-query driver costs (fresh plan
    + codegen + scheduling, ~0.3-0.9 s) dominate and swing run to run —
    the same job-floor reading as IVF and the text path. Amortization
    is structural, not a knob: all |queries| x bands x n_probes probes
    become ONE scan.

    Shape: the probe set is driver-side literals, so the scan keeps a
    coarse prunable filter (per band: ``key IN (all probed keys)``,
    ``kb IN (their buckets)``) exactly like the single-query path; a
    tiny broadcast (query_id, band, key) table then tags which query
    each surviving row serves, a broadcast (query_id, qvec) join
    attaches the query vector, and one hash-partitioned window takes
    per-query top-k. One scan, one broadcast pair, one shuffle on
    query_id — independent of |queries|.

    ``queries``: {query_id: vector}; ids may be ints or strings.
    Semantics per query are IDENTICAL to :func:`rp_lsh_topk` with the
    same knobs (pinned in tests)."""
    from pyspark.sql import Window

    if not queries:
        raise ValueError("queries must be a non-empty {id: vector} dict")
    spark = df.sparkSession
    dim = len(next(iter(queries.values())))
    if buckets is None:
        buckets = rp_lsh_buckets(df, dim, n_bits, bands, seed, id_col, vec_col)
    else:
        _check_rp_lsh_knobs(buckets, n_bits, bands, seed, dim)
    has_kb = "kb" in buckets.columns
    nkb = _index_nkb(buckets) if has_kb else 1

    id_type = "string" if isinstance(next(iter(queries)), str) else "long"
    probe_rows = []
    keys_by_band: dict[int, set] = {}
    for qid, qv in queries.items():
        for b, pkeys in enumerate(
            query_probe_keys([float(x) for x in qv], n_bits, bands, seed,
                             n_probes)
        ):
            keys_by_band.setdefault(b, set()).update(int(x) for x in pkeys)
            probe_rows.extend((qid, b, int(x)) for x in pkeys)

    cond = None
    for b, ks in sorted(keys_by_band.items()):
        kl = sorted(ks)
        c = (F.col("band") == b) & (
            F.col("key").isin(kl) if len(kl) > 1 else (F.col("key") == kl[0])
        )
        if has_kb:
            kbs = sorted({x % nkb for x in kl})
            c = c & (
                F.col("kb").isin(kbs)
                if len(kbs) > 1
                else (F.col("kb") == kbs[0])
            )
        cond = c if cond is None else (cond | c)

    probes = spark.createDataFrame(
        probe_rows, f"query_id {id_type}, band int, key int"
    )
    # query norm precomputed driver-side with the SAME numpy reduction
    # cosine_col uses, so batch scores are bitwise-identical to the
    # single-query path (a Spark-side sum would reduce in a different
    # order and drift in the last ulp)
    qdf = spark.createDataFrame(
        [
            (
                qid,
                [float(x) for x in qv],
                float(np.sqrt(np.dot(qv, qv))) or 1.0,
            )
            for qid, qv in queries.items()
        ],
        f"query_id {id_type}, qvec array<double>, qnorm double",
    )
    hits = buckets.where(cond).join(F.broadcast(probes), ["band", "key"])
    if vec_col in buckets.columns:
        cand = hits.select(
            "query_id", F.col("vec_id").alias(id_col), vec_col
        ).dropDuplicates(["query_id", id_col])
    else:
        match = hits.select("query_id", "vec_id").distinct()
        cand = df.join(
            F.broadcast(match), df[id_col] == match["vec_id"], "inner"
        ).select("query_id", df[id_col], df[vec_col])
    scored = cand.join(F.broadcast(qdf), "query_id").select(
        "query_id",
        F.col(id_col),
        F.round(
            F.aggregate(
                F.zip_with(F.col(vec_col), F.col("qvec"), lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / (_norm_col(F.col(vec_col)) * F.col("qnorm")),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
        .orderBy("query_id", F.col("cos").desc(), F.col(id_col).asc())
    )


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


def ivf_topk_batch(
    df: DataFrame,
    queries: dict,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
) -> DataFrame:
    """Batch IVF ANN: top-k for MANY query vectors in ONE job
    -> (query_id, vec_id, cos), ordered (query_id, rank) — the IVF twin
    of :func:`rp_lsh_topk_batch`, built for the same reason: the 1M
    probe measured the pruned per-query scan dominated by per-query
    driver fixed costs (~0.3-0.9 s plan + codegen + scheduling), so
    sequential serving pays the floor |queries| times.

    Shape: every query's nprobe probe set is computed driver-side
    against the broadcast quantizer; the scan keeps the partition-
    prunable ``centroid IN (union of all probe sets)`` literal filter,
    a tiny broadcast (query_id, centroid) table tags which queries each
    surviving partition serves, a broadcast (query_id, qvec, qnorm)
    join attaches the query vector (qnorm precomputed driver-side so
    scores are bitwise-identical to :func:`ivf_topk`), and one window
    takes per-query top-k. One pruned scan, one shuffle on query_id —
    independent of |queries|."""
    from pyspark.sql import Window

    if not queries:
        raise ValueError("queries must be a non-empty {id: vector} dict")
    spark = df.sparkSession
    c = np.asarray(centroids, dtype=np.float64)
    if assignments is None:
        assignments = ivf_assign(df, c, id_col, vec_col)

    id_type = "string" if isinstance(next(iter(queries)), str) else "long"
    probe_rows = []
    all_probed: set[int] = set()
    for qid, qv in queries.items():
        qn = np.asarray(qv, dtype=np.float64)
        qn = qn / max(np.linalg.norm(qn), 1e-12)
        probe = np.argsort(-(c @ qn))[: min(nprobe, len(c))]
        all_probed.update(int(j) for j in probe)
        probe_rows.extend((qid, int(j)) for j in probe)

    probes = spark.createDataFrame(
        probe_rows, f"query_id {id_type}, centroid int"
    )
    qdf = spark.createDataFrame(
        [
            (
                qid,
                [float(x) for x in qv],
                float(np.sqrt(np.dot(qv, qv))) or 1.0,
            )
            for qid, qv in queries.items()
        ],
        f"query_id {id_type}, qvec array<double>, qnorm double",
    )
    probed = assignments.where(
        F.col("centroid").isin(sorted(all_probed))
    ).join(F.broadcast(probes), ["centroid"])
    if vec_col in assignments.columns:
        cand = probed.select("query_id", F.col(id_col), F.col(vec_col))
    else:
        match = probed.select("query_id", "vec_id").distinct()
        cand = df.join(
            F.broadcast(match), df[id_col] == match["vec_id"], "inner"
        ).select("query_id", df[id_col], df[vec_col])
    scored = cand.join(F.broadcast(qdf), "query_id").select(
        "query_id",
        F.col(id_col),
        F.round(
            F.aggregate(
                F.zip_with(F.col(vec_col), F.col("qvec"), lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / (_norm_col(F.col(vec_col)) * F.col("qnorm")),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
        .orderBy("query_id", F.col("cos").desc(), F.col(id_col).asc())
    )
