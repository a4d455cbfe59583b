"""ES index/update parity (``upsert_docs``): update = delete + reindex.
Pins replacement visibility, insert-only cheap path (no merge), purge on
collision, tombstone revival, duplicate-batch refusal, and the core
identity — an upserted index scores exactly like a fresh build over the
updated corpus."""

import pytest

from elasticsearch_analysis_hashsplitter_spark.config import HashSplitterConfig
from elasticsearch_analysis_hashsplitter_spark.operators.build import build_index
from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
)
from elasticsearch_analysis_hashsplitter_spark.sources import catalog
from elasticsearch_analysis_hashsplitter_spark.streaming.incremental import (
    upsert_docs,
)

CFG = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)

DOCS = [
    (
        i,
        " ".join(
            ["join"] * (1 + i % 3)
            + (["merg"] * (1 + i % 2) if i % 3 != 2 else [])
            + (["scan"] if i % 8 == 0 else [])
            + [f"fil{j}" for j in range(i % 5)]
        ),
    )
    for i in range(24)
]


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, content string")


def _build(spark, path, docs=DOCS):
    build_index(_df(spark, docs), CFG, path, id_col="doc_id",
                text_col="content")
    return path


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def _tie_groups(ranked):
    """[(doc, score)...] -> [frozenset(docs)...] grouped by
    1e-9-rounded score, in rank order."""
    groups, last = [], None
    for doc, score in ranked:
        key = round(score, 9)
        if key != last:
            groups.append(set())
            last = key
        groups[-1].add(doc)
    return [frozenset(g) for g in groups]


def test_upsert_replaces_and_inserts(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "idx"))
    res = upsert_docs(
        spark, idx,
        _df(spark, [(3, "zzzz aaaa"), (100, "scan scan")]),
        CFG,
    )
    assert res["upserted"] == 2 and res["replaced"] == 1
    eng = SearchEngine.open(spark, idx)
    assert _ids(eng.term("zzzz")) == [3]
    assert 3 not in _ids(eng.term("join"))  # old content really gone
    assert 100 in _ids(eng.term("scan"))
    assert catalog.read_deletes(idx).size == 0  # purge cleared tombstones
    assert eng.stats["n_docs"] == 25


def test_upserted_index_scores_like_fresh_build(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "idx"))
    updates = [(i, "join merg upda") for i in (2, 7, 11)] + [
        (200, "join merg scan"),
        (201, "join"),
    ]
    upsert_docs(spark, idx, _df(spark, updates), CFG)
    eng = SearchEngine.open(spark, idx)

    upd = dict(updates)
    fresh_docs = [(i, upd.get(i, t)) for i, t in DOCS] + [
        (i, t) for i, t in updates if i >= 200
    ]
    fresh = SearchEngine.from_corpus(
        _df(spark, fresh_docs), CFG, num_partitions=2
    )
    assert eng.stats["n_docs"] == fresh.stats["n_docs"]
    assert eng.stats["avgdl"] == pytest.approx(fresh.stats["avgdl"], abs=1e-12)
    for q in ("join merg", "join merg upda", "scan"):
        got = [(r["doc_id"], r["score"]) for r in eng.search(q, k=30).collect()]
        want = [
            (r["doc_id"], r["score"]) for r in fresh.search(q, k=30).collect()
        ]
        # rank identity up to exact-score ties: the two indexes have
        # different physical layouts, so float-sum order can move an
        # exactly-tied group by 1 ULP and permute it — group by
        # 1e-9-rounded score and compare group membership + scores.
        assert _tie_groups(got) == _tie_groups(want)
        by_doc = dict(want)
        for gd, gs in got:
            assert gs == pytest.approx(by_doc[gd], abs=1e-9)


def test_pure_insert_skips_the_merge(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "idx"))
    before = set(catalog.list_postings_slices(idx))
    res = upsert_docs(
        spark, idx, _df(spark, [(300, "join pure"), (301, "merg pure")]), CFG
    )
    assert res["replaced"] == 0
    after = set(catalog.list_postings_slices(idx))
    assert after == before | {"upsert_0"}  # no compaction rewrite
    assert 300 in _ids(SearchEngine.open(spark, idx).term("join pure"))


def test_collision_compacts_then_appends(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "idx"))
    upsert_docs(spark, idx, _df(spark, [(0, "join newz")]), CFG)
    assert set(catalog.list_postings_slices(idx)) == {
        "compacted", "upsert_0",
    }
    eng = SearchEngine.open(spark, idx)
    assert _ids(eng.term("newz")) == [0]
    assert eng.stats["n_docs"] == len(DOCS)


def test_duplicate_batch_ids_refused(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="duplicate doc_id=5"):
        upsert_docs(
            spark, idx, _df(spark, [(5, "aaaa"), (5, "bbbb")]), CFG
        )


def test_upsert_revives_a_tombstoned_id(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "idx"))
    eng = SearchEngine.open(spark, idx)
    eng.delete_docs([5])
    assert 5 not in _ids(eng.term("join"))
    # delete-then-upsert: the purge clears the tombstone, the new
    # segment re-ingests the id — visible again with the NEW content
    upsert_docs(spark, idx, _df(spark, [(5, "back agan")]), CFG)
    eng2 = SearchEngine.open(spark, idx)
    assert _ids(eng2.term("back agan")) == [5]
    assert eng2.deleted_count == 0


def test_second_upsert_gets_fresh_slice_name(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "idx"))
    upsert_docs(spark, idx, _df(spark, [(400, "aaaa")]), CFG)
    upsert_docs(spark, idx, _df(spark, [(401, "bbbb")]), CFG)
    slices = set(catalog.list_postings_slices(idx))
    assert {"upsert_0", "upsert_1"} <= slices
    eng = SearchEngine.open(spark, idx)
    assert _ids(eng.term("aaaa")) == [400]
    assert _ids(eng.term("bbbb")) == [401]
