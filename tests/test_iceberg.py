"""Iceberg source/sink: pure-Python metadata layer (sources/iceberg.py
+ sources/avro_codec.py) against the public Iceberg v2 table spec.

Covers the avro container codec in isolation, create/append round
trips through Spark parquet, snapshot time travel, v1-layout
tolerance, the name-mapping property, and the loud scope fences
(delete manifests, non-parquet data files)."""

import json
import os

import pytest

from elasticsearch_analysis_hashsplitter_spark.sources.avro_codec import (
    read_container,
    write_container,
)
from elasticsearch_analysis_hashsplitter_spark.sources import iceberg as ice


def test_avro_container_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "c", "type": {"type": "array", "items": "int"}},
            {"name": "d", "type": {"type": "map", "values": "double"}},
            {"name": "e", "type": "bytes"},
            {"name": "f", "type": "boolean"},
            {
                "name": "g",
                "type": {"type": "fixed", "name": "g16", "size": 4},
            },
            {
                "name": "h",
                "type": {
                    "type": "enum",
                    "name": "kind",
                    "symbols": ["X", "Y"],
                },
            },
        ],
    }
    recs = [
        {
            "a": -(2**60),
            "b": "héllo",
            "c": [1, -2, 3],
            "d": {"k": 1.5},
            "e": b"\x00\xff",
            "f": True,
            "g": b"abcd",
            "h": "Y",
        },
        {
            "a": 7,
            "b": None,
            "c": [],
            "d": {},
            "e": b"",
            "f": False,
            "g": b"zzzz",
            "h": "X",
        },
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_container(p, schema, recs, {"custom": "1"}, codec=codec)
        s2, r2, meta = read_container(p)
        assert s2 == schema
        assert r2 == recs
        assert meta["custom"] == b"1"


def test_avro_negative_block_count(tmp_path):
    """Spec: array/map blocks may use a negative count followed by a
    byte size — writers like Java Iceberg emit this form."""
    from elasticsearch_analysis_hashsplitter_spark.sources.avro_codec import (
        _decode,
        _write_long,
    )
    import io

    inner = bytearray()
    _write_long(inner, 5)
    _write_long(inner, 6)
    body = bytearray()
    _write_long(body, -2)  # 2 items, size-prefixed block
    _write_long(body, len(inner))
    body.extend(inner)
    _write_long(body, 0)
    got = _decode(
        {"type": "array", "items": "long"}, io.BytesIO(bytes(body)), {}
    )
    assert got == [5, 6]


def _sample_df(spark):
    rows = [
        (f"org{i % 3}/r{i}", f"src/f{i}.py", f"c{i:07x}", "py",
         f"def f{i}(): return {i}")
        for i in range(50)
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_iceberg_create_append_timetravel(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = _sample_df(spark)
    s1 = ice.write_table(df, tbl, mode="create")
    got1 = ice.read_table(spark, tbl)
    assert got1.schema == df.schema
    assert sorted(r.path for r in got1.collect()) == sorted(
        r.path for r in df.collect()
    )

    extra = spark.createDataFrame(
        [("o/x", "src/new.py", "c999", "py", "pass")], df.schema
    )
    s2 = ice.write_table(extra, tbl, mode="append")
    assert s2 == s1 + 1
    assert ice.read_table(spark, tbl).count() == 51
    # time travel: the first snapshot still reads its own 50 rows
    assert ice.read_table(spark, tbl, snapshot_id=s1).count() == 50
    # metadata spec shape
    meta = ice.load_metadata(tbl)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == s2
    assert len(meta["snapshots"]) == 2
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert [e["names"][0] for e in nm] == [f.name for f in df.schema.fields]
    # create over an existing table refuses
    with pytest.raises(FileExistsError):
        ice.write_table(df, tbl, mode="create")


def test_iceberg_append_schema_mismatch(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    ice.write_table(_sample_df(spark), tbl, mode="create")
    other = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="schema"):
        ice.write_table(other, tbl, mode="append")


def test_iceberg_nested_types_roundtrip(spark, tmp_path):
    tbl = str(tmp_path / "nested")
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], {"a": 1}, (7, "x"))],
        "id long, emb array<double>, m map<string,long>, "
        "s struct<u: long, v: string>",
    )
    ice.write_table(df, tbl, mode="create")
    got = ice.read_table(spark, tbl)
    assert got.schema == df.schema
    r = got.collect()[0]
    assert r.emb == [1.0, 2.0] and r.m == {"a": 1} and r.s.u == 7
    # field ids are unique and dense enough: last-column-id covers max
    meta = ice.load_metadata(tbl)
    sj = meta["schemas"][0]
    assert meta["last-column-id"] >= ice._max_field_id(sj)


def test_iceberg_v1_layout_reads(spark, tmp_path):
    """A v1 table (single `schema` key, snapshot with embedded
    `manifests`, v1 manifest-file field names) must read: the reader
    follows the writer schema in each avro file and tolerates renames."""
    tbl = str(tmp_path / "v1tbl")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    data_dir = os.path.join(tbl, "data")
    df.repartition(1).write.parquet(data_dir)
    files = [
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    meta_dir = os.path.join(tbl, "metadata")
    os.makedirs(meta_dir)
    v1_entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                    ],
                },
            },
        ],
    }
    man = os.path.join(meta_dir, "m0.avro")
    write_container(
        man,
        v1_entry_schema,
        [
            {
                "status": 1,
                "data_file": {
                    "file_path": "file://" + p,
                    "file_format": "parquet",
                    "record_count": 2,
                },
            }
            for p in files
        ],
        metadata={"content": "data"},
    )
    meta = {
        "format-version": 1,
        "table-uuid": "0" * 32,
        "location": tbl,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schema": {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "s", "required": False, "type": "string"},
            ],
        },
        "partition-spec": [],
        "current-snapshot-id": 10,
        "snapshots": [
            {"snapshot-id": 10, "timestamp-ms": 0, "manifests": [man]}
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    got = ice.read_table(spark, tbl)
    assert sorted((r.id, r.s) for r in got.collect()) == [(1, "a"), (2, "b")]


def test_iceberg_empty_table_and_missing_snapshot(spark, tmp_path):
    tbl = str(tmp_path / "empty")
    df = _sample_df(spark).limit(0)
    ice.write_table(df, tbl, mode="create")
    got = ice.read_table(spark, tbl)
    assert got.count() == 0 and got.schema == df.schema
    with pytest.raises(ValueError, match="snapshot"):
        ice.read_table(spark, tbl, snapshot_id=424242)


def test_iceberg_delete_manifest_refused(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    ice.write_table(_sample_df(spark), tbl, mode="create")
    meta = ice.load_metadata(tbl)
    snap = meta["snapshots"][-1]
    _, mans, _ = read_container(snap["manifest-list"])
    mans[0]["content"] = 1  # pretend it's a delete manifest
    write_container(
        snap["manifest-list"],
        ice._MANIFEST_FILE_SCHEMA,
        mans,
        metadata={"format-version": "2"},
    )
    with pytest.raises(NotImplementedError, match="delete"):
        ice.read_table(spark, tbl)


def test_metadata_fallback_sorts_vN_numerically(tmp_path):
    """A vN-named table whose version-hint.text was lost must resolve
    v12, not v9 — lexicographic sort serves a stale snapshot once N
    reaches 10."""
    meta_dir = tmp_path / "tbl" / "metadata"
    meta_dir.mkdir(parents=True)
    for n in range(1, 13):
        (meta_dir / f"v{n}.metadata.json").write_text("{}")
    p = ice.current_metadata_path(str(tmp_path / "tbl"))
    assert p.endswith("v12.metadata.json")
    # zero-padded REST-style names still sort as strings
    for f in meta_dir.iterdir():
        f.unlink()
    for n in (1, 2, 10):
        (meta_dir / f"{n:05d}-abc.metadata.json").write_text("{}")
    p = ice.current_metadata_path(str(tmp_path / "tbl"))
    assert p.endswith("00010-abc.metadata.json")
