"""Driver-contract shape checks for __spark_entry__ (cheap, no Spark):
every oracle has a matching query, names are stable, SQL strings are
non-empty and DuckDB-parseable against empty views."""

import duckdb
import pytest

import __spark_entry__ as entry


def test_oracles_subset_of_queries():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert set(os_) <= set(qs)
    # r2: every gate query has a full DuckDB oracle — no rows-only checks
    assert set(qs) == set(os_)


def test_oracle_sql_parses_in_duckdb():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars INT)"
    )
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[],"
        " label INT)"
    )
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(sql).fetchall()
        except Exception as e:  # pragma: no cover
            pytest.fail(f"oracle {name} failed on empty tables: {e}")


def test_bm25_terms_compiled():
    assert entry._bm25_terms == ("Aspar", "Bk", "Ajoin")


def test_bench_headline_line_bounded():
    """The driver captures only the last ~2000 bytes of bench stdout;
    the final JSON line must parse from inside that window even as the
    gate list grows (r3/r4 recorded unparseable fragments)."""
    import json

    import bench

    result = {
        "metric": "index build + BM25/partial-token query suite",
        "unit": "sec",
        "sf": "0.1",
        "cpus": 32,
        "value": 123.456,
        "build": {"rows": 100000, "seconds": 24.5, "files_per_sec": 4083.9,
                  "total_terms": 1, "n_docs": 1},
        "qps": {"sequential_qps": 0.62, "batched_qps": 18.56, "x": 1},
        "qps_warm": {k: 1.0 for k in (
            "batched_qps", "sharded_batched_qps", "concurrent_qps",
            "session_qps", "latency_p50_seconds", "hot_repeat_qps",
            "latency_p95_seconds", "hot_repeat_cache_hits")},
        "qps_selective": {"rank_identical": True, "speedup": 1.05,
                          "speedup_forced": 1.37, "rows": 200000},
        "compaction": {"rows": 25000},
        "cache_policy": {"n_terms": 2000000},
        # far more gates than exist today: the fallback ladder must hold
        "queries": {f"some_longish_gate_name_{i:03d}": 3.123
                    for i in range(60)},
        "queries_seconds": 101.746,
        "scaling": {
            "query_seconds_small": 39.909, "query_seconds_large": 12.494,
            "query_batch_queries": 64, "query_speedup": 3.194,
            "query_scaling_efficiency": 0.799,
            "mode": "local-cluster[N,1,6144] separate executor JVMs",
            "executors_small": 1, "executors_large": 4, "rows": 200000,
            "seconds_small": 202.545, "seconds_large": 54.24,
            "files_per_sec_small": 987.4, "files_per_sec_large": 3687.3,
            "speedup": 3.734, "executor_ratio": 4.0,
            "scaling_efficiency": 0.934,
        },
    }
    line = bench._headline_line(result)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["value"] == 123.456
    # pathological 60-long-name case: the last-resort rung may trim the
    # per-query map, but what survives must be a faithful subset
    assert 0 < len(parsed["queries"]) <= 60
    assert all(
        k in result["queries"] and abs(v - 3.123) < 0.1
        for k, v in parsed["queries"].items()
    )
    # today's actual shape keeps the full scaling dict + per-section picks
    result["queries"] = {f"gate_{i:02d}": 3.123 for i in range(42)}
    parsed = json.loads(bench._headline_line(result))
    assert parsed["scaling"]["files_per_sec_large"] == 3687.3
    assert parsed["qps_warm"]["session_qps"] == 1.0
    assert parsed["qps_selective"]["rank_identical"] is True
