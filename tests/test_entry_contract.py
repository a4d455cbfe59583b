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
