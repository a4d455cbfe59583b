"""Engine <-> DuckDB-oracle parity on a whitespace-messy corpus: the
oracle chunks CTE tokenizes on \\s+ runs (advisor r2 fix), so fixtures
with tabs / newlines / multiple spaces must agree with the engine —
previously the single-space string_split oracle would silently diverge."""

import duckdb
import pytest

from elasticsearch_analysis_hashsplitter_spark.config import HashSplitterConfig
from elasticsearch_analysis_hashsplitter_spark.operators.search import (
    SearchEngine,
)
from elasticsearch_analysis_hashsplitter_spark.plans import compile as qc
from elasticsearch_analysis_hashsplitter_spark.plans import sql_oracle

CFG = HashSplitterConfig(
    chunk_length=4, token_mode="tokens", apply_input_cap=False
)

DOCS = [
    (0, "spark\tjoin\nwindow  merge"),
    (1, "  spark   spark\t\tfilter scan  "),
    (2, "join\n\nwindow\tbatch"),
    (3, "merge sort\r\nscan filter spark join"),
    (4, "lonely"),
    (5, "tabs\tand\tmore\ttabs\tspark"),
    (6, ""),
    (7, " \t \n "),
]


@pytest.fixture(scope="module")
def setup(spark):
    eng = SearchEngine.from_corpus(
        spark.createDataFrame(DOCS, "doc_id long, text string"),
        CFG,
        text_col="text",
        num_partitions=4,
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    return eng, con


def _oracle_docs(con, node):
    cte = sql_oracle.chunks_cte_tokens(CFG)
    sel = sql_oracle.docs_select(node, CFG)
    q = f"WITH {cte} SELECT doc_id FROM ({sel}) q ORDER BY doc_id"
    return [r[0] for r in con.execute(q).fetchall()]


@pytest.mark.parametrize(
    "kind,arg",
    [
        ("term", "spark"),
        ("term", "tabs"),
        ("prefix", "win"),
        ("prefix", "sp"),
        ("wildcard", "s?ar*"),
        ("wildcard", "*ge"),
        ("term", "absent"),
    ],
)
def test_messy_whitespace_docsets_match_duckdb(setup, kind, arg):
    eng, con = setup
    if kind == "term":
        node = qc.field_query(arg, CFG)
        got = sorted(r.doc_id for r in eng.term(arg).collect())
    elif kind == "prefix":
        node = qc.prefix_query(arg, CFG)
        got = sorted(r.doc_id for r in eng.prefix(arg).collect())
    else:
        node = qc.wildcard_query(arg, CFG)
        got = sorted(r.doc_id for r in eng.wildcard(arg).collect())
    assert got == _oracle_docs(con, node), (kind, arg)


def test_messy_whitespace_dl_matches_duckdb(setup):
    """BM25 length normalization inputs: engine dl per doc == the oracle
    CTE's chunk count per doc."""
    eng, con = setup
    got = {
        r.doc_id: r.dl for r in eng.docstats.select("doc_id", "dl").collect()
    }
    cte = sql_oracle.chunks_cte_tokens(CFG)
    exp = dict(
        con.execute(
            f"WITH {cte} SELECT doc_id, count(*) FROM chunks GROUP BY doc_id"
        ).fetchall()
    )
    for i, _ in DOCS:
        assert got.get(i, 0) == exp.get(i, 0), i
