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
    # Unicode whitespace (r2 advisor): NBSP / ideographic space / LS / NEL
    # / \x1c-\x1f separators / vertical tab — engine tokenizer (Arrow
    # utf8_split_whitespace) splits ALL of these; the oracle and every
    # JVM-side split must agree (WS_RUN_REGEX), or parity silently breaks.
    (8, "spark\u00a0join\u3000window\u2028merge\u0085scan"),
    (9, "spark\x1cfilter\x1dscan\x1ejoin\x1fbatch"),
    (10, "sort\x0bspark\x0cmerge\u205fscan"),
    (11, "\u00a0\u3000spark\u3000 "),
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


def test_tokens_col_matches_arrow_tokenizer(setup, spark):
    """text.py's JVM-side tokens_col (WS_RUN_REGEX split — feeds dedup /
    simhash / text metrics) must token-for-token match the Arrow index
    tokenizer's whitespace semantics (= Python str.split())."""
    from elasticsearch_analysis_hashsplitter_spark.operators.text import (
        tokens_col,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select("doc_id", tokens_col("text").alias("toks")).collect()
    }
    for i, text in DOCS:
        assert got[i] == text.split(), (i, got[i], text.split())


def test_dl_expr_matches_tokenizer_dl(setup, spark):
    """build.dl_expr (pure-Catalyst dl) must equal the Arrow tokenizer's
    dl on Unicode-whitespace corpora — the engine-internal consistency
    the old (?U)\\s split broke on \\x1c-\\x1f."""
    from elasticsearch_analysis_hashsplitter_spark.operators.build import (
        dl_expr,
        tokenize_corpus,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    via_expr = {
        r["doc_id"]: r["dl"]
        for r in df.select(
            "doc_id", dl_expr(CFG, "text").alias("dl")
        ).collect()
    }
    via_tok = {
        r["doc_id"]: r["dl"]
        for r in tokenize_corpus(df, CFG, text_col="text")
        .select("doc_id", "dl")
        .collect()
    }
    assert via_expr == via_tok


def test_jvm_regex_set_equals_arrow_set_exhaustively(setup, spark):
    """JVM_WS_RUN_REGEX ((?U)[\\s\\x1C-\\x1F]) and WS_RUN_REGEX (the RE2
    class) must both split on EXACTLY WHITESPACE_CODEPOINTS — checked
    codepoint-by-codepoint through Spark's actual Java regex engine and
    DuckDB's actual RE2, against near-miss non-members (ZWSP, BOM,
    Mongolian vowel separator, \\x0E, \\x7F)."""
    import duckdb

    from elasticsearch_analysis_hashsplitter_spark.functions.tokenize import (
        JVM_WS_RUN_REGEX,
        WHITESPACE_CODEPOINTS,
        WS_RUN_REGEX,
    )
    from pyspark.sql import functions as F

    non_members = [0x0E, 0x21, 0x7F, 0x180E, 0x200B, 0x2060, 0xFEFF]
    cands = sorted(set(WHITESPACE_CODEPOINTS) | set(non_members))
    df = spark.createDataFrame(
        [(cp, f"a{chr(cp)}b") for cp in cands], "cp int, s string"
    )
    got = {
        r["cp"]: r["n"]
        for r in df.select(
            "cp",
            F.size(
                F.filter(F.split("s", JVM_WS_RUN_REGEX), lambda t: t != "")
            ).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    for cp in cands:
        want = 2 if cp in WHITESPACE_CODEPOINTS else 1
        assert got[cp] == want, (hex(cp), "jvm")
        n_re2 = con.execute(
            "SELECT len(list_filter(regexp_split_to_array(?, ?), "
            "x -> x <> ''))",
            [f"a{chr(cp)}b", WS_RUN_REGEX],
        ).fetchone()[0]
        assert n_re2 == want, (hex(cp), "re2")
