"""PySpark-native fulltext engine with HashSplitter positioned-chunk
tokenization: partitioned inverted-index build + BM25 top-k search with
exact / prefix / range / wildcard partial-token queries.

From-scratch reimplementation of the *capabilities* of
yakaz/elasticsearch-analysis-hashsplitter (reference at /root/reference,
an ElasticSearch 0.19 / Lucene 3.5 analysis plugin) re-expressed
Spark-first: DataFrame/Catalyst plans, Arrow-vectorized pandas UDFs, and
driver-side pure-Python query compilation (SURVEY.md §1.3, §7).
"""

from .config import (
    BASIC,
    CHUNKLENGTH2,
    CL4_LOWER,
    CL4_LOWER_FIXED16,
    CL4_LOWER_SQL,
    CODE_CORPUS,
    DEFAULT_PREFIXES,
    HashSplitterConfig,
)

__all__ = [
    "BASIC",
    "CHUNKLENGTH2",
    "CL4_LOWER",
    "CL4_LOWER_FIXED16",
    "CL4_LOWER_SQL",
    "CODE_CORPUS",
    "DEFAULT_PREFIXES",
    "HashSplitterConfig",
]

__version__ = "0.4.0"
