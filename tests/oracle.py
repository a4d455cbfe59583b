"""Pure-Python oracle: evaluates IR trees over an in-memory corpus.

Single-process stand-in for "the reference" (the Java plugin delegates
execution to Lucene): documents are term multisets produced by the same
analysis; leaves scan the term dictionary directly. Used by integration
tests to check hit counts for every reference scenario, and by the BM25
rank-identity test (Lucene-style BM25: idf = ln(1 + (N-df+0.5)/(df+0.5)),
tf-norm = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))).
"""

from __future__ import annotations

import math
import re

from elasticsearch_analysis_hashsplitter_spark.config import HashSplitterConfig
from elasticsearch_analysis_hashsplitter_spark.functions.tokenize import (
    term_freqs,
)
from elasticsearch_analysis_hashsplitter_spark.plans import ir
from elasticsearch_analysis_hashsplitter_spark.plans.pattern import (
    glob_to_regex,
)


class OracleIndex:
    def __init__(self, docs: dict[int, str], cfg: HashSplitterConfig):
        self.cfg = cfg
        self.doc_terms: dict[int, dict[str, int]] = {
            d: term_freqs(v, cfg) for d, v in docs.items()
        }
        self.n_docs = len(docs)
        # term -> {doc_id: tf}
        self.postings: dict[str, dict[int, int]] = {}
        for d, tf in self.doc_terms.items():
            for t, n in tf.items():
                self.postings.setdefault(t, {})[d] = n
        self.dl = {d: sum(tf.values()) for d, tf in self.doc_terms.items()}
        self.avgdl = (
            sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0
        )

    # --- doc-set evaluation -------------------------------------------
    def _term_match(self, node: ir.Node):
        """Terms of the dictionary matched by a leaf."""
        if isinstance(node, ir.TermEq):
            return [node.term] if node.term in self.postings else []
        if isinstance(node, ir.TermPrefixLen):
            return [
                t
                for t in self.postings
                if t.startswith(node.prefix)
                and node.min_len <= len(t) <= node.max_len
            ]
        if isinstance(node, ir.TermRangeLen):
            out = []
            for t in self.postings:
                if node.lower is not None:
                    if node.include_lower:
                        if t < node.lower:
                            continue
                    elif t <= node.lower:
                        continue
                if node.upper is not None:
                    if node.include_upper:
                        if t > node.upper:
                            continue
                    elif t >= node.upper:
                        continue
                if not (node.min_len <= len(t) <= node.max_len):
                    continue
                out.append(t)
            return out
        if isinstance(node, ir.TermPattern):
            rx = re.compile(glob_to_regex(node.pattern, self.cfg))
            return [t for t in self.postings if rx.fullmatch(t)]
        raise TypeError(node)

    def docs(self, node: ir.Node) -> set[int]:
        if isinstance(node, ir.MatchNone):
            return set()
        if isinstance(node, ir.MatchAll):
            return set(self.doc_terms)
        if isinstance(node, ir.ScoredTerms):
            sets = [
                set(self.postings.get(t, {})) for t in set(node.terms)
            ]
            if not sets:
                return set()
            return set.intersection(*sets) if node.conjunctive else set.union(*sets)
        if isinstance(node, ir.And):
            out: set[int] | None = None
            for c in node.children:
                s = self.docs(c)
                out = s if out is None else (out & s)
                if not out:
                    return set()
            return out or set()
        if isinstance(node, ir.Or):
            out: set[int] = set()
            for c in node.children:
                out |= self.docs(c)
            return out
        # leaf: union of posting lists of matching terms
        out = set()
        for t in self._term_match(node):
            out.update(self.postings[t])
        return out

    def count(self, node: ir.Node) -> int:
        return len(self.docs(node))

    # --- BM25 ----------------------------------------------------------
    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25_topk(self, terms: list[str], k: int = 10, conjunctive: bool = True):
        """Top-k (doc_id, score) for a bag of exact chunk terms; term
        multiplicity adds weight. Ties: score desc, doc_id asc. Scores are
        accumulated in sorted-term order for determinism (SURVEY §7.4)."""
        cfg = self.cfg
        cand = self.docs(ir.ScoredTerms(tuple(terms), conjunctive))
        weights: dict[str, int] = {}
        for t in terms:
            weights[t] = weights.get(t, 0) + 1
        scores = []
        for d in cand:
            s = 0.0
            dl = self.dl[d]
            for t in sorted(weights):
                tf = self.postings.get(t, {}).get(d, 0)
                if tf == 0:
                    continue
                num = tf * (cfg.bm25_k1 + 1.0)
                den = tf + cfg.bm25_k1 * (
                    1.0 - cfg.bm25_b + cfg.bm25_b * dl / self.avgdl
                )
                s += weights[t] * self.idf(t) * num / den
            scores.append((d, s))
        scores.sort(key=lambda x: (-x[1], x[0]))
        return scores[:k]
