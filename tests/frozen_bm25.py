"""FROZEN pure-Python exact BM25 oracle (SURVEY.md §5 item iii).

This is the reference scorer the engine must be rank-identical to
(BASELINE.json north_rule: "matching the reference's top-k docIDs and BM25
scores (rank-identical) on the reference query set"). It is deliberately
naive: dict-of-lists index, per-doc float64 accumulation in sorted-term
order, no compression, no pruning. Do not optimize; do not import engine
index/query code here (analysis + extract are the shared frozen contract).
"""

from __future__ import annotations

import math
from collections import Counter

from share_spark.analysis import tokenize
from share_spark.extract import extract_text
from share_spark.query.bm25 import parse_query


class FrozenIndex:
    def __init__(self, docs: dict[int, str], analyzer: str = "standard"):
        """docs: doc_id -> raw text (already extracted)."""
        self.analyzer = analyzer
        self.tokens = {d: tokenize(t, analyzer) for d, t in docs.items()}
        self.tf = {d: Counter(toks) for d, toks in self.tokens.items()}
        self.df: Counter = Counter()
        for c in self.tf.values():
            self.df.update(c.keys())
        self.n_docs = len(docs)
        self.avgdl = (
            sum(len(t) for t in self.tokens.values()) / self.n_docs
            if self.n_docs
            else 0.0
        )

    @classmethod
    def from_pages(cls, pages, analyzer: str = "standard") -> "FrozenIndex":
        """pages: pandas frame with doc_id, html, text columns."""
        docs = {
            int(r.doc_id): extract_text(r.html, r.text)
            for r in pages.itertuples()
        }
        return cls(docs, analyzer)

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, doc_id: int, terms: list[str], k1=1.2, b=0.75) -> float:
        dl = len(self.tokens[doc_id])
        s = 0.0
        for t in sorted(set(terms)):
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0:
                return float("-inf")  # AND semantics
            s += self.idf(t) * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl / self.avgdl)
            )
        return s

    def _has_phrase(self, doc_id: int, phrase: tuple[str, ...]) -> bool:
        toks = self.tokens[doc_id]
        m = len(phrase)
        return any(
            tuple(toks[i : i + m]) == phrase for i in range(len(toks) - m + 1)
        )

    def topk(self, query_text: str, k: int = 13, k1=1.2, b=0.75):
        """Returns [(rank, doc_id, score)] — ties broken by ascending doc_id."""
        pq = parse_query(query_text, self.analyzer)
        results = []
        for d in self.tokens:
            s = self.score(d, list(pq.terms), k1, b)
            if s == float("-inf"):
                continue
            if any(self.tf[d].get(t, 0) for t in pq.neg_terms):
                continue
            if any(not self._has_phrase(d, p) for p in pq.phrases):
                continue
            if any(self._has_phrase(d, p) for p in pq.neg_phrases):
                continue
            results.append((d, s))
        results.sort(key=lambda x: (-x[1], x[0]))
        return [(i + 1, d, s) for i, (d, s) in enumerate(results[:k])]
