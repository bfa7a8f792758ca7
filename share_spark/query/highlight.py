"""Highlight / text-match evidence extraction.

Reference: ES highlights on `card.text_by_propertypath.*` with
`require_field_match: False`, unpacked into TextMatchEvidence
(trovesearch_denorm.py:287-295,588-601). Since this engine tokenizes its own
text, snippets are recomputed from stored normalized text + the query's
matched terms — offsets are exact, no ES highlighter approximation.

Spark shape: one pandas UDF over the (small) top-k result set joined back to
stored text — the reference's result-hydration join (broadcast; k <= 101,
trovesearch_gathering.py:381-474).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis import tokenize
from ..index.build import IndexReader
from .bm25 import parse_query

HL_PRE, HL_POST = "<em>", "</em>"  # ES highlighter defaults


def make_snippet(
    text: str,
    terms: set[str],
    analyzer: str = "standard",
    window: int = 8,
    max_fragments: int = 3,
) -> list[str]:
    """Build up to max_fragments highlighted windows around term matches."""
    if not text:
        return []
    raw_tokens = text.split(" ")
    hits = [
        i
        for i, tok in enumerate(raw_tokens)
        if (toks := tokenize(tok, analyzer)) and toks[0] in terms
    ]
    fragments: list[str] = []
    used_until = -1
    for i in hits:
        if i <= used_until:
            continue
        lo = max(0, i - window)
        hi = min(len(raw_tokens), i + window + 1)
        used_until = hi - 1
        frag_parts = []
        for j in range(lo, hi):
            tok = raw_tokens[j]
            toks = tokenize(tok, analyzer)
            if toks and toks[0] in terms:
                frag_parts.append(f"{HL_PRE}{tok}{HL_POST}")
            else:
                frag_parts.append(tok)
        fragments.append(" ".join(frag_parts))
        if len(fragments) >= max_fragments:
            break
    return fragments


def with_highlights(
    index: IndexReader, results: DataFrame, query_text: str
) -> DataFrame:
    """Attach `highlights array<string>` to a top-k result DataFrame.

    The stored-text join is a broadcast of the tiny result set against the
    docs table (hydration join); the snippet UDF runs only on k rows."""
    pq = parse_query(query_text, index.analyzer)
    terms = set(pq.terms)
    analyzer = index.analyzer
    docs = index.live_docs().select("doc_id", "text_norm")
    joined = docs.join(F.broadcast(results), "doc_id", "left_semi").join(
        F.broadcast(results), "doc_id"
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("highlights", T.ArrayType(T.StringType())),
        ]
    )

    def _hl(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "score": pdf["score"],
                    "rank": pdf["rank"],
                    "highlights": [
                        make_snippet(t, terms, analyzer)
                        for t in pdf["text_norm"]
                    ],
                }
            )

    return joined.select("doc_id", "score", "rank", "text_norm").mapInPandas(
        _hl, schema=schema
    )
