"""Block-max top-k BM25 — distributed block-max WAND over posting blocks.

How the classic single-node algorithm (Broder et al. WAND; Ding & Suel
block-max WAND) maps onto Spark's execution model:

- Posting blocks are **chunk-aligned** at build time (a block never spans
  doc_id // chunk_docs boundaries), so grouping blocks by `chunk` reunites
  *all* query terms' postings for a doc-id range in one task. Document-at-a-
  time scoring is then safe per chunk — a document's score is never split
  across tasks.
- **Conjunctive pruning** (the reference's AND-of-terms semantics,
  trovesearch_denorm.py:656-668): a chunk survives only if every positive
  term has at least one block in it — computed as a metadata-only aggregation
  (no posting bytes decoded).
- **Block-max pruning**: each chunk's score upper bound is
  sum_t idf(t) * max(block max_impact of t in chunk), from block metadata
  only. Two phases: (1) score the top-B chunks by bound -> threshold tau =
  k-th best score; (2) score only remaining chunks with bound > tau. Both
  phases are distributed (orderBy().limit() = TakeOrdered, applyInPandas per
  chunk); the driver only ever sees B chunk ids and k scores, never postings.
- Within a chunk, scoring is numpy-vectorized: sorted-array intersection for
  AND semantics, searchsorted gathers, one BM25 expression per term in
  sorted-term order (deterministic float accumulation, matching the frozen
  oracle in tests/frozen_bm25.py).

Rank identity vs the exact scorer (query/bm25.py) is asserted by
tests/test_wand.py; tie-break is ascending doc_id throughout.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis import tokenize
from ..index.build import IndexReader
from ..index.codec import delta_decode, varint_decode
from .bm25 import ParsedQuery, parse_query

CHUNK_SCORES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _make_chunk_scorer(
    idf_map: dict[str, float],
    pos_terms: tuple[str, ...],
    neg_terms: tuple[str, ...],
    k1: float,
    b: float,
    avgdl: float,
    n_keep: int,
    tau: float,
    tombstones: np.ndarray | None = None,
):
    """applyInPandas kernel: score one chunk's blocks, emit local top-n."""
    pos_sorted = tuple(sorted(pos_terms))
    neg_set = frozenset(neg_terms)

    def score_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="float64")})
        # chunk-level block-max check against the running threshold
        per_term_max: dict[str, float] = {}
        for t, mi in zip(pdf["term"], pdf["max_impact"]):
            if t in neg_set:
                continue
            if mi > per_term_max.get(t, 0.0):
                per_term_max[t] = mi
        if len(per_term_max) < len(pos_sorted):
            return empty  # conjunctive: some positive term absent
        bound = sum(idf_map[t] * m for t, m in per_term_max.items())
        if bound <= tau:
            return empty

        pdf = pdf.sort_values(["term", "first_doc"], kind="mergesort")
        lists: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for term, grp in pdf.groupby("term", sort=False):
            ids = np.concatenate([delta_decode(x) for x in grp["docs_bin"]]).astype(
                np.int64
            )
            tfs = np.concatenate([varint_decode(x) for x in grp["tfs_bin"]]).astype(
                np.float64
            )
            dls = np.concatenate([varint_decode(x) for x in grp["dls_bin"]]).astype(
                np.float64
            )
            lists[term] = (ids, tfs, dls)

        # AND intersection, smallest list first
        cand = None
        for t in sorted(pos_sorted, key=lambda t: len(lists[t][0])):
            ids = lists[t][0]
            cand = ids if cand is None else cand[np.isin(cand, ids, assume_unique=True)]
            if cand.size == 0:
                return empty
        for t in neg_set:
            if t in lists:
                cand = cand[~np.isin(cand, lists[t][0], assume_unique=True)]
        if tombstones is not None and tombstones.size:
            cand = cand[~np.isin(cand, tombstones)]
        if cand.size == 0:
            return empty

        scores = np.zeros(cand.shape[0], dtype=np.float64)
        for t in pos_sorted:
            ids, tfs, dls = lists[t]
            pos = np.searchsorted(ids, cand)
            tf = tfs[pos]
            dl = dls[pos]
            impact = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            scores += idf_map[t] * impact
        if cand.shape[0] > n_keep:
            order = np.lexsort((cand, -scores))[:n_keep]
        else:
            order = np.lexsort((cand, -scores))
        return pd.DataFrame({"doc_id": cand[order], "score": scores[order]})

    return score_chunk


def wand_topk(
    index: IndexReader,
    query_text: str,
    k: int = 13,
    offset: int = 0,
    first_batch_chunks: int = 8,
) -> DataFrame:
    """Block-max top-k; rank-identical to exact_topk. Returns doc_id, score, rank."""
    from pyspark.sql import Window

    pq: ParsedQuery = parse_query(query_text, index.analyzer)
    if not pq.terms:
        raise ValueError("query has no positive terms")
    if pq.phrases or pq.neg_phrases:
        # phrase verification needs stored text — route through the exact plan
        from .bm25 import exact_topk

        return exact_topk(index, query_text, k=k, offset=offset)

    spark = index.spark
    n_keep = offset + k
    all_terms = list(dict.fromkeys(pq.terms + pq.neg_terms))
    stats = {
        r["term"]: int(r["df"])
        for r in index.term_stats()
        .filter(F.col("term").isin(all_terms))
        .collect()
    }
    missing = [t for t in pq.terms if t not in stats]
    if missing:
        # a required term absent from the corpus -> empty result (AND)
        return spark.createDataFrame(
            [], "doc_id long, score double, rank int"
        )
    from .bm25 import idf as _idf

    n = index.n_docs
    idf_map = {t: _idf(n, stats[t]) for t in pq.terms}

    blocks = index.postings().filter(F.col("term").isin(all_terms)).select(
        "term", "chunk", "first_doc", "n", "docs_bin", "tfs_bin", "dls_bin", "max_impact"
    )
    # tombstones must be excluded *inside* the chunk scorer (before the local
    # top-n truncation), or a deleted doc could crowd out a live one. The set
    # is small by construction — compaction bounds it (streaming/incremental).
    tomb = index.tombstones()
    tomb_ids = (
        np.array([r["doc_id"] for r in tomb.collect()], dtype=np.int64)
        if tomb is not None
        else None
    )

    idf_expr = F.create_map(
        *[x for t, v in idf_map.items() for x in (F.lit(t), F.lit(float(v)))]
    )
    pos_meta = blocks.filter(F.col("term").isin(list(pq.terms)))
    chunk_bounds = (
        pos_meta.groupBy("chunk", "term")
        .agg(F.max("max_impact").alias("mi"))
        .groupBy("chunk")
        .agg(
            F.count("*").alias("nt"),
            F.sum(idf_expr[F.col("term")] * F.col("mi")).alias("bound"),
        )
        .filter(F.col("nt") == len(pq.terms))
        .select("chunk", "bound")
    )

    def _score_chunks(chunk_ids_df: DataFrame, tau: float) -> DataFrame:
        sel = blocks.join(F.broadcast(chunk_ids_df), "chunk", "left_semi")
        scorer = _make_chunk_scorer(
            idf_map, pq.terms, pq.neg_terms, index.k1, index.b, index.avgdl,
            n_keep, tau, tomb_ids,
        )
        return sel.groupBy("chunk").applyInPandas(scorer, schema=CHUNK_SCORES_SCHEMA)

    # phase 1: best chunks by upper bound
    first = chunk_bounds.orderBy(F.desc("bound")).limit(first_batch_chunks)
    first_ids = [r["chunk"] for r in first.select("chunk").collect()]
    if not first_ids:
        return spark.createDataFrame([], "doc_id long, score double, rank int")
    phase1 = _score_chunks(
        spark.createDataFrame([(c,) for c in first_ids], "chunk long"), tau=0.0
    ).cache()
    top1 = phase1.orderBy(F.desc("score"), F.asc("doc_id")).limit(n_keep).collect()
    tau = float(top1[-1]["score"]) if len(top1) >= n_keep else 0.0

    # phase 2: remaining chunks that can still beat tau
    rest = chunk_bounds.filter(
        (~F.col("chunk").isin(first_ids)) & (F.col("bound") > tau)
    ).select("chunk")
    phase2 = _score_chunks(rest, tau=tau)

    merged = phase1.unionByName(phase2)
    topn = merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(n_keep)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        topn.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") > offset)
        .select("doc_id", "score", "rank")
    )
