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
  term has at least one block in it — a metadata-only aggregation, no
  posting bytes decoded.
- **Block-max pruning**: each chunk's score upper bound is
  sum_t idf(t) * max(block max_impact of t in chunk), from block metadata
  only; idf comes from a broadcast join against the per-query term_stats
  slice (the north rule's "broadcast term statistics"). Two phases:
  (1) score the top-B chunks by bound -> threshold tau = k-th best score;
  (2) score only remaining chunks with bound > tau — skipped entirely when
  phase 1 already covered every eligible chunk.
- Job economy: one metadata job (chunk bounds), one scoring job per phase.
  The driver only ever sees <= B+1 chunk bounds and <= offset+k scored rows
  per phase; per-phase top-n lists merge driver-side (any doc in the global
  top-n is in its own phase's top-n).
- Within a chunk, scoring is numpy-vectorized: sorted-array intersection for
  AND semantics, searchsorted gathers, BM25 per term in sorted-term order
  (deterministic float accumulation, matching tests/frozen_bm25.py).

Rank identity vs the exact scorer (query/bm25.py) is asserted by
tests/test_wand.py; tie-break is ascending doc_id throughout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..index.build import IndexReader
from ..index.codec import delta_decode, varint_decode
from .bm25 import ParsedQuery, parse_query

CHUNK_SCORES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)

RESULT_SCHEMA = "doc_id long, score double, rank int"


def _make_chunk_scorer(
    pos_terms: tuple[str, ...],
    neg_terms: tuple[str, ...],
    k1: float,
    b: float,
    avgdl: float,
    n_keep: int,
    tau: float,
    tombstones: tuple[np.ndarray, np.ndarray] | None = None,
):
    """applyInPandas kernel: score one chunk's blocks, emit local top-n.

    Rows carry an `idf` column (broadcast-joined per query) and a `gen`
    segment id; tombstones = (doc_ids, before_gens) kill a doc only in
    generations below its before_gen (Lucene per-segment deletes). Negative
    terms have null idf and contribute only their doc ids."""
    pos_sorted = tuple(sorted(pos_terms))
    neg_set = frozenset(neg_terms)

    def _gen_exclusions(gen: int) -> np.ndarray | None:
        if tombstones is None:
            return None
        t_ids, t_gens = tombstones
        excl = t_ids[t_gens > gen]
        return excl if excl.size else None

    def score_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
        idf_of: dict[str, float] = {}
        per_term_max: dict[str, float] = {}
        for t, mi, idf in zip(pdf["term"], pdf["max_impact"], pdf["idf"]):
            if t in neg_set:
                continue
            idf_of[t] = float(idf)
            if mi > per_term_max.get(t, 0.0):
                per_term_max[t] = mi
        if len(per_term_max) < len(pos_sorted):
            return empty  # conjunctive: some positive term absent
        bound = sum(idf_of[t] * m for t, m in per_term_max.items())
        if bound < tau:  # ties kept: equal-score docs can win on doc_id
            return empty

        pdf = pdf.sort_values(["term", "gen", "first_doc"], kind="mergesort")
        lists: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for term, grp in pdf.groupby("term", sort=False):
            p_ids, p_tfs, p_dls = [], [], []
            is_neg = term in neg_set
            for gen, g2 in grp.groupby("gen", sort=True):
                ids = np.concatenate(
                    [delta_decode(x) for x in g2["docs_bin"]]
                ).astype(np.int64)
                tfs = dls = None
                if not is_neg:
                    tfs = np.concatenate(
                        [varint_decode(x) for x in g2["tfs_bin"]]
                    ).astype(np.float64)
                    dls = np.concatenate(
                        [varint_decode(x) for x in g2["dls_bin"]]
                    ).astype(np.float64)
                excl = _gen_exclusions(int(gen))
                if excl is not None:
                    keep = ~np.isin(ids, excl)
                    ids = ids[keep]
                    if not is_neg:
                        tfs, dls = tfs[keep], dls[keep]
                p_ids.append(ids)
                if not is_neg:
                    p_tfs.append(tfs)
                    p_dls.append(dls)
            ids = np.concatenate(p_ids) if p_ids else np.empty(0, dtype=np.int64)
            if is_neg:
                lists[term] = (np.sort(ids), None, None)
                continue
            tfs = np.concatenate(p_tfs)
            dls = np.concatenate(p_dls)
            # after per-gen tombstoning each doc survives in exactly one
            # generation; re-sort the merged list by doc_id
            order = np.argsort(ids, kind="stable")
            lists[term] = (ids[order], tfs[order], dls[order])

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
        if cand.size == 0:
            return empty

        scores = np.zeros(cand.shape[0], dtype=np.float64)
        for t in pos_sorted:
            ids, tfs, dls = lists[t]
            pos = np.searchsorted(ids, cand)
            tf = tfs[pos]
            dl = dls[pos]
            impact = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            scores += idf_of[t] * impact
        order = np.lexsort((cand, -scores))[:n_keep]
        return pd.DataFrame({"doc_id": cand[order], "score": scores[order]})

    return score_chunk


def wand_topk(
    index: IndexReader,
    query_text: str,
    k: int = 13,
    offset: int = 0,
    first_batch_chunks: int = 16,
) -> DataFrame:
    """Block-max top-k; rank-identical to exact_topk. Returns doc_id, score, rank."""
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
    n = index.n_docs

    # per-query stats slice, idf in-plan; broadcast to the block join
    stats = (
        index.term_stats()
        .filter(F.col("term").isin(list(pq.terms)))
        .select(
            "term",
            F.log1p(
                (F.lit(float(n)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )
    blocks = (
        index.postings()
        .filter(F.col("term").isin(all_terms))
        .select(
            "term", "chunk", "first_doc", "docs_bin", "tfs_bin", "dls_bin",
            "max_impact", "gen",
        )
        .join(F.broadcast(stats), "term", "left")
    )

    # tombstones are excluded *inside* the chunk scorer (before local top-n
    # truncation) — a deleted doc must not crowd out a live one. The set is
    # small by construction (compaction bounds it; streaming/incremental).
    tomb = index.tombstones()
    tomb_ids = None
    if tomb is not None:
        rows = tomb.collect()
        tomb_ids = (
            np.array([r["doc_id"] for r in rows], dtype=np.int64),
            np.array([r["before_gen"] for r in rows], dtype=np.int64),
        )

    def _score(chunk_ids_df: DataFrame | None, tau: float) -> list:
        sel = blocks
        if chunk_ids_df is not None:
            sel = blocks.join(F.broadcast(chunk_ids_df), "chunk", "left_semi")
        scorer = _make_chunk_scorer(
            pq.terms, pq.neg_terms, index.k1, index.b, index.avgdl,
            n_keep, tau, tomb_ids,
        )
        scored = sel.groupBy("chunk").applyInPandas(scorer, schema=CHUNK_SCORES_SCHEMA)
        return (
            scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(n_keep).collect()
        )

    # Adaptive plan: when the whole index has few chunks, the bounds pass
    # costs more (an extra Spark job) than it can save — score every chunk
    # in ONE job; the scorer's conjunctive check prunes per chunk anyway.
    # At 10^8+ chunks (10^12 docs) the two-phase bounds pruning is the only
    # viable plan. This is a metadata-only cost decision, no data scanned.
    # Cutover tuned empirically: per-Spark-job overhead (~0.3-0.5 s) means
    # the bounds job + second scoring job only pay off once they can prune
    # hundreds of chunks; below that, one job scoring every chunk wins.
    if index.n_chunks <= 8 * first_batch_chunks:
        rows = _score(None, tau=0.0)
        merged = [(int(r["doc_id"]), float(r["score"])) for r in rows]
        page = [
            (d, s, i + 1)
            for i, (d, s) in enumerate(merged[:n_keep])
            if i + 1 > offset
        ]
        return spark.createDataFrame(page, RESULT_SCHEMA)

    # job 1 (metadata only): chunk upper bounds, conjunctive-pruned
    chunk_bounds = (
        blocks.filter(F.col("idf").isNotNull())
        .groupBy("chunk", "term")
        .agg(F.max("max_impact").alias("mi"), F.first("idf").alias("idf"))
        .groupBy("chunk")
        .agg(
            F.count("*").alias("nt"),
            F.sum(F.col("idf") * F.col("mi")).alias("bound"),
        )
        .filter(F.col("nt") == len(pq.terms))
        .select("chunk", "bound")
    )
    top_bounds = (
        chunk_bounds.orderBy(F.desc("bound"), F.asc("chunk"))
        .limit(first_batch_chunks + 1)
        .collect()
    )
    if not top_bounds:
        return spark.createDataFrame([], RESULT_SCHEMA)
    phase1_ids = [int(r["chunk"]) for r in top_bounds[:first_batch_chunks]]
    exhausted = len(top_bounds) <= first_batch_chunks

    # job 2: score best chunks
    rows1 = _score(
        spark.createDataFrame([(c,) for c in phase1_ids], "chunk long"), tau=0.0
    )
    merged = [(int(r["doc_id"]), float(r["score"])) for r in rows1]

    if not exhausted:
        tau = merged[n_keep - 1][1] if len(merged) >= n_keep else 0.0
        # job 3: only chunks that can still beat tau. >= (not >): a chunk
        # whose bound equals tau can still contain an exact score tie that
        # wins on the doc_id tie-break.
        rest = chunk_bounds.filter(
            (~F.col("chunk").isin(phase1_ids)) & (F.col("bound") >= tau)
        ).select("chunk")
        rows2 = _score(rest, tau=tau)
        merged += [(int(r["doc_id"]), float(r["score"])) for r in rows2]

    merged.sort(key=lambda x: (-x[1], x[0]))
    page = [
        (d, s, i + 1)
        for i, (d, s) in enumerate(merged[:n_keep])
        if i + 1 > offset
    ]
    return spark.createDataFrame(page, RESULT_SCHEMA)
