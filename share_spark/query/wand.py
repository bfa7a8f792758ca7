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
  sum_t idf(t) * max over t's blocks of impact(max_tf, min_dl, avgdl_query),
  from block metadata only; idf comes from a broadcast join against the
  per-query term_stats slice (the north rule's "broadcast term statistics").
  The bound is computed with the QUERY-TIME global avgdl from stored
  (max_tf, min_dl) — impact is increasing in tf and decreasing in dl, so it
  upper-bounds every posting in the block regardless of how later
  generations move avgdl (a build-time max_impact would go stale and prune
  true top-k docs once global avgdl exceeds a generation's own).
  Two phases: (1) score the top-B chunks by bound -> threshold tau = k-th
  best score; (2) score only remaining chunks with bound >= tau — skipped
  entirely when phase 1 already covered every eligible chunk.
- **Phrases are an index operation**: positional postings (pos_bin runs)
  are decoded only for phrase terms; in-order matching is a vectorized
  key-intersection (doc_rank * P + position), never a stored-text rescan
  (the reference pins phrase semantics at
  _common_trovesearch_tests.py:455-474).
- **Tombstones and structured filters ride an in-plan aux channel**: both
  are DataFrames keyed by chunk = doc_id // chunk_docs, cogrouped with the
  posting blocks, and applied inside the kernel BEFORE local top-n
  truncation. No driver collect (10^8 tombstones between compactions would
  be a driver OOM), and no overfetch heuristics for filtered queries — the
  kernel sees the exact allowed-doc set for its chunk.
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
from ..index.codec import filter_groups, gather_groups, get_codec
from .bm25 import (
    PREFIX_SCORE,
    ParsedQuery,
    parse_disjunction,
    parse_query,
    prefix_doc_filter,
    prefix_only_topk,
    validate_branches,
)

CHUNK_SCORES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)

AUX_SCHEMA = "chunk long, doc_id long, before_gen long, kind string"

RESULT_SCHEMA = "doc_id long, score double, rank int"


def _local_result(spark, page) -> DataFrame:
    """Local top-k page -> DataFrame as a true LocalRelation (Arrow/pandas
    path). createDataFrame over a plain Python list parallelizes into an
    RDD-backed frame whose every downstream action launches a real job
    (~0.3 s of scheduler overhead per query for 13 rows); the pandas path
    embeds the rows in the plan."""
    pdf = pd.DataFrame(page, columns=["doc_id", "score", "rank"])
    pdf = pdf.astype(
        {"doc_id": "int64", "score": "float64", "rank": "int32"}
    )
    return spark.createDataFrame(pdf, schema=RESULT_SCHEMA)


def _member(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership of vals in a sorted array, vectorized."""
    if sorted_arr.size == 0:
        return np.zeros(vals.shape[0], dtype=bool)
    i = np.searchsorted(sorted_arr, vals)
    ic = np.minimum(i, sorted_arr.size - 1)
    return (i < sorted_arr.size) & (sorted_arr[ic] == vals)


def impact_bound_col(k1: float, b: float, avgdl: float):
    """Per-block impact upper bound from avgdl-independent metadata,
    evaluated with the query-time global avgdl (see module docstring)."""
    mtf = F.col("max_tf").cast("double")
    mdl = F.col("min_dl").cast("double")
    return (mtf * (k1 + 1.0)) / (
        mtf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * mdl / F.lit(avgdl))
    )


def _term_keys(cand, tl, P):
    """Sorted (cand_rank * P + position) keys of a term's occurrences in
    the candidate docs (docs without the term contribute nothing).
    tl = (ids, tfs, dls, pos_flat)."""
    ids, tfs, _dls, pos_flat = tl
    if ids.size == 0:
        return np.empty(0, dtype=np.int64)
    loc = np.searchsorted(ids, cand)
    valid = (loc < ids.size) & (ids[np.minimum(loc, ids.size - 1)] == cand)
    order = loc[valid]
    sub_pos = gather_groups(pos_flat, tfs, order)
    ranks = np.nonzero(valid)[0]
    return np.repeat(ranks, tfs[order]) * P + sub_pos


def _phrase_mask(cand, lists, phrase, P, slop: int = 0):
    """Boolean mask over cand: doc contains the phrase in order (exact
    adjacency when slop=0; in-order window p1<..<pn, pn-p1 <= len-1+slop
    otherwise — span_near(in_order=true) semantics, see ParsedQuery)."""
    if slop > 0:
        return _sloppy_phrase_mask(cand, lists, phrase, P, slop)
    mask = np.zeros(cand.shape[0], dtype=bool)
    if any(t not in lists for t in phrase):
        return mask
    S = _term_keys(cand, lists[phrase[0]], P)
    for i, t in enumerate(phrase[1:], start=1):
        if S.size == 0:
            break
        S = S[_member(_term_keys(cand, lists[t], P), S + i)]
    if S.size:
        mask[(S // P).astype(np.int64)] = True
    return mask


def _sloppy_phrase_mask(cand, lists, phrase, P, slop: int):
    """Vectorized in-order sloppy match via a max-chain-start DP in the
    stride keyspace: for each occurrence of term i, the LARGEST p1 of any
    in-order chain t1..ti ending there (larger start = most window budget
    left, so a window-satisfying chain exists iff the max-start one
    satisfies it). One searchsorted + prefix-max per term — O(occurrences),
    no per-candidate Python."""
    mask = np.zeros(cand.shape[0], dtype=bool)
    if any(t not in lists for t in phrase):
        return mask
    K_prev = _term_keys(cand, lists[phrase[0]], P)
    M_prev = K_prev.copy()  # chain-start KEY (rank*P + p1); -1 = no chain
    for t in phrase[1:]:
        if K_prev.size == 0:
            return mask
        K_cur = _term_keys(cand, lists[t], P)
        start = np.full(K_cur.shape[0], -1, dtype=np.int64)
        if K_cur.size:
            # best start among all PRECEDING occurrences of the previous
            # term: running max is safe across docs because keys of
            # earlier docs are strictly smaller (P-stride) and the
            # same-doc check below rejects any cross-doc winner
            run = np.maximum.accumulate(M_prev)
            idx = np.searchsorted(K_prev, K_cur, side="left") - 1
            ok = idx >= 0
            sel = np.nonzero(ok)[0]
            best = run[idx[sel]]
            good = (best >= 0) & ((best // P) == (K_cur[sel] // P))
            start[sel[good]] = best[good]
        K_prev, M_prev = K_cur, start
    if K_prev.size:
        window = len(phrase) - 1 + slop
        hit = K_prev[(M_prev >= 0) & (K_prev - M_prev <= window)]
        if hit.size:
            mask[(hit // P).astype(np.int64)] = True
    return mask


def candidate_ids(
    pq: ParsedQuery,
    lists: dict,
    allow_ids: np.ndarray | None = None,
) -> np.ndarray:
    """The boolean half of document-at-a-time evaluation: the sorted doc ids
    satisfying the query's AND-of-terms + negations + phrase constraints
    (before any scoring) — shared by the scorer and the match-set kernel so
    match semantics cannot drift between the two.

    lists: term -> (ids sorted unique, tfs, dls or None, pos_flat or None).
    """
    pos_sorted = tuple(sorted(pq.terms))
    neg_set = frozenset(pq.neg_terms)
    empty = np.empty(0, dtype=np.int64)

    cand = None
    for t in sorted(pos_sorted, key=lambda t: lists[t][0].size if t in lists else 0):
        if t not in lists:
            return empty
        ids = lists[t][0]
        cand = ids if cand is None else cand[np.isin(cand, ids, assume_unique=True)]
        if cand.size == 0:
            return empty
    if allow_ids is not None:
        cand = cand[_member(allow_ids, cand)]
    for t in neg_set:
        if t in lists:
            cand = cand[~np.isin(cand, lists[t][0], assume_unique=True)]
    if cand.size == 0:
        return empty

    if pq.phrases or pq.neg_phrases:
        max_phrase_len = max(len(p) for p in pq.phrases + pq.neg_phrases)
        # P strides the doc-rank keyspace past any in-doc position; every
        # candidate doc appears in every positive term's list, so the max
        # dl over positive lists bounds every candidate position
        max_dl = 0
        for t in pos_sorted:
            dls = lists[t][2]
            if dls is not None and dls.size:
                max_dl = max(max_dl, int(dls.max()))
        P = np.int64(max_dl + max_phrase_len + 2)
        for i, ph in enumerate(pq.phrases):
            cand = cand[_phrase_mask(cand, lists, ph, P, pq.slop_of(i))]
            if cand.size == 0:
                return empty
        for i, ph in enumerate(pq.neg_phrases):
            cand = cand[~_phrase_mask(cand, lists, ph, P, pq.neg_slop_of(i))]
            if cand.size == 0:
                return empty
    return cand


def score_term_lists(
    pq: ParsedQuery,
    lists: dict,
    idf_of: dict,
    k1: float,
    b: float,
    avgdl: float,
    n_keep: int,
    allow_ids: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """The document-at-a-time scoring core, shared VERBATIM by the
    distributed chunk kernel and the serving tier (query/serve.py) — one
    scorer, two transports, so rank identity holds by construction.

    lists: term -> (ids sorted unique, tfs, dls or None, pos_flat or None);
    returns (doc_ids, scores) of the local top-n_keep (score desc, id asc).
    """
    cand, scores = _branch_cand_scores(pq, lists, idf_of, k1, b, avgdl, allow_ids)
    order = np.lexsort((cand, -scores))[:n_keep]
    return cand[order], scores[order]


def _branch_cand_scores(
    pq: ParsedQuery,
    lists: dict,
    idf_of: dict,
    k1: float,
    b: float,
    avgdl: float,
    allow_ids: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """One conjunctive branch's full (candidates, scores) — untruncated."""
    cand = candidate_ids(pq, lists, allow_ids)
    scores = np.zeros(cand.shape[0], dtype=np.float64)
    if cand.size == 0:
        return cand, scores
    for t in sorted(pq.terms):
        ids, tfs, dls, _pos = lists[t]
        pos = np.searchsorted(ids, cand)
        tf = tfs[pos].astype(np.float64)
        dl = dls[pos]
        impact = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        scores += idf_of[t] * impact
    return cand, scores


def score_branch_lists(
    branches: tuple[ParsedQuery, ...],
    lists: dict,
    idf_of: dict,
    k1: float,
    b: float,
    avgdl: float,
    n_keep: int,
    allow_ids: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Disjunction of conjunctive branches ('a b | c d' — the
    simple_query_string OR operator): a doc matches when ANY branch's
    constraints hold, and scores the SUM of its matching branches' BM25
    term sums (Lucene BooleanQuery SHOULD-clause summing). Single branch
    degenerates to score_term_lists exactly. Shared by the distributed
    chunk kernel and the serve tier, like score_term_lists."""
    if len(branches) == 1:
        return score_term_lists(
            branches[0], lists, idf_of, k1, b, avgdl, n_keep, allow_ids
        )
    cands, parts = [], []
    for pq in branches:
        c, s = _branch_cand_scores(pq, lists, idf_of, k1, b, avgdl, allow_ids)
        if c.size:
            cands.append(c)
            parts.append(s)
    if not cands:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    cat = np.concatenate(cands)
    uniq, inv = np.unique(cat, return_inverse=True)
    tot = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(tot, inv, np.concatenate(parts))
    order = np.lexsort((uniq, -tot))[:n_keep]
    return uniq[order], tot[order]


def _decode_chunk_lists(
    pdf: pd.DataFrame,
    tomb_ids: np.ndarray | None,
    tomb_gens: np.ndarray | None,
    score_terms: frozenset,
    phrase_terms: frozenset,
    codec=None,
) -> dict:
    """Decode one chunk's block rows into per-term posting arrays:
    term -> (ids sorted, tfs, dls or None, pos_flat or None).

    dls decode only for `score_terms`, positions only for `phrase_terms`;
    generation-scoped tombstones applied per (term, gen) before the merge.
    Shared by the scoring kernel and the boolean match-set kernel. `codec`
    is a codec class from index.codec.POSTING_CODECS (None = varint)."""
    if codec is None:
        codec = get_codec("varint")
    pdf = pdf.sort_values(["term", "gen", "first_doc"], kind="mergesort")
    lists: dict[str, tuple] = {}
    for term, grp in pdf.groupby("term", sort=False):
        want_score = term in score_terms
        want_pos = term in phrase_terms
        p_ids, p_tfs, p_dls, p_pos = [], [], [], []
        for gen, g2 in grp.groupby("gen", sort=True):
            # batch decode: ONE codec call per column per (term, gen) —
            # blocks are self-delimiting within the concatenated buffer,
            # and doc-id gap runs reset per block (grouped decode keyed by
            # the block posting counts)
            ns = g2["n"].to_numpy(dtype=np.int64)
            ids = codec.decode_delta(g2["docs_bin"], ns)
            tfs = codec.decode_plain(g2["tfs_bin"], ns).astype(np.int64)
            dls = pos_flat = None
            if want_score:
                dls = codec.decode_plain(g2["dls_bin"], ns).astype(np.float64)
            if want_pos:
                pos_flat = codec.decode_runs(g2["pos_bin"], ns, tfs)
            if tomb_ids is not None:
                excl = tomb_ids[tomb_gens > int(gen)]
                if excl.size:
                    keep = ~np.isin(ids, excl)
                    if want_pos:
                        pos_flat = filter_groups(pos_flat, tfs, keep)
                    ids, tfs = ids[keep], tfs[keep]
                    if want_score:
                        dls = dls[keep]
            p_ids.append(ids)
            p_tfs.append(tfs)
            if want_score:
                p_dls.append(dls)
            if want_pos:
                p_pos.append(pos_flat)
        ids = np.concatenate(p_ids) if p_ids else np.empty(0, dtype=np.int64)
        tfs = np.concatenate(p_tfs) if p_tfs else np.empty(0, dtype=np.int64)
        # after per-gen tombstoning each doc survives in exactly one
        # generation; re-sort the merged list by doc_id
        order = np.argsort(ids, kind="stable")
        pos_flat = None
        if want_pos:
            pos_flat = gather_groups(np.concatenate(p_pos), tfs, order)
        dls = np.concatenate(p_dls)[order] if want_score else None
        lists[term] = (ids[order], tfs[order], dls, pos_flat)
    return lists


def _aux_arrays(aux: pd.DataFrame | None):
    """Split the cogrouped aux frame into (tomb_ids, tomb_gens, allow_ids)."""
    tomb_ids = tomb_gens = allow_ids = None
    if aux is not None and len(aux):
        t = aux[aux["kind"] == "tomb"]
        if len(t):
            tomb_ids = t["doc_id"].to_numpy(dtype=np.int64)
            tomb_gens = t["before_gen"].to_numpy(dtype=np.int64)
        a = aux[aux["kind"] == "allow"]
        if len(a):
            allow_ids = np.sort(a["doc_id"].to_numpy(dtype=np.int64))
    return tomb_ids, tomb_gens, allow_ids


def _make_chunk_scorer(
    branches: tuple[ParsedQuery, ...],
    k1: float,
    b: float,
    avgdl: float,
    n_keep: int,
    tau: float,
    filter_active: bool,
    codec_name: str = "varint",
):
    """applyInPandas / cogroup kernel: score one chunk's blocks, emit local
    top-n. `branches` is the query's `|` disjunction of conjunctive
    branches (usually one) — a chunk prunes only when NO branch has all
    its terms present, and the tau bound is the sum of the viable
    branches' bounds.

    Block rows carry `idf` (broadcast-joined per query), `gen` (segment id),
    and `bound_imp` (query-time impact bound). The optional aux frame carries
    tombstones (kind='tomb': kill doc in generations < before_gen) and the
    allowed-doc set when a structured filter is pushed down (kind='allow').
    Negative terms / neg-phrase-only terms have null idf and contribute only
    ids (+ positions for phrase checks).
    """
    branch_terms = [tuple(sorted(set(br.terms))) for br in branches]
    pos_set = frozenset(t for bt in branch_terms for t in bt)
    phrase_terms = frozenset(
        t
        for br in branches
        for ph in (br.phrases + br.neg_phrases)
        for t in ph
    )
    codec = get_codec(codec_name)

    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        }
    )

    def score_chunk(pdf: pd.DataFrame, aux: pd.DataFrame | None = None) -> pd.DataFrame:
        if len(pdf) == 0:
            return empty
        tomb_ids, tomb_gens, allow_ids = _aux_arrays(aux)
        if filter_active and allow_ids is None:
            return empty  # filter active, nothing allowed in this chunk

        idf_of: dict[str, float] = {}
        per_term_max: dict[str, float] = {}
        seen_terms = set()
        for t, bi, idf in zip(pdf["term"], pdf["bound_imp"], pdf["idf"]):
            seen_terms.add(t)
            if t not in pos_set:
                continue
            idf_of[t] = float(idf)
            if bi > per_term_max.get(t, 0.0):
                per_term_max[t] = bi

        # branch viability: all the branch's terms (and its positive
        # phrases' terms) present in this chunk; the chunk's score bound
        # is the sum of viable branch bounds
        viable: list[ParsedQuery] = []
        bound = 0.0
        for br, bt in zip(branches, branch_terms):
            if any(t not in per_term_max for t in bt):
                continue
            if any(
                t not in seen_terms for ph in br.phrases for t in ph
            ):
                continue
            viable.append(br)
            bound += sum(idf_of[t] * per_term_max[t] for t in bt)
        if not viable:
            return empty
        if bound < tau:  # ties kept: equal-score docs can win on doc_id
            return empty

        lists = _decode_chunk_lists(
            pdf, tomb_ids, tomb_gens, pos_set, phrase_terms, codec
        )
        doc_ids, scores = score_branch_lists(
            tuple(viable), lists, idf_of, k1, b, avgdl, n_keep, allow_ids
        )
        return pd.DataFrame({"doc_id": doc_ids, "score": scores})

    return score_chunk


# Interactive-query SQL conf (AQE off + narrow reduces), scoped to a
# top-k's own actions.  AQE turns every shuffle into a materialized stage
# barrier with a re-optimization pass — right for the build's skewed
# terabyte shuffles, wrong for a top-k that moves kilobytes: measured at
# 2M docs the same query set runs p50 1.77 s / p95 2.46 s with AQE vs
# 1.15 / 1.33 without.  (AQE's one interactive virtue, coalescing empty
# reduce partitions, is kept — explicitly, via the narrow width — without
# paying for the re-plan barrier.)  Lives in ..session so the build path
# can hold the complementary batch_sql_conf: when a build overlaps
# in-flight queries on the same session, BATCH WINS and the session's own
# AQE/shuffle settings are asserted for the overlap.
from ..session import interactive_sql_conf as _interactive_conf  # noqa: E402


def _bucketed_kernel(chunk_kernel, empty: pd.DataFrame):
    """Wrap a per-chunk kernel so it processes a BUCKET of chunks per call.

    groupBy("chunk").applyInPandas pays a fixed per-group cost (one pandas
    frame + one Python call per group) — negligible at tens of chunks but
    the dominant query cost once the corpus has hundreds (measured: 245
    chunks at 2M docs cost ~1.3 s/job in pure per-group overhead, 3-5x the
    actual decode+score work), and fatal at the 10^8-chunk target scale.
    Keying the shuffle by pmod(hash(chunk), B) instead bounds the group
    count by B regardless of corpus size; the wrapper iterates its bucket's
    chunks via pandas' C-level groupby and concatenates their outputs.
    Chunk-at-a-time semantics (conjunctive pruning, per-chunk bound test,
    local top-n) are preserved exactly — the same per-chunk kernel runs,
    just batched."""

    def run(pdf: pd.DataFrame, aux: pd.DataFrame | None = None) -> pd.DataFrame:
        if len(pdf) == 0:
            return empty
        aux_groups: dict = {}
        if aux is not None and len(aux):
            aux_groups = dict(tuple(aux.groupby("chunk", sort=False)))
        outs = [
            chunk_kernel(g, aux_groups.get(ck))
            for ck, g in pdf.groupby("chunk", sort=False)
        ]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else empty

    return run


def _with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    # one parsed expression instead of a pmod/hash/lit Column chain: the
    # bucket column is added per interactive query, and every Column call
    # is a driver py4j round-trip (see wand_topk's plan-chatter note)
    return df.selectExpr("*", f"pmod(hash(chunk), {n_buckets}) AS _bucket")


def _chunk_partitioned(df: DataFrame, runner, schema) -> DataFrame:
    """Aux-free kernel execution: hash-repartition by chunk (all of a
    chunk's blocks co-locate; reduce width comes from the runtime shuffle
    conf, 4 under the interactive guard) and run the bucket runner once
    per task via mapInArrow. This replaces groupBy("_bucket")
    .applyInPandas for the no-tombstone/no-filter path: FlatMapGroupsInPandas
    requires a Sort by the grouping key inside each task and pays per-group
    conversion, while the runner already iterates chunks via a C-level
    pandas groupby — so the sort and the grouping machinery bought nothing.
    The task accumulates its batches before one groupby; the input is the
    query's term-pruned block slice, so per-task volume is bounded by the
    query, not the corpus. (The tombstone/filter path keeps the cogrouped
    applyInPandas — cogroup alignment needs the grouped plan.)"""
    import pyarrow as pa

    def fn(batches):
        tabs = [b for b in batches if b.num_rows]
        if not tabs:
            return
        pdf = pa.Table.from_batches(tabs).to_pandas()
        out = runner(pdf, None)
        if len(out):
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return df.repartition(F.col("chunk")).mapInArrow(fn, schema=schema)


_EMPTY_SCORES = pd.DataFrame(
    {
        "doc_id": pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="float64"),
    }
)

_EMPTY_MATCH = pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})


def _chunk_of_doc(chunk_docs: int):
    """FLOOR division chunk key, exact in integer arithmetic — must agree
    with the encoder's numpy `ids // chunk_docs` for negative doc ids too
    (xxhash64-derived ids are full-range int64), and must not round through
    a double (precision loss past 2^53)."""
    return F.expr(
        f"(doc_id - pmod(doc_id, {chunk_docs}L)) div {chunk_docs}L"
    ).alias("chunk")


def _aux_frames(
    index: IndexReader, filter_docs: DataFrame | None
) -> DataFrame | None:
    """Tombstones + allowed-doc filter as one chunk-keyed aux DataFrame
    (cogrouped with the posting blocks — never collected to the driver)."""
    chunk_docs = index.chunk_docs
    parts = []
    tomb = index.tombstones()
    if tomb is not None:
        parts.append(
            tomb.select(
                _chunk_of_doc(chunk_docs),
                "doc_id",
                F.col("before_gen").cast("long").alias("before_gen"),
                F.lit("tomb").alias("kind"),
            )
        )
    if filter_docs is not None:
        parts.append(
            filter_docs.select(
                _chunk_of_doc(chunk_docs),
                "doc_id",
                F.lit(-1).cast("long").alias("before_gen"),
                F.lit("allow").alias("kind"),
            )
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def wand_topk(
    index: IndexReader,
    query_text: str,
    k: int = 13,
    offset: int = 0,
    first_batch_chunks: int = 16,
    filter_docs: DataFrame | None = None,
    pq: ParsedQuery | None = None,
    single_phase_max_chunks: int = 4096,
) -> DataFrame:
    """Block-max top-k; rank-identical to exact_topk. Returns doc_id, score,
    rank. `filter_docs` (doc_id) restricts results to that set, applied
    inside the chunk kernel before any truncation (full pages guaranteed —
    no overfetch heuristics). `pq` overrides query parsing (used by the
    field-scoped path, whose terms carry a path-prefix namespace).
    Prefix clauses (`dang*`) fold into the filter channel and add
    PREFIX_SCORE each (constant-score rewrite, see ParsedQuery) — uniform
    over every result, so the kernel's bounds and tau pruning are
    unaffected."""
    if pq is not None:
        branches = (pq,)
    else:
        branches = parse_disjunction(query_text, index.analyzer)
    validate_branches(branches)
    if len(branches) == 1:
        pq = branches[0]
        if not pq.terms and not pq.const_clauses:
            raise ValueError("query has no positive terms")
        if pq.prefixes or pq.neg_prefixes or pq.fuzzies or pq.neg_fuzzies:
            filter_docs = prefix_doc_filter(index, pq, filter_docs)
        if not pq.terms:
            return prefix_only_topk(index, pq, k, offset, filter_docs)
        prefix_const = PREFIX_SCORE * pq.const_clauses
    else:
        prefix_const = 0.0  # validate_branches bans prefixes in branches

    spark = index.spark
    n_keep = offset + k
    pos_terms = tuple(
        dict.fromkeys(t for br in branches for t in br.terms)
    )
    has_phrases = any(br.phrases or br.neg_phrases for br in branches)
    phrase_terms = [
        t
        for br in branches
        for ph in (br.phrases + br.neg_phrases)
        for t in ph
    ]
    all_terms = list(
        dict.fromkeys(
            pos_terms
            + tuple(t for br in branches for t in br.neg_terms)
            + tuple(phrase_terms)
        )
    )
    n = index.n_docs
    k1, b, avgdl = index.k1, index.b, index.avgdl

    cols = ["term", "chunk", "first_doc", "n", "docs_bin", "tfs_bin",
            "dls_bin", "max_tf", "min_dl", "gen"]
    if has_phrases:
        cols.append("pos_bin")  # positions read only when a phrase needs them
    blocks = index.postings(interactive=True).filter(
        F.col("term").isin(all_terms)
    )

    # per-query stats slice, idf in-plan. Fast path: resolve df per term
    # DRIVER-SIDE from the term-sorted stats parquet (row-group pruned, no
    # Spark job) and embed idf as literals — the log1p still evaluates in
    # the JVM on the same inputs (constant-folded once at plan time), so
    # values are bit-identical to the broadcast-join plan, which remains
    # the fallback for non-local filesystems. Saves one job + a broadcast
    # exchange per query.
    #
    # Plan-chatter note: the whole per-query projection (idf CASE,
    # bound_imp, the null pos_bin) is ONE selectExpr of SQL strings — a
    # single parse round-trip — instead of a Column chain whose every
    # F.when/F.lit/withColumn is its own driver<->JVM py4j call (profiled
    # at ~675 round-trips and ~0.2-0.3 s per interactive query). Doubles
    # embed as CAST('<repr>' AS DOUBLE): repr round-trips exactly and the
    # string cast parses via Double.parseDouble, so every literal is the
    # same double the F.lit path shipped. Falls back to the Column chain
    # for terms that would need escaping inside a SQL string literal.
    stats_local = index.term_stats_local(pos_terms)

    def _d(v: float) -> str:
        return f"CAST('{v!r}' AS DOUBLE)"

    bound_sql = (
        f"(CAST(max_tf AS DOUBLE) * {_d(k1 + 1.0)}) / "
        f"(CAST(max_tf AS DOUBLE) + {_d(k1)} * ({_d(1.0 - b)} + {_d(b)} * "
        f"CAST(min_dl AS DOUBLE) / {_d(avgdl)}))"
    )
    sql_safe = all(
        "'" not in t and "\\" not in t and "\n" not in t for t in pos_terms
    )
    if stats_local is not None and sql_safe:
        whens = [
            f"WHEN term = '{t}' THEN log1p(({_d(float(n))} - "
            f"{_d(float(stats_local[t]))} + {_d(0.5)}) / "
            f"({_d(float(stats_local[t]))} + {_d(0.5)}))"
            for t in pos_terms
            if t in stats_local
        ]
        idf_sql = (
            ("CASE " + " ".join(whens) + " ELSE CAST(NULL AS DOUBLE) END")
            if whens
            else "CAST(NULL AS DOUBLE)"
        )
        blocks = blocks.selectExpr(
            *cols,
            *([] if has_phrases else ["CAST(NULL AS BINARY) AS pos_bin"]),
            f"{idf_sql} AS idf",
            f"{bound_sql} AS bound_imp",
        )
    else:
        blocks = blocks.select(*cols)
        if stats_local is not None:
            idf_col = F.lit(None).cast("double")
            for t in pos_terms:
                if t in stats_local:
                    dfv = F.lit(stats_local[t]).cast("double")
                    idf_col = F.when(
                        F.col("term") == t,
                        F.log1p(
                            (F.lit(float(n)) - dfv + F.lit(0.5))
                            / (dfv + F.lit(0.5))
                        ),
                    ).otherwise(idf_col)
            blocks = blocks.withColumn("idf", idf_col)
        else:
            stats = (
                index.term_stats()
                .filter(F.col("term").isin(list(pos_terms)))
                .select(
                    "term",
                    F.log1p(
                        (F.lit(float(n)) - F.col("df") + F.lit(0.5))
                        / (F.col("df") + F.lit(0.5))
                    ).alias("idf"),
                )
            )
            blocks = blocks.join(F.broadcast(stats), "term", "left")
        blocks = blocks.withColumn("bound_imp", impact_bound_col(k1, b, avgdl))
        if not has_phrases:
            blocks = blocks.withColumn("pos_bin", F.lit(None).cast("binary"))

    aux = _aux_frames(index, filter_docs)
    filter_active = filter_docs is not None

    # bucketed kernel: group count bounded by B, not by corpus chunk count
    n_buckets = max(32, spark.sparkContext.defaultParallelism * 2)

    def _score(chunk_ids_df: DataFrame | None, tau: float) -> list:
        sel = blocks
        if chunk_ids_df is not None:
            sel = blocks.join(F.broadcast(chunk_ids_df), "chunk", "left_semi")
        scorer = _bucketed_kernel(
            _make_chunk_scorer(
                branches, k1, b, avgdl, n_keep, tau, filter_active,
                index.postings_codec,
            ),
            _EMPTY_SCORES,
        )
        if aux is None:
            scored = _chunk_partitioned(sel, scorer, CHUNK_SCORES_SCHEMA)
        else:
            sel = _with_bucket(sel, n_buckets)
            aux_sel = aux
            if chunk_ids_df is not None:
                aux_sel = aux.join(F.broadcast(chunk_ids_df), "chunk", "left_semi")
            aux_sel = _with_bucket(aux_sel, n_buckets)
            scored = (
                sel.groupBy("_bucket")
                .cogroup(aux_sel.groupBy("_bucket"))
                .applyInPandas(
                    lambda left, right: scorer(left, right),
                    schema=CHUNK_SCORES_SCHEMA,
                )
            )
        with _interactive_conf(spark):
            return (
                scored.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(n_keep)
                .collect()
            )

    # Adaptive plan: when the whole index has few chunks, the bounds pass
    # costs more (an extra Spark job) than it can save — score every chunk
    # in ONE job; the scorer's conjunctive check prunes per chunk anyway.
    # At 10^8+ chunks (10^12 docs) the two-phase bounds pruning is the only
    # viable plan. This is a metadata-only cost decision, no data scanned.
    # Cutover tuned empirically AT SCALE: each extra Spark job costs a
    # fixed ~0.5-1 s (shuffle setup, AQE re-plan, Python runner spin-up),
    # while decoding+scoring a pruned chunk costs ~1-3 ms of bucketed
    # kernel work — so two-phase only pays once it can prune O(10^3-10^4)
    # chunks. Measured at 2M docs / 245 chunks, the two-phase plan was
    # 2-3x SLOWER than one job scoring every chunk (3.4 s vs 1.3 s p50);
    # at 128 chunks and below both plans tie. 4096 chunks (~33M docs at
    # the default chunk_docs) keeps the one-job plan until the decode
    # volume genuinely rivals a job's fixed overhead.
    # (single_phase_max_chunks=0 forces the two-phase plan — used by tests
    # to keep the at-scale path covered on small fixtures)
    if index.n_chunks <= single_phase_max_chunks:
        rows = _score(None, tau=0.0)
        merged = [(int(r["doc_id"]), float(r["score"])) for r in rows]
        page = [
            (d, s + prefix_const, i + 1)
            for i, (d, s) in enumerate(merged[:n_keep])
            if i + 1 > offset
        ]
        return _local_result(spark, page)

    # job 1 (metadata only): chunk upper bounds. Per BRANCH conjunctive:
    # a chunk qualifies for a branch when every branch term appears; the
    # chunk's bound is the sum of its qualifying branches' bounds (the
    # BooleanQuery SHOULD-sum upper bound). Single branch degenerates to
    # the plain conjunctive prune.
    per_ct = (
        blocks.filter(F.col("idf").isNotNull())
        .groupBy("chunk", "term")
        .agg(F.max("bound_imp").alias("mi"), F.first("idf").alias("idf"))
    )
    if len(branches) == 1:
        chunk_bounds = (
            per_ct.groupBy("chunk")
            .agg(
                F.count("*").alias("nt"),
                F.sum(F.col("idf") * F.col("mi")).alias("bound"),
            )
            .filter(F.col("nt") == len(branches[0].terms))
            .select("chunk", "bound")
        )
    else:
        bmap = spark.createDataFrame(
            [
                (t, i)
                for i, br in enumerate(branches)
                for t in sorted(set(br.terms))
            ],
            "term string, _branch int",
        )
        bsize = F.create_map(
            *[
                x
                for i, br in enumerate(branches)
                for x in (F.lit(i), F.lit(len(set(br.terms))))
            ]
        )
        chunk_bounds = (
            per_ct.join(F.broadcast(bmap), "term")
            .groupBy("chunk", "_branch")
            .agg(
                F.count("*").alias("nt"),
                F.sum(F.col("idf") * F.col("mi")).alias("bound_b"),
            )
            .filter(F.col("nt") == F.element_at(bsize, F.col("_branch")))
            .groupBy("chunk")
            .agg(F.sum("bound_b").alias("bound"))
            .select("chunk", "bound")
        )
    with _interactive_conf(spark):
        top_bounds = (
            chunk_bounds.orderBy(F.desc("bound"), F.asc("chunk"))
            .limit(first_batch_chunks + 1)
            .collect()
        )
    if not top_bounds:
        return _local_result(spark, [])
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
    # prefix_const is uniform, so adding it AFTER tau pruning and the
    # sort cannot reorder or change membership
    page = [
        (d, s + prefix_const, i + 1)
        for i, (d, s) in enumerate(merged[:n_keep])
        if i + 1 > offset
    ]
    return _local_result(spark, page)


MATCH_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType())])


def _make_chunk_matcher(
    branches: tuple[ParsedQuery, ...],
    filter_active: bool,
    codec_name: str = "varint",
):
    """applyInPandas / cogroup kernel for the boolean match set: emit EVERY
    doc in the chunk satisfying the query (any `|` branch) — no scoring,
    no truncation. Decode + candidate logic shared with the scoring kernel
    (_decode_chunk_lists / candidate_ids), so match semantics are identical
    by construction."""
    pos_set = frozenset(t for br in branches for t in br.terms)
    has_phrases = any(br.phrases or br.neg_phrases for br in branches)
    phrase_terms = frozenset(
        t
        for br in branches
        for ph in (br.phrases + br.neg_phrases)
        for t in ph
    )
    # dls decode only to bound the phrase-key stride P; term-only queries
    # never touch dls_bin
    score_terms = pos_set if has_phrases else frozenset()
    codec = get_codec(codec_name)
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})

    def match_chunk(pdf: pd.DataFrame, aux: pd.DataFrame | None = None) -> pd.DataFrame:
        if len(pdf) == 0:
            return empty
        tomb_ids, tomb_gens, allow_ids = _aux_arrays(aux)
        if filter_active and allow_ids is None:
            return empty  # filter active, nothing allowed in this chunk
        seen = set(pdf["term"])
        viable = [
            br
            for br in branches
            if all(t in seen for t in br.terms)
            and all(t in seen for ph in br.phrases for t in ph)
        ]
        if not viable:
            return empty
        lists = _decode_chunk_lists(
            pdf, tomb_ids, tomb_gens, score_terms, phrase_terms, codec
        )
        if len(viable) == 1:
            ids = candidate_ids(viable[0], lists, allow_ids)
        else:
            ids = np.unique(
                np.concatenate(
                    [candidate_ids(br, lists, allow_ids) for br in viable]
                )
            )
        return pd.DataFrame({"doc_id": ids})

    return match_chunk


def match_docs(
    index: IndexReader,
    query_text: str,
    filter_docs: DataFrame | None = None,
    pq: ParsedQuery | None = None,
) -> DataFrame:
    """Boolean AND-of-terms match set over the index: every live doc
    satisfying the query, as a lazy DataFrame of doc_id — no scoring, no
    top-k, no limit, nothing collected to the driver.

    This is the operator behind an *unlimited* cardsearch context: the
    reference ANDs the card-scoped query into the value query as an
    unbounded bool filter (trovesearch_denorm.py:838-859), so valuesearch
    counts must see EVERY matching card, not a top-k page. The result is a
    semi-join plan — compose it with groupBy/aggregate stages downstream.

    Scale shape: one metadata-free job; chunks prune conjunctively (all
    positive terms must appear in the chunk) before any posting bytes
    decode, term stats are never needed (no idf), and the match set stays
    distributed end to end.
    """
    if pq is not None:
        branches = (pq,)
    else:
        branches = parse_disjunction(query_text, index.analyzer)
    validate_branches(branches)
    if len(branches) == 1:
        pq = branches[0]
        if not pq.terms and not pq.const_clauses:
            raise ValueError("query has no positive terms")
        if pq.prefixes or pq.neg_prefixes or pq.fuzzies or pq.neg_fuzzies:
            filter_docs = prefix_doc_filter(index, pq, filter_docs)
        if not pq.terms:
            # prefix-only: the folded filter set IS the match set (boolean
            # semantics — no scoring, so no constant to carry); negated
            # terms/phrases still subtract
            from .bm25 import _phrase_filter, live_postings

            base = filter_docs.select("doc_id")
            if pq.neg_terms:
                neg = (
                    live_postings(index, list(pq.neg_terms))
                    .select("doc_id")
                    .distinct()
                )
                base = base.join(neg, "doc_id", "left_anti")
            return _phrase_filter(index, base, pq)
    has_phrases = any(br.phrases or br.neg_phrases for br in branches)
    phrase_terms = [
        t
        for br in branches
        for ph in (br.phrases + br.neg_phrases)
        for t in ph
    ]
    all_terms = list(
        dict.fromkeys(
            tuple(t for br in branches for t in br.terms)
            + tuple(t for br in branches for t in br.neg_terms)
            + tuple(phrase_terms)
        )
    )

    cols = ["term", "chunk", "first_doc", "n", "docs_bin", "tfs_bin", "gen"]
    if has_phrases:
        cols += ["dls_bin", "pos_bin"]  # read only when a phrase needs them
    blocks = index.postings(interactive=True).filter(F.col("term").isin(all_terms)).select(*cols)

    aux = _aux_frames(index, filter_docs)
    n_buckets = max(
        32, index.spark.sparkContext.defaultParallelism * 2
    )
    matcher = _bucketed_kernel(
        _make_chunk_matcher(
            branches, filter_docs is not None, index.postings_codec
        ),
        _EMPTY_MATCH,
    )
    if aux is None:
        return _chunk_partitioned(blocks, matcher, MATCH_SCHEMA)
    return (
        _with_bucket(blocks, n_buckets).groupBy("_bucket")
        .cogroup(_with_bucket(aux, n_buckets).groupBy("_bucket"))
        .applyInPandas(
            lambda left, right: matcher(left, right), schema=MATCH_SCHEMA
        )
    )
