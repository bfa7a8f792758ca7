"""Distributed connected components + canonical-document selection.

The dedup pipeline's end stage: LSH/SimHash/cosine pair generators emit
*edges* (doc_a, doc_b); training-data curation needs *clusters* (every doc
labeled with its duplicate group) and a *keep list* (one canonical doc per
group).  The reference stops at pairwise suggestions (its dedup is
SHARE-side identifier matching, share/models/ingest.py suid uniqueness);
the cluster/keep stage is the standard large-corpus extension.

Algorithm: min-label propagation with pointer jumping (path doubling) —
the public "hash-to-min" scheme (Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds", ICDE 2013).  Every step
is a groupBy-min or an equi-join, so partial (map-side) aggregation
collapses hub nodes' fan-in before the shuffle and no collect_list ever
materializes a neighborhood on one task.  Pointer jumping doubles the
propagation horizon per round, so convergence is O(log diameter) rounds,
not O(diameter) — at 10^12 docs a pathological chain still resolves in
~40 rounds, and realistic near-dup clusters (diameter <= 4) in 2-3.

Scale notes:
  - each round is 2 shuffles (neighbor-min groupBy + label self-join),
    both keyed on doc ids — uniform, no term-frequency skew;
  - lineage is truncated with localCheckpoint every round, or the plan
    would double per iteration and the driver would OOM on plan size
    long before data size mattered;
  - convergence is detected with a count() of changed labels — one cheap
    action per round on an already-materialized (checkpointed) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 40,
) -> DataFrame:
    """(doc_id, cluster_id): every vertex of `edges` labeled with the
    MINIMUM doc_id reachable from it (the canonical component id).

    Only vertices that appear in an edge are returned — callers join the
    full doc set back with a left join (absent => singleton cluster of
    itself); see canonical_docs.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.where(F.col("u") != F.col("v")).distinct().localCheckpoint()

    # init: lab(u) = min(u, min neighbor) — one groupBy, partial-agg safe
    labels = e.groupBy("u").agg(
        F.least(F.first("u"), F.min("v")).alias("lab")
    ).localCheckpoint()

    for _ in range(max_iter):
        # propagate: lab(u) <- min(lab(u), min over (u,v) of lab(v))
        nbr = (
            e.join(
                labels.select(
                    F.col("u").alias("v"), F.col("lab").alias("vlab")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlab").alias("nlab"))
        )
        stepped = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
                ).alias("lab"),
            )
        )
        # pointer jumping: lab(u) <- min(lab(u), lab(lab(u)))
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("u").alias("lab"), F.col("lab").alias("lablab")
                ).alias("b"),
                "lab",
                "left",
            )
            .select(
                "u",
                F.least(
                    F.col("lab"), F.coalesce(F.col("lablab"), F.col("lab"))
                ).alias("lab"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    else:
        # never return partially-converged (wrong) labels: with pointer
        # jumping convergence is O(log diameter) rounds, so hitting this
        # means a pathological graph or a too-small max_iter — fail loudly
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            f"rounds ({changed} labels still changing); raise max_iter"
        )

    return labels.select(
        F.col("u").alias("doc_id"), F.col("lab").alias("cluster_id")
    )


def canonical_docs(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    prefer_col: str | None = None,
) -> DataFrame:
    """Keep-list: (doc_id, cluster_id, keep) over ALL docs.

    Docs absent from `clusters` are singletons (cluster_id = own id,
    keep = true).  Within a cluster the canonical doc is the one with the
    greatest `prefer_col` (e.g. a quality score), doc_id ascending as the
    deterministic tie-break; with no prefer_col, the minimum doc_id wins
    (== the cluster_id itself, by construction of connected_components).

    Shape: cluster-keyed groupBy aggregations only — partial-aggregated,
    no window over the full corpus.  Works for ANY orderable doc-id type
    (long, string, ...): the winner is picked as "max preference, then
    min doc_id among the tied", expressed as two groupBys instead of a
    single max_by over a mixed-direction struct (which would need id
    negation and therefore a numeric id).
    """
    ids = docs.select(F.col(id_col).alias("doc_id"), *(
        [F.col(prefer_col).alias("_pref")] if prefer_col else []
    ))
    labeled = ids.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        *([F.col("_pref")] if prefer_col else []),
    )
    if prefer_col:
        # stage 1: per-cluster best preference (max ignores nulls; a
        # cluster whose prefs are ALL null gets _maxp = null, matched
        # below with eqNullSafe so it still elects a winner by min id)
        maxp = labeled.groupBy("cluster_id").agg(
            F.max("_pref").alias("_maxp")
        )
        # stage 2: min doc_id among the rows tied at the best preference
        winners = (
            labeled.join(maxp, "cluster_id")
            .where(F.col("_pref").eqNullSafe(F.col("_maxp")))
            .groupBy("cluster_id")
            .agg(F.min("doc_id").alias("keep_id"))
        )
    else:
        winners = labeled.groupBy("cluster_id").agg(
            F.min("doc_id").alias("keep_id")
        )
    return (
        labeled.join(winners, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("keep_id")).alias("keep"),
        )
    )
