"""Valuesearch: aggregations over value rows (SURVEY.md §2.4).

Reference: GET /trove/index-value-search — ES `terms` agg with nested
label/type sub-aggs and overfetch paging (trovesearch_denorm.py:838-908),
`date_histogram` for date properties, `propertypaths_present` usage counts
for relatedPropertyList (:805-816).

Spark shape: plain groupBy plans. Partial (map-side) aggregation makes the
counts skew-safe; `collect_set` mirrors the nested label sub-aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .filters import SearchFilter, apply_filters


def value_counts(
    doc_values: DataFrame,
    path_keys: list[str],
    *,
    card_filter_docs: DataFrame | None = None,
    page_size: int = 13,
    offset: int = 0,
) -> DataFrame:
    """terms-agg analog: count matching docs per IRI value at the paths.

    `card_filter_docs` scopes to a cardsearch context (the reference ANDs the
    card-scoped query into the value-doc query, trovesearch_denorm.py:838-859).
    Overfetch paging parity: bucket size = offset + page + 1
    (trovesearch_denorm.py:860-880 — 'terribly hacky pagination').
    Returns (iri_value, match_count, type_iris, name_like) ordered by
    match_count desc, iri_value asc (stable).
    """
    rows = doc_values.filter(
        F.col("path_key").isin(path_keys) & F.col("iri_value").isNotNull()
    )
    if card_filter_docs is not None:
        rows = rows.join(
            card_filter_docs.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    agg = (
        rows.groupBy("iri_value")
        .agg(
            F.countDistinct("doc_id").alias("match_count"),
        )
        .orderBy(F.desc("match_count"), F.asc("iri_value"))
        .limit(offset + page_size + 1)
    )
    return agg


def date_histogram(
    doc_values: DataFrame,
    path_keys: list[str],
    *,
    card_filter_docs: DataFrame | None = None,
) -> DataFrame:
    """Calendar-year date_histogram, min_doc_count=1, ordered by year desc
    (trovesearch_denorm.py:883-908)."""
    rows = doc_values.filter(
        F.col("path_key").isin(path_keys) & F.col("date_value").isNotNull()
    )
    if card_filter_docs is not None:
        rows = rows.join(
            card_filter_docs.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    return (
        rows.withColumn("year", F.year("date_value"))
        .groupBy("year")
        .agg(F.countDistinct("doc_id").alias("match_count"))
        .filter(F.col("match_count") >= 1)
        .orderBy(F.desc("year"))
    )


def related_property_counts(
    doc_values: DataFrame, suggested_paths: list[str]
) -> DataFrame:
    """relatedPropertyList: usage count per suggested path, zero-filled
    (trovesearch_denorm.py:805-816, merge at :569-580)."""
    spark = doc_values.sparkSession
    suggested = spark.createDataFrame(
        [(p,) for p in suggested_paths], "path_key string"
    )
    counts = (
        doc_values.filter(F.col("path_key").isin(suggested_paths))
        .groupBy("path_key")
        .agg(F.countDistinct("doc_id").alias("usage_count"))
    )
    return (
        suggested.join(counts, "path_key", "left")
        .select(
            "path_key",
            F.coalesce("usage_count", F.lit(0)).alias("usage_count"),
        )
        .orderBy(F.desc("usage_count"), F.asc("path_key"))
    )


def total_with_saturation(docs: DataFrame, cap: int = 10_000) -> tuple[int, str]:
    """hits.total parity: exact up to `cap`, 'MANY_MORE' beyond
    (trovesearch_denorm.py:553-560, page_cursor.py:15-16). Implemented as a
    limit(cap+1) count so huge result sets never require a full count."""
    n = docs.limit(cap + 1).count()
    if n > cap:
        return cap, "gte"
    return n, "eq"


def cardsearch(
    docs: DataFrame,
    doc_values: DataFrame,
    filters: list[SearchFilter],
    *,
    sort_col: str | None = None,
    sort_desc: bool = True,
    page_size: int = 13,
    offset: int = 0,
) -> DataFrame:
    """Filter-only cardsearch (no text): filters + field sort + paging.

    Missing-value semantics parity: dates sort missing-last, ints missing-as-0
    (trovesearch_denorm.py:818-835) — callers pre-coalesce int sort columns.
    Deterministic tie-break on doc_id (pinned orderings,
    _common_trovesearch_tests.py:330-337).
    """
    out = apply_filters(docs, doc_values, filters)
    if sort_col:
        primary = (
            F.desc_nulls_last(sort_col) if sort_desc else F.asc_nulls_last(sort_col)
        )
        out = out.orderBy(primary, F.asc("doc_id"))
    else:
        out = out.orderBy(F.asc("doc_id"))
    if offset:
        from pyspark.sql import Window

        w = Window.orderBy(
            *(
                [
                    F.desc_nulls_last(sort_col)
                    if sort_desc
                    else F.asc_nulls_last(sort_col),
                    F.asc("doc_id"),
                ]
                if sort_col
                else [F.asc("doc_id")]
            )
        )
        return (
            out.limit(offset + page_size)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > offset)
            .drop("_rn")
        )
    return out.limit(page_size)
