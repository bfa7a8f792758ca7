"""Source-unique-identifier (suid) backcompat + the doc-build skip predicate.

Reference:
- share/models/source_unique_identifier.py:22-51 —
  get_backcompat_sharev2_suid (the 'v2_push' twin with the same identifier
  and source) and has_forecompat_replacement (a v2_push suid is obsolete
  once a transformer-less successor exists for the same identifier+source).
- share/search/index_strategy/trovesearch_denorm.py:349-356 — a card is
  skipped at doc-build time when its suid has a forecompat replacement, or
  when it has no name/title/label value.

Spark shape: the per-row ORM lookups become two self-joins on
(identifier, source_id) over the suids dimension — computed ONCE for the
whole batch instead of one query per record. The suids/source_configs
tables are dimensions (small next to the corpus): Catalyst broadcasts them,
so the skip predicate adds no shuffle of the page stream.

Schemas:
  suids(suid_id long, identifier string, source_config_id long)
  source_configs(source_config_id long, source_id long,
                 transformer_key string nullable)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_config(suids: DataFrame, source_configs: DataFrame) -> DataFrame:
    return suids.join(F.broadcast(source_configs), "source_config_id")


def backcompat_suid_ids(
    suids: DataFrame, source_configs: DataFrame
) -> DataFrame:
    """(suid_id, backcompat_suid_id): each suid's equivalent 'v2_push' suid
    (same identifier, same source) — source_unique_identifier.py:22-37.
    Suids without a v2_push twin are absent (the DoesNotExist analog)."""
    s = _with_config(suids, source_configs).select(
        "suid_id", "identifier", "source_id"
    )
    v2 = (
        _with_config(suids, source_configs)
        .filter(F.col("transformer_key") == "v2_push")
        .select(
            F.col("suid_id").alias("backcompat_suid_id"),
            "identifier",
            "source_id",
        )
    )
    return s.join(v2, ["identifier", "source_id"]).select(
        "suid_id", "backcompat_suid_id"
    )


def forecompat_replaced_suid_ids(
    suids: DataFrame, source_configs: DataFrame
) -> DataFrame:
    """suid_ids whose card is obsolete: the suid is 'v2_push' and a
    transformer-less suid exists for the same (identifier, source)
    (source_unique_identifier.py:39-51)."""
    s = _with_config(suids, source_configs)
    v2 = s.filter(F.col("transformer_key") == "v2_push").select(
        "suid_id", "identifier", "source_id"
    )
    successors = s.filter(F.col("transformer_key").isNull()).select(
        "identifier", "source_id"
    ).distinct()
    return v2.join(successors, ["identifier", "source_id"], "left_semi").select(
        "suid_id"
    )


NAMELIKE_PATH_KEYS = (
    # osfmap.NAMELIKE_PROPERTIES analog: title / name / label
    '["dcterms:title"]',
    '["foaf:name"]',
    '["rdfs:label"]',
    '["skos:prefLabel"]',
)


def filter_buildable(
    docs: DataFrame,
    doc_values: DataFrame,
    *,
    suids: DataFrame | None = None,
    source_configs: DataFrame | None = None,
    suid_col: str = "suid_id",
    namelike_path_keys: tuple[str, ...] = NAMELIKE_PATH_KEYS,
) -> DataFrame:
    """The doc-build skip predicate (trovesearch_denorm.py:349-356): keep
    docs that (a) have some name-like value and (b) are not forecompat-
    replaced. Both checks are anti/semi joins evaluated once per batch."""
    named = (
        doc_values.filter(
            F.col("path_key").isin(list(namelike_path_keys))
            & (F.col("text_value").isNotNull() | F.col("iri_value").isNotNull())
        )
        .select("doc_id")
        .distinct()
    )
    out = docs.join(named, "doc_id", "left_semi")
    if suids is not None and source_configs is not None and suid_col in docs.columns:
        dead = forecompat_replaced_suid_ids(suids, source_configs)
        out = out.join(
            dead.withColumnRenamed("suid_id", suid_col), suid_col, "left_anti"
        )
    return out
