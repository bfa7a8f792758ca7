"""Structured search filter compiler over long-format value rows.

Reference semantics (SURVEY.md §2.2; trove/trovesearch/search_params.py:190-305
for parsing, share/search/index_strategy/trovesearch_denorm.py:629-723 for the
ES bool query):

- a filter = (propertypath(s), operator, value set)
- ANY_OF: doc matches if ANY of the values appears at ANY of the paths
  (OR across paths, OR across values) — after suffuniq IRI normalization
- NONE_OF: negation of ANY_OF (ES must_not)
- IS_PRESENT / IS_ABSENT: path has / doesn't have any value
- BEFORE / AFTER / AT_DATE: date compare with granularity rounding —
  '1999' = year, '1999-12' = month, '1999-12-31' = day
  (trovesearch_denorm.py:696-716,921-929)
- filters combine with AND (ES bool filter context)

Spark shape: every filter compiles to a semi/anti join of the doc set against
matching value rows — exactly the decomposition the reference's ES bool query
performs inside one Lucene index. Long-format `doc_values` keeps path_key as
data (not dynamic columns), so predicate pushdown applies (SURVEY.md §1.3).

The long table schema (FIXTURES.md §2):
  (doc_id long, path_key string, depth int, value_type string,
   iri_value string, text_value string, date_value date, int_value long)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..iri import suffuniq_col, suffuniq_iri

ANY_OF = "any-of"
NONE_OF = "none-of"
IS_PRESENT = "is-present"
IS_ABSENT = "is-absent"
BEFORE = "before"
AFTER = "after"
AT_DATE = "at-date"

_OPS = {ANY_OF, NONE_OF, IS_PRESENT, IS_ABSENT, BEFORE, AFTER, AT_DATE}


@dataclass(frozen=True)
class SearchFilter:
    """Frozen filter param (analog of search_params.SearchFilter)."""

    paths: tuple[str, ...]  # path_key values; ("*", depth) globs via depth
    op: str
    values: tuple[str, ...] = field(default_factory=tuple)
    glob_depth: int | None = None  # when set, match any path of this depth

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"unknown filter op: {self.op}")


def _path_pred(f: SearchFilter) -> Column:
    if f.glob_depth is not None:
        # '*' glob: any path of that depth (trovesearch_denorm.py:437-444 —
        # the depth-derived column replaces duplicated by-depth storage)
        return F.col("depth") == f.glob_depth
    return F.col("path_key").isin(list(f.paths))


def _date_granularity_bounds(value: str) -> tuple[date, date]:
    """'1999' / '1999-12' / '1999-12-31' -> [start, end) at that granularity
    (the ES date-math `||/y` rounding, trovesearch_denorm.py:921-929)."""
    parts = value.split("-")
    if len(parts) == 1:
        y = int(parts[0])
        return date(y, 1, 1), date(y + 1, 1, 1)
    if len(parts) == 2:
        y, m = int(parts[0]), int(parts[1])
        return (date(y, m, 1), date(y + 1, 1, 1) if m == 12 else date(y, m + 1, 1))
    y, m, d = int(parts[0]), int(parts[1]), int(parts[2])
    nxt = date.fromordinal(date(y, m, d).toordinal() + 1)
    return date(y, m, d), nxt


def matching_doc_ids(
    doc_values: DataFrame,
    f: SearchFilter,
    *,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Keys having a value row that satisfies the filter's match side.

    `key_cols` picks the match unit: ("doc_id",) for the cardsearch plane;
    ("doc_id", "value_iri") for the valuesearch plane, where the reference's
    match unit is the (card, iri_value) pair document
    (trovesearch_denorm.py:365-370 build_valuesearch_docs)."""
    rows = doc_values.filter(_path_pred(f))
    if f.op in (ANY_OF, NONE_OF):
        # suffuniq at BOTH sides (index- and query-time), so stored variants
        # (trailing slash, scheme) and query variants collide —
        # trove/util/iris.py:31-113 applied symmetrically
        vals = [suffuniq_iri(v) for v in f.values]
        rows = rows.filter(suffuniq_col(F.col("iri_value")).isin(vals))
    elif f.op in (IS_PRESENT, IS_ABSENT):
        pass  # any row at the path counts
    else:  # date ops
        # multi-value semantics: BEFORE takes min, AFTER takes max
        # (trovesearch_denorm.py:704-708)
        if f.op == BEFORE:
            bound, _ = _date_granularity_bounds(min(f.values))
            rows = rows.filter(F.col("date_value") < F.lit(bound))
        elif f.op == AFTER:
            _, bound = _date_granularity_bounds(max(f.values))
            rows = rows.filter(F.col("date_value") >= F.lit(bound))
        else:  # AT_DATE: any of the values' granularity ranges (OR)
            cond = F.lit(False)
            for v in f.values:
                lo, hi = _date_granularity_bounds(v)
                cond = cond | (
                    (F.col("date_value") >= F.lit(lo))
                    & (F.col("date_value") < F.lit(hi))
                )
            rows = rows.filter(cond)
    return rows.select(*key_cols).distinct()


def apply_filters(
    docs: DataFrame,
    doc_values: DataFrame,
    filters: list[SearchFilter],
    *,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """AND-combine filters: each is a left_semi (match) or left_anti
    (NONE_OF / IS_ABSENT) join against matching value-row keys.

    At scale: matching-id sets are usually small (filters are selective) —
    Catalyst broadcasts them under the auto-broadcast threshold; AQE converts
    to broadcast at runtime otherwise.
    """
    out = docs
    for f in filters:
        ids = matching_doc_ids(doc_values, f, key_cols=key_cols)
        how = "left_anti" if f.op in (NONE_OF, IS_ABSENT) else "left_semi"
        out = out.join(ids, list(key_cols), how)
    return out


def synonym_filter(
    docs: DataFrame, synonyms: DataFrame, iris: list[str]
) -> DataFrame:
    """sameAs special case (trovesearch_denorm.py:687-689): match against the
    focus-iri + owl:sameAs closure, suffuniq'd. `synonyms` is long format
    (doc_id, synonym_iri)."""
    vals = [suffuniq_iri(v) for v in iris]
    ids = (
        synonyms.filter(suffuniq_col(F.col("synonym_iri")).isin(vals))
        .select("doc_id")
        .distinct()
    )
    return docs.join(ids, "doc_id", "left_semi")
