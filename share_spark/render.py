"""Result renderers — the reference's outbound serialization surface.

Reference: trove/render/__init__.py:19-37 registers jsonapi / jsonld /
turtle / html / csv / tsv / rss / atom renderers. Here the engine-relevant
subset (machine formats) renders a result DataFrame; the row-graph assembly
of JSON:API is simplified to its data shape.

CSV parity details (trove/render/trovesearch_csv.py):
- multivalue cells joined with ' ; '  (:37-38)
- value-key preference order ('@value','@id','name','prefLabel','label')
  when rendering nested objects (:114-129) — here: first non-null of the
  equivalent columns.
"""

from __future__ import annotations

import csv
import io
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MULTIVALUE_JOIN = " ; "  # trove/render/trovesearch_csv.py:37-38
VALUE_KEY_PREFERENCE = ("@value", "@id", "name", "prefLabel", "label")


def to_csv_rows(df: DataFrame, limit: int | None = None) -> Iterator[str]:
    """Streaming CSV rendering: header + rows; arrays joined with ' ; '.

    Streams via toLocalIterator — only one partition's rows are resident on
    the driver at a time (the reference's streaming renderer analog,
    trove/render/_base.py + trovesearch_csv.py:57-65)."""
    cols = df.columns
    out_df = df.select(
        *[
            F.array_join(F.col(c).cast("array<string>"), MULTIVALUE_JOIN).alias(c)
            if df.schema[c].dataType.typeName() == "array"
            else F.col(c)
            for c in cols
        ]
    )
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(cols)
    yield buf.getvalue()
    it = out_df.toLocalIterator()
    n = 0
    for row in it:
        buf = io.StringIO()
        csv.writer(buf).writerow([row[c] for c in cols])
        yield buf.getvalue()
        n += 1
        if limit is not None and n >= limit:
            break


def to_csv(df: DataFrame, limit: int | None = None) -> str:
    return "".join(to_csv_rows(df, limit))


def to_tsv(df: DataFrame, limit: int | None = None) -> str:
    cols = df.columns
    lines = ["\t".join(cols)]
    for row in df.toLocalIterator():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, list):
                v = MULTIVALUE_JOIN.join(str(x) for x in v)
            vals.append("" if v is None else str(v))
        lines.append("\t".join(vals))
        if limit is not None and len(lines) - 1 >= limit:
            break
    return "\n".join(lines) + "\n"


def to_jsonapi(
    df: DataFrame,
    resource_type: str,
    id_col: str,
    total: int | None = None,
    total_relation: str = "eq",
    limit: int | None = None,
) -> dict:
    """JSON:API-shaped document: {data: [{type, id, attributes}], meta}.

    (Shape parity with trove/render/jsonapi; the reference's full gathering
    graph is out of scope — attributes are the result columns.)"""
    rows = df.limit(limit).collect() if limit else df.collect()
    data = []
    for r in rows:
        attrs = {c: r[c] for c in df.columns if c != id_col}
        data.append(
            {
                "type": resource_type,
                "id": str(r[id_col]),
                "attributes": json.loads(json.dumps(attrs, default=str)),
            }
        )
    doc: dict = {"data": data}
    if total is not None:
        doc["meta"] = {"total": total, "totalRelation": total_relation}
    return doc


def to_jsonl(df: DataFrame, limit: int | None = None) -> Iterator[str]:
    """Newline-delimited JSON (the bulk-export shape)."""
    n = 0
    for row in df.toLocalIterator():
        yield json.dumps(row.asDict(recursive=True), default=str)
        n += 1
        if limit is not None and n >= limit:
            break


def pick_preferred_value(obj: dict) -> object:
    """Value-key preference for nested objects
    (trove/render/trovesearch_csv.py:114-129)."""
    for k in VALUE_KEY_PREFERENCE:
        if k in obj and obj[k] not in (None, ""):
            return obj[k]
    return None
