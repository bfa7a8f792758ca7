"""Turtle-subset RDF extraction + graph walk -> long-format doc_values rows.

Reference shape:
- extraction: trove/extract/turtle.py:6-8 parses turtle into a tripledict
  (primitive_metadata); here a from-scratch deterministic parser for the
  Turtle subset the pipeline actually stores (@prefix, IRIs, prefixed names,
  'a', string/integer literals with @lang / ^^datatype, labeled blank nodes,
  ';' ',' '.' punctuation).
- walk: share/search/index_strategy/_trovesearch_util.py:111-237 GraphWalk —
  from the focus iri, IRI objects are walked recursively (acyclic, visiting
  set); literal values are kept only adjacent to the focus (depth 1) unless
  the path is in `extra_literal_paths`; predicates in `skippable_properties`
  prune the walk; predicates in `date_properties` force date parsing of
  their literals (the osfmap.is_date_property analog,
  _trovesearch_util.py:147-158).
- denorm: the card x value explode of trovesearch_denorm.py:364-370 becomes
  long-format (doc_id, path_key, depth, value_type, ...) rows produced by a
  mapInPandas over (doc_id, focus_iri, turtle) — the same schema
  query/filters.py compiles against, derived instead of fixture-built.

Parsing is per-document Python (as is the reference's rdflib parse) and runs
once at ingest; everything downstream of the long table is JVM-side.
"""

from __future__ import annotations

import datetime
import json
import re
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_TOKEN_RE = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<at_prefix>@prefix\b)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtype>\^\^)
    | (?P<punct>[;,.\[\]])
    | (?P<blank>_:[\w-]+)
    | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<plocal>[\w.-]*)
    | (?P<kw_a>\ba\b)
    | (?P<num>[+-]?\d+)
    | (?P<ws>\s+)
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


@dataclass(frozen=True)
class Literal:
    value: str
    datatype: str | None = None
    lang: str | None = None


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(_ESCAPES.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def parse_turtle(text: str) -> tuple[dict, dict]:
    """Turtle subset -> (tripledict, prefixes).

    tripledict: {subject_iri: {predicate_iri: set(obj)}} where obj is a str
    (IRI or '_:label' blank) or a Literal. Deterministic; raises ValueError
    on tokens outside the subset.
    """
    prefixes: dict[str, str] = {}
    triples: dict[str, dict[str, set]] = {}

    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"turtle parse error at {pos}: {text[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if m.group("pname") is not None or (
            m.group("plocal") is not None and ":" in m.group(0)
        ):
            val = m.group(0)
            # a pname may not end with '.': 'pfx:local.' is local + the
            # statement terminator (turtle PN_LOCAL grammar)
            n_dots = len(val) - len(val.rstrip("."))
            toks.append(("pref", val.rstrip(".")))
            toks.extend([("punct", ".")] * n_dots)
        else:
            toks.append((kind, m.group(0)))

    def resolve(tok):
        kind, val = tok
        if kind == "iri":
            return val[1:-1]
        if kind == "pref":
            pfx, _, local = val.partition(":")
            if pfx not in prefixes:
                raise ValueError(f"unknown prefix: {pfx}")
            return prefixes[pfx] + local
        if kind == "blank":
            return val
        if kind == "kw_a":
            return RDF_TYPE
        raise ValueError(f"expected IRI-ish token, got {tok}")

    i = 0
    n = len(toks)

    class _Toks:
        def __getitem__(self, idx):
            if idx >= n:
                raise ValueError("unexpected end of turtle input")
            return toks[idx]

    toks_safe = _Toks()

    def expect(kind):
        nonlocal i
        if i >= n or toks[i][0] != kind:
            raise ValueError(f"expected {kind} at token {i}: {toks[i:i+2]}")
        v = toks[i][1]
        i += 1
        return v

    while i < n:
        if toks[i][0] == "at_prefix":
            i += 1
            pname = expect("pref")
            iri = expect("iri")[1:-1]
            if toks_safe[i][1] != ".":
                raise ValueError("expected '.' after @prefix")
            i += 1
            prefixes[pname.rstrip(":")] = iri
            continue
        subj = resolve(toks_safe[i])
        i += 1
        while True:
            pred = resolve(toks_safe[i])
            i += 1
            while True:
                kind, val = toks_safe[i]
                if kind == "literal":
                    i += 1
                    lit_val = _unescape(val[1:-1])
                    dtype = lang = None
                    if i < n and toks_safe[i][0] == "langtag":
                        lang = toks_safe[i][1][1:]
                        i += 1
                    elif i < n and toks_safe[i][0] == "dtype":
                        i += 1
                        dtype = resolve(toks_safe[i])
                        i += 1
                    obj: object = Literal(lit_val, dtype, lang)
                elif kind == "num":
                    i += 1
                    obj = Literal(val, XSD + "integer", None)
                else:
                    obj = resolve(toks_safe[i])
                    i += 1
                triples.setdefault(subj, {}).setdefault(pred, set()).add(obj)
                if toks_safe[i][1] == ",":
                    i += 1
                    continue
                break
            if toks_safe[i][1] == ";":
                i += 1
                if toks_safe[i][1] == ".":  # trailing ';' before '.'
                    break
                continue
            break
        if toks_safe[i][1] != ".":
            raise ValueError(f"expected '.' at token {i}")
        i += 1
    return triples, prefixes


def walk_tripledict(
    tripledict: dict,
    focus_iri: str,
    *,
    skippable_properties: frozenset[str] = frozenset(),
    extra_literal_paths: frozenset[tuple[str, ...]] = frozenset(),
    date_properties: frozenset[str] = frozenset(),
    blocked: frozenset[str] = frozenset(),
) -> Iterator[tuple[tuple[str, ...], object]]:
    """GraphWalk parity (_trovesearch_util.py:200-237): yield (path, value)
    for every reachable object; IRIs recurse (acyclic), literals only when
    "close to" the focus or on extra paths; `date_properties` literals parse
    as dates.

    "Close to focus" means no IRI-IDENTIFIED resource along the path —
    blank nodes do not break closeness (the reference's walk_twoples inlines
    blanknode objects, so a literal behind a focus-attached blanknode keeps
    close_to_focus=True, _trovesearch_util.py:177-190,204-221 — the
    supplementary-description integer-sort shape depends on this).

    `blocked` seeds the visiting set — shortwalk_from semantics
    (_trovesearch_util.py:170-175: a walk from a value IRI that never
    re-enters the card focus)."""
    visiting: set[str] = set(blocked)

    def _walk(iri: str, path_so_far: tuple[str, ...], close: bool):
        if iri in visiting:
            return
        visiting.add(iri)
        try:
            for pred, objs in tripledict.get(iri, {}).items():
                if pred in skippable_properties:
                    continue
                path = (*path_so_far, pred)
                for obj in sorted(objs, key=_obj_sort_key):
                    if isinstance(obj, str):
                        yield (path, obj)
                        yield from _walk(obj, path, close and obj.startswith("_:"))
                    elif close or path in extra_literal_paths:
                        yield (path, obj)
        finally:
            visiting.discard(iri)

    for path, obj in _walk(focus_iri, (), True):
        if isinstance(obj, Literal) and (
            path[-1] in date_properties
            or (obj.datatype == XSD + "date")
        ):
            try:
                yield (path, datetime.date.fromisoformat(obj.value[:10]))
            except ValueError:
                continue  # malformatted date: skipped, like the reference
        elif isinstance(obj, Literal) and obj.datatype == XSD + "integer":
            yield (path, int(obj.value))
        else:
            yield (path, obj)


def _obj_sort_key(obj) -> str:
    return obj.value if isinstance(obj, Literal) else str(obj)


DOC_VALUES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("path_key", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("value_type", T.StringType()),
        T.StructField("iri_value", T.StringType()),
        T.StructField("text_value", T.StringType()),
        T.StructField("date_value", T.DateType()),
        T.StructField("int_value", T.LongType()),
    ]
)


def shorthand(iri: str, prefixes: dict[str, str]) -> str:
    for pfx, base in prefixes.items():
        if iri.startswith(base):
            return f"{pfx}:{iri[len(base):]}"
    return iri


def extract_doc_values(
    docs: DataFrame,
    *,
    turtle_col: str = "turtle",
    focus_col: str = "focus_iri",
    date_properties: frozenset[str] = frozenset(),
    skippable_properties: frozenset[str] = frozenset(),
) -> DataFrame:
    """(doc_id, focus_iri, turtle) -> long-format doc_values rows (the
    explode-at-build card x value denorm, trovesearch_denorm.py:364-370).

    path_key is the JSON array of prefix-shortened predicates (the
    propertypath_as_keyword form, matching query/filters.py's contract);
    blank-node objects are walked but never emitted as iri values.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, focus, turtle in zip(
                pdf["doc_id"], pdf[focus_col], pdf[turtle_col]
            ):
                td, prefixes = parse_turtle(turtle)
                seen = set()
                for path, obj in walk_tripledict(
                    td,
                    focus,
                    date_properties=date_properties,
                    skippable_properties=skippable_properties,
                ):
                    pk = json.dumps([shorthand(p, prefixes) for p in path])
                    depth = len(path)
                    if isinstance(obj, datetime.date):
                        row = (doc_id, pk, depth, "date", None, None, obj, None)
                    elif isinstance(obj, int):
                        row = (doc_id, pk, depth, "int", None, None, None, obj)
                    elif isinstance(obj, Literal):
                        row = (doc_id, pk, depth, "text", None, obj.value, None, None)
                    elif obj.startswith("_:"):
                        continue  # blank nodes are traversal-only
                    else:
                        row = (doc_id, pk, depth, "iri", obj, None, None, None)
                    if row not in seen:
                        seen.add(row)
                        out.append(row)
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[f.name for f in DOC_VALUES_SCHEMA.fields],
                )

    return docs.mapInPandas(_extract, schema=DOC_VALUES_SCHEMA)


VALUE_VALUES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("value_iri", T.StringType()),
        *DOC_VALUES_SCHEMA.fields[1:],
    ]
)


def extract_value_values(
    docs: DataFrame,
    *,
    turtle_col: str = "turtle",
    focus_col: str = "focus_iri",
    date_properties: frozenset[str] = frozenset(),
    skippable_properties: frozenset[str] = frozenset(),
) -> DataFrame:
    """(doc_id, focus_iri, turtle) -> the VALUESEARCH plane's long rows.

    For every IRI value the card's fullwalk reaches, re-walk from that value
    with the card focus blocked (the shortwalk of trovesearch_denorm.py:
    397-408 `_iri_value_subdoc` / _trovesearch_util.py:170-175) and emit one
    row per (value, path, object) — keyed (doc_id, value_iri), the reference's
    per-(card, value) document unit (build_valuesearch_docs, :365-370).

    The value's rdf:type IRIs, name/title/label texts, and any deeper paths
    all land here; query/valuesearch.py aggregates them into the nested
    sub-agg columns and query/filters.py compiles valueSearchFilter against
    them with key_cols=("doc_id", "value_iri").
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, focus, turtle in zip(
                pdf["doc_id"], pdf[focus_col], pdf[turtle_col]
            ):
                td, prefixes = parse_turtle(turtle)
                value_iris: list[str] = []
                seen_vals: set[str] = set()
                for _path, obj in walk_tripledict(
                    td,
                    focus,
                    date_properties=date_properties,
                    skippable_properties=skippable_properties,
                ):
                    if (
                        isinstance(obj, str)
                        and not obj.startswith("_:")
                        and obj not in seen_vals
                    ):
                        seen_vals.add(obj)
                        value_iris.append(obj)
                for viri in value_iris:
                    seen = set()
                    for path, obj in walk_tripledict(
                        td,
                        viri,
                        date_properties=date_properties,
                        skippable_properties=skippable_properties,
                        blocked=frozenset((focus,)),
                    ):
                        pk = json.dumps([shorthand(p, prefixes) for p in path])
                        depth = len(path)
                        if isinstance(obj, datetime.date):
                            row = (doc_id, viri, pk, depth, "date",
                                   None, None, obj, None)
                        elif isinstance(obj, int):
                            row = (doc_id, viri, pk, depth, "int",
                                   None, None, None, obj)
                        elif isinstance(obj, Literal):
                            row = (doc_id, viri, pk, depth, "text",
                                   None, obj.value, None, None)
                        elif obj.startswith("_:"):
                            continue
                        else:
                            row = (doc_id, viri, pk, depth, "iri",
                                   obj, None, None, None)
                        if row not in seen:
                            seen.add(row)
                            out.append(row)
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[f.name for f in VALUE_VALUES_SCHEMA.fields],
                )

    return docs.mapInPandas(_extract, schema=VALUE_VALUES_SCHEMA)


def merge_supplementary_turtle(
    cards: DataFrame,
    supplements: DataFrame,
    *,
    turtle_col: str = "turtle",
) -> DataFrame:
    """Merge supplementary descriptions into each card's graph BEFORE
    extraction — the as_rdfdoc_with_supplements analog
    (trove/models/resource_description.py:57-63): the indexed doc is the
    union graph of the Latest description plus every current Supplementary
    description, so supplementary values (e.g. the integer-sort-via-
    supplement shape, _common_trovesearch_tests.py:300-322) filter, sort,
    and aggregate like natively-described values.

    `supplements` is (doc_id, turtle). Turtle-level concatenation — main
    description first, then supplements in sorted order for determinism —
    so the graph walk runs over the MERGED tripledict and cross-description
    references resolve exactly like the reference's merged RdfGraph. Blank
    node labels in each supplement are suffixed with a content hash first:
    the reference parses each description separately (labels are scoped
    per-description), so concatenation must not collide '_:b0' across
    descriptions.

    Scale shape: groupBy on the supplements side (bounded by supplement
    count, not corpus size) + one left join on doc_id; AQE broadcasts the
    aggregated side when small.
    """
    sfx = F.conv(
        F.pmod(F.xxhash64(F.col(turtle_col)), F.lit(1 << 40)).cast("string"),
        10, 32,
    )
    relabeled = supplements.withColumn(
        turtle_col,
        F.regexp_replace(
            F.col(turtle_col), F.lit("_:"), F.concat(F.lit("_:s"), sfx, F.lit("x"))
        ),
    )
    supp = relabeled.groupBy("doc_id").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list(turtle_col))).alias("_supp_ttl")
    )
    merged = cards.join(supp, "doc_id", "left")
    return merged.withColumn(
        turtle_col,
        F.when(
            F.col("_supp_ttl").isNotNull(),
            F.concat_ws(" ", F.col(turtle_col), F.col("_supp_ttl")),
        ).otherwise(F.col(turtle_col)),
    ).drop("_supp_ttl")
