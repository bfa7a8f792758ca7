"""Query-string params -> frozen dataclasses -> DataFrame plan.

The reference's querystring surface (trove/trovesearch/search_params.py):

  cardSearchText[=...]            full-text, AND/phrase/negation specials
  cardSearchText[path,...]        text scoped to propertypaths
  cardSearchFilter[path][op]=v,v  structured filters
  sort[=field] / sort=-field      value sort (date/int), desc with '-'
  page[size] / page[cursor]       paging
  valueSearchPropertyPath=...     valuesearch target path
  valueSearchText / valueSearchFilter[...]...

This module parses that surface into CardsearchParams/ValuesearchParams
(frozen, the reference's IR #1, search_params.py:380-501) and compiles them
against an IndexReader + doc_values table into DataFrame plans, reusing
filters.py / bm25.py / wand.py / valuesearch.py / paging.py.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from urllib.parse import parse_qsl

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import IndexReader
from .filters import SearchFilter
from .paging import PageCursor, clamp_page_size
from .valuesearch import date_histogram, value_counts

_FILTER_RE = re.compile(r"^cardSearchFilter\[(.+)\]$")
_VFILTER_RE = re.compile(r"^valueSearchFilter\[(.+)\]$")
_OPS_SET = {
    "any-of", "none-of", "is-present", "is-absent", "before", "after", "at-date",
}
_TEXT_RE = re.compile(r"^(cardSearchText|valueSearchText)(?:\[([^\]]*)\])?$")

DEFAULT_OP = "any-of"


def propertypath_key(path: str) -> str:
    """Dot-delimited shorthand path -> the canonical path_key (the JSON-array
    propertypath_as_keyword form the extractor emits).

    Reference semantics (trove/util/propertypath.py:48-66 parse_propertypath):
    steps split on '.', each step a 'prefix:name' shorthand. Passthrough
    forms: already-canonical '["a", "b"]' paths, plain colon-free names (a
    FieldIndex may key fields by arbitrary strings), and anything
    containing '/' (a full IRI step — dots inside IRIs must not split; the
    reference's shorthand layer has the same assumption in reverse)."""
    if path.startswith("[") or "/" in path:
        return path
    steps = path.split(".")
    if len(steps) == 1 and ":" not in path:
        return path
    if "*" in steps:
        # glob validation is the caller's (all-* handled as glob_depth);
        # a MIXED glob is invalid everywhere
        raise ValueError(
            f"path must be all * or no * (got {path!r}) — "
            "trove/util/propertypath.py:57-64"
        )
    return json.dumps(steps)


@dataclass(frozen=True)
class SortParam:
    field: str
    descending: bool = False


@dataclass(frozen=True)
class CardsearchParams:
    """Frozen IR of a cardsearch request (search_params.py:380-445)."""

    texts: tuple[str, ...] = ()
    text_paths: tuple[str, ...] = ()  # () = all depth-1 text
    filters: tuple[SearchFilter, ...] = ()
    sort: SortParam | None = None
    page_size: int = 13
    cursor: PageCursor | None = None


@dataclass(frozen=True)
class TroveRenderParams:
    """Render-level params (trove/util/trove_params.py:44-117):
    blendCards, iriShorthand[short]=iri, include=path,path,
    fields[TYPE]=path,path (bare fields= means fields[*])."""

    # tri-state: None = blendCards absent from the querystring (renderer
    # keeps its own default), True/False = explicitly requested
    blend_cards: bool | None = None
    iri_shorthand: tuple[tuple[str, str], ...] = ()
    included_relations: tuple[str, ...] = ()
    attrpaths_by_type: tuple[tuple[str, tuple[str, ...]], ...] = ()

    def shorthand_map(self) -> dict[str, str]:
        return dict(self.iri_shorthand)

    def fields_for(self, typename: str) -> tuple[str, ...] | None:
        """Requested attribute paths for a type ('*' applies to any);
        None = no fields restriction."""
        m = dict(self.attrpaths_by_type)
        if typename in m:
            return m[typename]
        if "*" in m:
            return m["*"]
        return None


_SHORTHAND_RE = re.compile(r"^iriShorthand\[([^\]]+)\]$")
_FIELDS_RE = re.compile(r"^fields(?:\[([^\]]*)\])?$")

_TRUTHY = {"", "true", "1", "yes"}  # _qp.get_bool_value: presence is truthy


def parse_render_params(querystring: str) -> TroveRenderParams:
    pairs = parse_qsl(querystring, keep_blank_values=True)
    blend: bool | None = None
    shorthand: list[tuple[str, str]] = []
    include: list[str] = []
    fields: dict[str, list[str]] = {}
    for key, val in pairs:
        if key == "blendCards":
            blend = val.lower() in _TRUTHY
            continue
        sm = _SHORTHAND_RE.match(key)
        if sm:
            shorthand.append((sm.group(1), val))
            continue
        if key == "include":
            include.extend(p for p in val.split(",") if p)
            continue
        fm = _FIELDS_RE.match(key)
        if fm:
            # omitted brackets = fields[*]; brackets may list several types
            typenames = (fm.group(1) or "*").split(",")
            for t in typenames:
                fields.setdefault(t or "*", []).extend(
                    p for p in val.split(",") if p
                )
    return TroveRenderParams(
        blend_cards=blend,
        iri_shorthand=tuple(shorthand),
        included_relations=tuple(include),
        attrpaths_by_type=tuple((t, tuple(v)) for t, v in fields.items()),
    )


@dataclass(frozen=True)
class ValuesearchParams:
    """Frozen IR of a valuesearch request (search_params.py:449-494):
    a cardsearch context plus the value-scoped constraints —
    valueSearchText[path,...] and valueSearchFilter[path][op]."""

    value_path: str = ""
    cardsearch: CardsearchParams = field(default_factory=CardsearchParams)
    page_size: int = 13
    value_texts: tuple[str, ...] = ()
    value_text_paths: tuple[str, ...] = ()  # () = all depth-1 text
    value_filters: tuple[SearchFilter, ...] = ()


def _parse_filters(pairs, regex) -> list[SearchFilter]:
    out = []
    for key, val in pairs:
        m = regex.match(key)
        if not m:
            continue
        inner = m.group(1)
        # the path may itself contain brackets (JSON-encoded propertypaths),
        # so the operator is whatever follows the LAST '][' — and only if it
        # is a known op (search_params.py:190-215 operator set)
        if "][" in inner:
            path, maybe_op = inner.rsplit("][", 1)
            op = maybe_op if maybe_op in _OPS_SET else DEFAULT_OP
            if maybe_op not in _OPS_SET:
                path = inner
        else:
            path, op = inner, DEFAULT_OP
        # propertypath shorthand: comma-separated path segments; multiple
        # paths OR'd with ','-in-brackets is kept simple: one path per param
        # iri values arrive percent-encoded (possibly multiply, via proxies);
        # repeated-decode like the reference's browse view
        # (trove/util/iris.py:154-188, trove/views/browse.py)
        from ..iri import unquote_iri

        values = tuple(
            unquote_iri(v) if "%" in v else v
            for v in val.split(",")
            if v != ""
        )
        glob_depth = None
        if "*" in path and set(path) <= {"*", "."}:
            # glob path: '*' / '*.*' (reference dot form) / legacy '**';
            # depth = number of glob steps
            glob_depth = max(1, path.count("*"))
            paths = ()
        else:
            paths = (propertypath_key(path),)
        out.append(
            SearchFilter(paths=paths, op=op, values=values, glob_depth=glob_depth)
        )
    return out


def parse_cardsearch(querystring: str) -> CardsearchParams:
    pairs = parse_qsl(querystring, keep_blank_values=True)
    texts: list[str] = []
    text_paths: list[str] = []
    sort = None
    page_size = 13
    cursor = None
    for key, val in pairs:
        tm = _TEXT_RE.match(key)
        if tm and tm.group(1) == "cardSearchText":
            if val:
                texts.append(val)
            if tm.group(2):
                for p in tm.group(2).split(","):
                    if p and p != "*":
                        text_paths.append(propertypath_key(p))
        elif key == "sort":
            if val and val not in ("-relevance", "relevance"):  # no-op parity
                desc = val.startswith("-")
                sort = SortParam(propertypath_key(val.lstrip("-")), desc)
        elif key == "page[size]":
            page_size = clamp_page_size(int(val))
        elif key == "page[cursor]":
            cursor = PageCursor.decode(val)
    filters = _parse_filters(pairs, _FILTER_RE)
    return CardsearchParams(
        texts=tuple(texts),
        text_paths=tuple(text_paths),
        filters=tuple(filters),
        sort=sort,
        page_size=page_size,
        cursor=cursor,
    )


def parse_valuesearch(querystring: str) -> ValuesearchParams:
    pairs = parse_qsl(querystring, keep_blank_values=True)
    vpath = ""
    page_size = 13
    vtexts: list[str] = []
    vtext_paths: list[str] = []
    for key, val in pairs:
        if key == "valueSearchPropertyPath":
            vpath = propertypath_key(val)
        elif key == "page[size]":
            page_size = clamp_page_size(int(val))
        else:
            tm = _TEXT_RE.match(key)
            if tm and tm.group(1) == "valueSearchText":
                if val:
                    vtexts.append(val)
                if tm.group(2):
                    for p in tm.group(2).split(","):
                        if p and p != "*":
                            vtext_paths.append(propertypath_key(p))
    if not vpath:
        raise ValueError(
            "valueSearchPropertyPath is required "
            "(search_params.py:461-463 MissingRequiredQueryParam)"
        )
    return ValuesearchParams(
        value_path=vpath,
        cardsearch=parse_cardsearch(querystring),
        page_size=page_size,
        value_texts=tuple(vtexts),
        value_text_paths=tuple(vtext_paths),
        value_filters=tuple(_parse_filters(pairs, _VFILTER_RE)),
    )


def compile_cardsearch(
    params: CardsearchParams,
    index: IndexReader,
    doc_values: DataFrame | None = None,
    field_index: "FieldIndex | None" = None,
    random_seed: str = "0",
) -> DataFrame:
    """CardsearchParams -> result DataFrame (doc_id [, score] [, rank]).

    Text present -> relevance ranking via WAND; structured filters are
    compiled to the matching doc-id set and PUSHED INTO the WAND kernel
    (filter_docs), so pages are always full — no overfetch heuristics, no
    short pages when filters are selective. No text + sort -> filter-sort-
    page plan. No text + no sort -> reproducibly-random sample ordered by a
    seeded md5 shuffle key (`random_seed` picks the page-1 sample; cursor
    type 'random' = [seed, start_offset, first_page_ids] replays/extends it,
    the ReproduciblyRandomSampleCursor analog).

    Path-scoped text (cardSearchText[path,...], search_params.py:139-186)
    requires a FieldIndex built over per-path text rows; passing text_paths
    without one raises — the param is never silently ignored.
    """
    from .filters import apply_filters
    from .wand import wand_topk

    offset = 0
    rnd_cursor: tuple[str, list] | None = None  # (page1 seed, first_page_ids)
    if params.cursor and params.cursor.args:
        if params.cursor.type_key == "offset":
            offset = int(params.cursor.args[0])
        elif params.cursor.type_key == "random":
            # ReproduciblyRandomSampleCursor analog (page_cursor.py:125-144):
            # [seed, start_offset, first_page_ids]
            seed = str(params.cursor.args[0])
            offset = int(params.cursor.args[1])
            rnd_cursor = (seed, list(params.cursor.args[2]))

    filter_ids = None
    if params.filters:
        if doc_values is None:
            raise ValueError("filters require a doc_values table")
        filter_ids = apply_filters(
            index.live_docs().select("doc_id"), doc_values, list(params.filters)
        )

    if params.texts:
        # multiple cardSearchText params AND together (search_params.py:656-668
        # analog): concatenate — parse_query gives AND-of-terms semantics
        qtext = " ".join(params.texts)
        if params.text_paths:
            if field_index is None:
                raise ValueError(
                    "cardSearchText[path] requires a FieldIndex "
                    "(build one with share_spark.query.fields.build_field_index)"
                )
            return field_index.scoped_topk(
                qtext, list(params.text_paths), k=params.page_size,
                offset=offset, filter_docs=filter_ids,
            )
        return wand_topk(
            index, qtext, k=params.page_size, offset=offset,
            filter_docs=filter_ids,
        )

    docs = filter_ids if filter_ids is not None else index.live_docs().select("doc_id")
    if not params.sort:
        # no text + no sort -> reproducibly-random sample, the reference's
        # ReproduciblyRandomSampleCursor plan (trovesearch_denorm.py:739-803):
        # page 1 is a seeded random order; pages >= 2 re-randomize seeded on
        # the first page's ids and exclude them; revisiting page 1 replays
        # the remembered ids.
        from .paging import random_page_seed, seeded_random_page

        if rnd_cursor is not None:
            page1_seed, first_ids = rnd_cursor
            if offset == 0:  # returning to a previously-visited first page
                return seeded_random_page(
                    docs.filter(F.col("doc_id").isin(first_ids)),
                    "doc_id", page1_seed, params.page_size,
                )
            return seeded_random_page(
                docs, "doc_id", random_page_seed(first_ids), params.page_size,
                exclude_ids=first_ids,
                offset=offset - len(first_ids),
            )
        return seeded_random_page(
            docs, "doc_id", random_seed, params.page_size, offset=offset
        )
    if doc_values is None:
        raise ValueError("sort requires a doc_values table")
    # one NUMERIC sort key for either value type: dates as epoch days,
    # ints as themselves (string-casting ints would sort '100' < '20')
    sort_vals = doc_values.filter(
        F.col("path_key") == params.sort.field
    ).select(
        "doc_id",
        F.coalesce(
            F.datediff(F.col("date_value"), F.lit("1970-01-01").cast("date")).cast("long"),
            F.col("int_value"),
        ).alias("_sv"),
    )
    # multivalue semantics: ES sort mode max for desc / min for asc —
    # and one row per doc, so the join can't fan out the result
    agg = F.max("_sv") if params.sort.descending else F.min("_sv")
    sort_vals = sort_vals.groupBy("doc_id").agg(agg.alias("_sv"))
    docs = docs.join(sort_vals, "doc_id", "left")
    primary = (
        F.desc_nulls_last("_sv") if params.sort.descending else F.asc_nulls_last("_sv")
    )
    out = docs.orderBy(primary, F.asc("doc_id")).limit(offset + params.page_size)
    if offset:
        from pyspark.sql import Window

        w = Window.orderBy(primary, F.asc("doc_id"))
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > offset)
            .drop("_rn")
        )
    return out.drop("_sv")


def compile_valuesearch(
    params: ValuesearchParams,
    index: IndexReader,
    doc_values: DataFrame,
    value_type: str | None = None,
    value_meta: DataFrame | None = None,
    field_index: "FieldIndex | None" = None,
) -> DataFrame:
    """Dispatch on date-vs-iri property (trovesearch_denorm.py:306-329).

    `value_type` ('date' | 'iri') comes from the deployment's path-type
    catalog when available; absent one, a single limit(1) metadata probe
    decides (acceptable for interactive use, not for a hot loop).

    `value_meta` is the (doc_id, value_iri)-keyed table from
    rdf.extract_value_values; valueSearchText/valueSearchFilter compile
    against it. Passing those params without it raises — never silently
    dropped (the engine-wide rule).

    The cardsearch context is UNLIMITED — the reference ANDs the card-scoped
    query into the value query as an unbounded bool filter
    (trovesearch_denorm.py:838-859), so value counts see every matching
    card: filters compile to the full apply_filters doc-id set (no paging),
    text compiles to the boolean match-set plan (wand.match_docs — a
    semi-join, not top-k scoring). With neither, counts still exclude
    tombstoned docs (deleted cards vanish from all aggs in the reference)
    via a live-docs semi-join — skipped when the index has no tombstones,
    where it would be a no-op join against the full doc set."""
    from .filters import apply_filters
    from .wand import match_docs

    cs = params.cardsearch
    card_docs = None
    filter_ids = None
    if cs.filters:
        filter_ids = apply_filters(
            index.live_docs().select("doc_id"), doc_values, list(cs.filters)
        )
    if cs.texts:
        qtext = " ".join(cs.texts)
        if cs.text_paths:
            if field_index is None:
                raise ValueError(
                    "cardSearchText[path] in a valuesearch context requires "
                    "a FieldIndex — refusing to silently widen the scope"
                )
            card_docs = field_index.scoped_match_docs(
                qtext, list(cs.text_paths), filter_docs=filter_ids
            )
        else:
            card_docs = match_docs(index, qtext, filter_docs=filter_ids)
    else:
        card_docs = filter_ids
    if card_docs is None and index.tombstones() is not None:
        # no card context, but dead docs must still vanish from the aggs
        card_docs = index.live_docs().select("doc_id")
    if value_type is None:
        probe = (
            doc_values.filter(F.col("path_key") == params.value_path)
            .limit(1)
            .collect()
        )
        value_type = (
            "date" if (probe and probe[0]["date_value"] is not None) else "iri"
        )
    is_date = value_type == "date"
    if is_date:
        if params.value_texts or params.value_filters:
            # date-value limitations (search_params.py:472-483
            # InvalidQueryParams): value-scoped constraints are undefined
            # for a date property — a histogram has no value subdocs
            raise ValueError(
                "valueSearchText/valueSearchFilter may not be used with a "
                "valueSearchPropertyPath leading to a date property"
            )
        return date_histogram(
            doc_values, [params.value_path], card_filter_docs=card_docs
        )
    return value_counts(
        doc_values,
        [params.value_path],
        card_filter_docs=card_docs,
        page_size=params.page_size,
        value_meta=value_meta,
        value_filters=params.value_filters,
        value_text=" ".join(params.value_texts) if params.value_texts else None,
        value_text_paths=params.value_text_paths,
    )
