"""Card-level `osfmap_json` deriver — nested JSON-LD serialization.

Matches the reference's OsfmapJsonFullDeriver semantics
(trove/derive/osfmap_json.py:19-159): render a card's graph as a nested
JSON-LD object rooted at the focus —
  - IRI objects nest their own descriptions (cycle-guarded; revisited or
    undescribed IRIs render as {'@id': shorthand})
  - literals render {'@value': ...} with '@language' for language tags and
    '@type' for non-string datatypes
  - dates render as plain 'YYYY-MM-DD' @values
  - blank nodes nest WITHOUT an '@id' (the reference's non-blank-blank
    HACK branch)
  - functional properties carry a single value; any other multi-valued
    property renders a list sorted by json.dumps (the reference's
    deterministic ordering, :150-159)

Determinism note (documented deviation): predicate keys inside each nested
object are emitted in sorted order — the reference emits its dicts'
insertion order, which depends on ingest-time dict construction; a stable
order is required across Spark retries and is equally valid JSON-LD.

This completes the reference's deriver registry
(trove/derive/__init__.py:13-40): sharev2_elastic (derive_sharev2.py),
oai_dc (derive_oaidc.py), osfmap_json (here).
"""

from __future__ import annotations

import datetime
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .rdf import Literal, parse_turtle

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


class OsfmapJsonRenderer:
    """tripledict -> nested JSON-LD (trove/derive/osfmap_json.py:46-159).

    `shorthand`: prefix -> namespace-iri map used to compact IRIs (the
    osfmap_json_shorthand analog — deployment vocabulary, caller-supplied).
    `functional`: predicate IRIs that carry at most one value
    (owl:FunctionalProperty entries of the deployment thesaurus)."""

    def __init__(
        self,
        shorthand: dict[str, str] | None = None,
        functional: frozenset[str] = frozenset(),
    ):
        # longest namespace first so the most specific prefix wins
        self._short = sorted(
            (shorthand or {}).items(), key=lambda kv: -len(kv[1])
        )
        self._functional = functional

    def compact(self, iri: str) -> str:
        for pfx, ns in self._short:
            if iri.startswith(ns):
                rest = iri[len(ns):]
                return f"{pfx}:{rest}" if pfx else rest
        return iri

    def render(self, tripledict: dict, focus_iri: str) -> dict:
        self._visiting: set[str] = set()
        return self._nested(tripledict, focus_iri)

    def _leaf(self, obj) -> object:
        if isinstance(obj, Literal):
            if obj.lang:
                return {"@value": obj.value, "@language": obj.lang}
            if obj.datatype in (None, XSD_STRING, RDF_LANGSTRING):
                return {"@value": obj.value}
            return {"@value": obj.value, "@type": self.compact(obj.datatype)}
        if isinstance(obj, datetime.date):
            return {"@value": obj.isoformat()}
        if isinstance(obj, (int, float)):
            return {"@value": obj}
        if isinstance(obj, tuple):
            return {"@list": [self._leaf(o) for o in obj]}
        if isinstance(obj, str):
            return {"@id": self.compact(obj)}
        raise ValueError(f"unsupported rdf object: {obj!r}")

    def _values(self, pred: str, rendered: list) -> object:
        if pred in self._functional:
            if len(rendered) > 1:
                raise ValueError(
                    f"expected at most one object for <{pred}> "
                    f"(got {len(rendered)})"
                )
            return rendered[0] if rendered else None
        if len(rendered) > 1:
            return sorted(rendered, key=json.dumps)
        return rendered

    def _nested(self, tripledict: dict, obj) -> object:
        nestable = (
            isinstance(obj, str)
            and obj not in self._visiting
            and obj in tripledict
        )
        if not nestable:
            return self._leaf(obj)
        self._visiting.add(obj)
        out: dict = {} if obj.startswith("_:") else {"@id": self.compact(obj)}
        for pred in sorted(tripledict[obj]):
            objset = tripledict[obj][pred]
            if objset:
                out[self.compact(pred)] = self._values(
                    pred,
                    [self._nested(tripledict, o) for o in
                     sorted(objset, key=lambda o: json.dumps(self._leaf(o)))],
                )
        self._visiting.discard(obj)
        return out


def derive_osfmap_card(
    tripledict: dict,
    focus_iri: str,
    shorthand: dict[str, str] | None = None,
    functional: frozenset[str] = frozenset(),
) -> str:
    """One card's graph -> the serialized nested JSON-LD (never skips —
    should_skip is constant False for this deriver, osfmap_json.py:33-34)."""
    return json.dumps(
        OsfmapJsonRenderer(shorthand, functional).render(tripledict, focus_iri)
    )


# the mini variant's default predicate blocklist (the reference's
# EXCLUDED_PREDICATE_SET, trove/derive/osfmap_json_mini.py:10-12: only
# osfmap:contains — the file-hierarchy fanout predicate, which is what
# bloats full cards)
MINI_EXCLUDED_PREDICATES = frozenset(
    {"https://osf.io/vocab/2022/contains"}
)


def prune_tripledict(
    tripledict: dict, excluded: frozenset[str]
) -> dict:
    """The mini deriver's convert_tripledict
    (trove/derive/osfmap_json_mini.py:24-37): drop excluded predicates,
    then drop any subject whose description becomes empty."""
    pruned = {}
    for subj, twopledict in tripledict.items():
        kept = {
            pred: objset
            for pred, objset in twopledict.items()
            if pred not in excluded
        }
        if kept:
            pruned[subj] = kept
    return pruned


def derive_osfmap_card_mini(
    tripledict: dict,
    focus_iri: str,
    shorthand: dict[str, str] | None = None,
    functional: frozenset[str] = frozenset(),
    excluded: frozenset[str] = MINI_EXCLUDED_PREDICATES,
) -> str:
    """osfmap_json_mini: identical rendering to the full deriver over a
    predicate-pruned graph (trove/derive/osfmap_json_mini.py:16-37)."""
    return derive_osfmap_card(
        prune_tripledict(tripledict, excluded), focus_iri, shorthand,
        functional,
    )


OSFMAP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("derived_json", T.StringType()),
    ]
)


def derive_osfmap_json(
    cards: DataFrame,
    *,
    turtle_col: str = "turtle",
    focus_col: str = "focus_iri",
    shorthand: dict[str, str] | None = None,
    functional: frozenset[str] = frozenset(),
    excluded: frozenset[str] = frozenset(),
) -> DataFrame:
    """Vectorized deriver: (doc_id, focus_iri, turtle) -> (doc_id,
    derived_json). Embarrassingly parallel per-card mapInPandas, no
    shuffle; output keys a derived-cards table (the osfmap_json derivation
    whose existence gates indexing in the reference,
    _trovesearch_util.py:52-60).

    `excluded`: predicate IRIs pruned from every card's graph before
    rendering — empty for the full deriver; the mini variant passes
    MINI_EXCLUDED_PREDICATES (see derive_osfmap_json_mini)."""
    sh = dict(shorthand or {})
    fn = frozenset(functional)
    ex = frozenset(excluded)

    def _derive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for doc_id, focus, turtle in zip(
                pdf["doc_id"], pdf[focus_col], pdf[turtle_col]
            ):
                td, prefixes = parse_turtle(turtle)
                if ex:
                    td = prune_tripledict(td, ex)
                # turtle @prefix declarations double as the compaction
                # vocabulary unless the caller supplies one
                ids.append(int(doc_id))
                outs.append(
                    derive_osfmap_card(td, focus, sh or prefixes, fn)
                )
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "derived_json": pd.Series(outs, dtype="object")})

    return cards.select("doc_id", focus_col, turtle_col).mapInPandas(
        _derive, schema=OSFMAP_SCHEMA
    )


def derive_osfmap_json_mini(
    cards: DataFrame,
    *,
    excluded: frozenset[str] = MINI_EXCLUDED_PREDICATES,
    **kw,
) -> DataFrame:
    """osfmap_json_mini deriver (trove/derive/osfmap_json_mini.py): the
    full nested-JSON-LD rendering over a graph with the excluded
    predicates (default osfmap:contains) pruned, emptied subjects
    dropped.  Same (doc_id, derived_json) schema as the full deriver."""
    return derive_osfmap_json(cards, excluded=excluded, **kw)
