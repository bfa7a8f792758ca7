"""Card-level `sharev2_elastic` JSON deriver.

Composes a card's extracted RDF graph into the exact serialized JSON
document of the reference's most-used deriver
(trove/derive/sharev2_elastic.py:126-209: per-card metadata + single-valued
backcompat fields + sorted string lists + nested `lists` agent/lineage
structures, then `strip_empty_values` + `json.dumps(sort_keys=True)`),
golden-tested in the reference's input/output harness shape
(tests/trove/_input_output_tests.py:7-70, tests/trove/derive/_base.py:14-53).

Two forms, same contract:
  - `derive_card(tripledict, focus_iri, meta)` — plain Python, the golden
    byte contract (None = the card should be skipped, should_skip analog)
  - `derive_sharev2_elastic(cards)` — vectorized mapInPandas over
    (doc_id, focus_iri, turtle, + meta columns); rows that skip emit NULL

Determinism note (documented deviation): where the reference pulls ONE
arbitrary value from a multi-valued property via `next(iter(set))`
(sharev2_elastic.py:235-247 `_single_value`), this deriver takes the
lexicographic minimum — any single value satisfies the reference contract,
and the choice must be stable across Spark retries/partitionings.
"""

from __future__ import annotations

import datetime
import json
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .derive import format_typename, obfuscate_id, strip_empty_values
from .rdf import Literal, parse_turtle

DCTERMS = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
DCAT = "http://www.w3.org/ns/dcat#"
# trove/vocab/namespaces.py:47-49
SHAREV2 = "https://share.osf.io/vocab/2017/sharev2/"
OSFMAP = "https://osf.io/vocab/2022/"

# sharev2 typenames grouped most- to least-specific — the single-type
# backcompat choice (sharev2_elastic.py:23-95); names, not IRIs, so the
# namespace constant stays in one place
_TYPES_BY_SPECIFICITY: tuple[frozenset[str], ...] = (
    frozenset({"PrincipalInvestigator", "PrincipalInvestigatorContact"}),
    frozenset({
        "Article", "Book", "ConferencePaper", "Dissertation", "Preprint",
        "Project", "Registration", "Report", "Thesis", "WorkingPaper",
        "Consortium", "Department", "Institution", "Creator",
    }),
    frozenset({
        "DataSet", "Patent", "Poster", "Publication", "Presentation",
        "Repository", "Retraction", "Software", "Organization", "Person",
        "Contributor", "Funder", "Host", "Publisher", "IsAffiliatedWith",
        "IsEmployedBy", "IsMemberOf", "Cites", "Compiles", "Corrects",
        "Discusses", "Disputes", "Documents", "Extends", "IsDerivedFrom",
        "IsPartOf", "IsSupplementTo", "References", "RepliesTo", "Retracts",
        "Reviews", "UsesDataFrom",
    }),
    frozenset({
        "CreativeWork", "Agent", "AgentWorkRelation", "AgentRelation",
        "WorkRelation",
    }),
)

# focus types eligible for this deriver (should_skip, sharev2_elastic.py:140-152)
_ALLOWED_FOCUSTYPE_IRIS = frozenset({
    SHAREV2 + "CreativeWork",
    OSFMAP + "Project",
    OSFMAP + "ProjectComponent",
    OSFMAP + "Registration",
    OSFMAP + "RegistrationComponent",
    OSFMAP + "Preprint",
})


@dataclass(frozen=True)
class CardMeta:
    """The card/suid metadata the reference reads from its DB rows
    (sharev2_elastic.py:155-171)."""

    suid_pk: int
    indexcard_id: str
    date_created: str  # isoformat
    date_modified: str  # isoformat
    source_name: str
    source_config_label: str
    source_unique_id: str


def _to_str(obj) -> str | None:
    if obj is None:
        return None
    if isinstance(obj, Literal):
        return obj.value
    return str(obj)


class _Graph:
    """Deterministic query helpers over a parsed tripledict."""

    def __init__(self, tripledict: dict):
        self.td = tripledict

    def objs(self, subj: str, pred: str) -> list:
        out = self.td.get(subj, {}).get(pred, ())
        return sorted(out, key=_to_str)

    def single_value(self, subj: str, *preds: str):
        for p in preds:
            got = self.objs(subj, p)
            if got:
                return got[0]
        return None

    def single_string(self, subj: str, *preds: str) -> str | None:
        return _to_str(self.single_value(subj, *preds))

    def single_date(self, subj: str, *preds: str) -> str | None:
        v = self.single_value(subj, *preds)
        if isinstance(v, Literal):
            return v.value
        if isinstance(v, datetime.date):
            return v.isoformat()
        return _to_str(v)

    def string_list(self, subj: str, *preds: str) -> list[str]:
        return sorted(_to_str(o) for p in preds for o in self.objs(subj, p))


def _local_typename(iri: str) -> str | None:
    """typename when the IRI is in the SHAREv2 or OSFMAP namespace."""
    for ns in (SHAREV2, OSFMAP):
        if iri.startswith(ns):
            return iri[len(ns):]
    return None


def _format_type_iri(iri: str) -> str:
    name = _local_typename(iri)
    return format_typename(name) if name else iri


def _single_typename(type_iris: list[str]) -> str | None:
    """Most-specific sharev2 typename; OSFMAP types map into SHAREv2 with
    the component backcompat collapses, falling back to CreativeWork
    (sharev2_elastic.py:297-316). Deterministic: min within a specificity
    group (the reference pops an arbitrary one)."""
    sv2 = {i[len(SHAREV2):] for i in type_iris if i.startswith(SHAREV2)}
    if sv2:
        for group in _TYPES_BY_SPECIFICITY:
            hit = sorted(sv2 & group)
            if hit:
                return hit[0]
    osf = sorted(i[len(OSFMAP):] for i in type_iris if i.startswith(OSFMAP))
    if osf:
        name = osf[0]
        if name == "RegistrationComponent":
            name = "Registration"
        elif name == "ProjectComponent":
            name = "Project"
        return _single_typename([SHAREV2 + name, SHAREV2 + "CreativeWork"])
    return None


def derive_card(tripledict: dict, focus_iri: str, meta: CardMeta) -> str | None:
    """One card's graph -> the serialized sharev2_elastic JSON (or None when
    the focus type is out of scope — should_skip)."""
    g = _Graph(tripledict)

    focus_types = [o for o in g.objs(focus_iri, RDF_NS + "type") if isinstance(o, str)]
    if _ALLOWED_FOCUSTYPE_IRIS.isdisjoint(focus_types):
        return None

    def single_type(iri: str) -> str | None:
        types = [o for o in g.objs(iri, RDF_NS + "type") if isinstance(o, str)]
        name = _single_typename(types)
        return format_typename(name) if name else None

    def type_list(iri: str) -> list[str]:
        return sorted(
            _format_type_iri(t)
            for t in g.objs(iri, RDF_NS + "type")
            if isinstance(t, str) and _local_typename(t) is not None
        )

    def related_names(*preds: str) -> list:
        return [
            g.single_string(agent, FOAF + "name")
            for p in preds
            for agent in g.objs(focus_iri, p)
            if isinstance(agent, str)
        ]

    def related_agent_list(*preds: str) -> list[dict]:
        out = []
        for p in preds:
            for agent in g.objs(focus_iri, p):
                if not isinstance(agent, str):
                    continue
                out.append({
                    "type": single_type(agent),
                    "types": type_list(agent),
                    "name": g.single_string(agent, FOAF + "name"),
                    "identifiers": g.string_list(agent, DCTERMS + "identifier"),
                    "relation": _format_type_iri(p),
                    "cited_as": g.single_string(agent, FOAF + "name"),
                })
        return out

    def work_lineage(iri: str, visiting: frozenset[str] = frozenset()) -> list[dict]:
        # linear isPartOf walk, root first (sharev2_elastic.py:348-367);
        # cycle guard added (the reference would recurse forever)
        parent = g.single_value(iri, DCTERMS + "isPartOf")
        if not isinstance(parent, str) or parent in visiting:
            return []
        return [
            *work_lineage(parent, visiting | {iri}),
            {
                "type": single_type(parent),
                "types": type_list(parent),
                "title": g.single_string(parent, DCTERMS + "title"),
                "identifiers": g.string_list(parent, DCTERMS + "identifier"),
            },
        ]

    def subject_lineage(subj: str, label_pred: str) -> tuple[str, ...]:
        visiting: set[str] = set()
        cur: str | None = subj
        out: list[str] = []
        while isinstance(cur, str) and cur not in visiting:
            visiting.add(cur)
            label = g.single_value(cur, label_pred)
            if not isinstance(label, Literal):
                return ()
            out.insert(0, label.value)
            nxt = g.single_value(cur, SKOS + "broader")
            cur = nxt if isinstance(nxt, str) else None
        return tuple(out)

    subjects: list[str] = []
    subject_synonyms: list[str] = []
    for subj in g.objs(focus_iri, DCTERMS + "subject"):
        if not isinstance(subj, str):
            continue
        bepress = subject_lineage(subj, SKOS + "prefLabel")
        specific = subject_lineage(subj, SKOS + "altLabel")
        if specific:
            subjects.append("|".join((meta.source_name, *specific)))
            if bepress:
                subject_synonyms.append("|".join(("bepress", *bepress)))
        elif bepress:
            subjects.append("|".join(("bepress", *bepress)))

    focus_preds = set(tripledict.get(focus_iri, {}).keys())
    osf_artifacts = {
        "analytic_code": OSFMAP + "hasAnalyticCodeResource",
        "data": OSFMAP + "hasDataResource",
        "materials": OSFMAP + "hasMaterialsResource",
        "papers": OSFMAP + "hasPapersResource",
        "supplements": OSFMAP + "hasSupplementalResource",
    }

    derived = {
        # metadata about the record/indexcard in this system
        "id": obfuscate_id(meta.suid_pk),
        "indexcard_id": meta.indexcard_id,
        "date_created": meta.date_created,
        "date_modified": meta.date_modified,
        "sources": [meta.source_name],
        "source_config": meta.source_config_label,
        "source_unique_id": meta.source_unique_id,
        # metadata about the resource in some other system
        "type": single_type(focus_iri),
        "types": type_list(focus_iri),
        "date": g.single_date(
            focus_iri, DCTERMS + "date", DCTERMS + "created", DCTERMS + "modified"
        ),
        "date_published": g.single_date(
            focus_iri, DCTERMS + "created", DCTERMS + "date"
        ),
        "date_updated": g.single_date(
            focus_iri, DCTERMS + "modified", DCTERMS + "date"
        ),
        "description": g.single_string(focus_iri, DCTERMS + "description"),
        "justification": g.single_string(
            focus_iri, OSFMAP + "withdrawalJustification"
        ),
        "language": g.single_string(focus_iri, DCTERMS + "language"),
        "registration_type": g.single_string(
            focus_iri, OSFMAP + "registration_type"
        ),
        "retracted": bool(g.single_value(focus_iri, OSFMAP + "dateWithdrawn")),
        "title": g.single_string(focus_iri, DCTERMS + "title"),
        "withdrawn": bool(g.single_value(focus_iri, OSFMAP + "dateWithdrawn")),
        "identifiers": g.string_list(focus_iri, DCTERMS + "identifier"),
        "tags": g.string_list(focus_iri, OSFMAP + "keyword"),
        "subjects": subjects,
        "subject_synonyms": subject_synonyms,
        # related names
        "affiliations": related_names(OSFMAP + "affiliatedInstitution"),
        "contributors": related_names(
            DCTERMS + "contributor", DCTERMS + "creator"
        ),
        "funders": related_names(OSFMAP + "funder"),
        "publishers": related_names(DCTERMS + "publisher"),
        "hosts": related_names(DCAT + "accessService"),
        "osf_related_resource_types": {
            k: (p in focus_preds) for k, p in osf_artifacts.items()
        },
        "lists": {
            "affiliations": related_agent_list(OSFMAP + "affiliatedInstitution"),
            "contributors": related_agent_list(
                DCTERMS + "contributor", DCTERMS + "creator"
            ),
            "funders": related_agent_list(OSFMAP + "funder"),
            "publishers": related_agent_list(DCTERMS + "publisher"),
            "hosts": related_agent_list(DCAT + "accessService"),
            "lineage": work_lineage(focus_iri),
        },
    }
    return json.dumps(strip_empty_values(derived), sort_keys=True)


DERIVED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("derived_json", T.StringType()),
    ]
)

_META_COLS = (
    "suid_pk", "indexcard_id", "date_created", "date_modified",
    "source_name", "source_config_label", "source_unique_id",
)


def derive_sharev2_elastic(
    cards: DataFrame,
    *,
    turtle_col: str = "turtle",
    focus_col: str = "focus_iri",
    keep_skipped: bool = False,
) -> DataFrame:
    """Vectorized deriver: cards(doc_id, focus_iri, turtle, <CardMeta cols>)
    -> (doc_id, derived_json). Skipped cards (should_skip) are dropped, or
    kept with NULL derived_json when `keep_skipped`.

    Scale shape: embarrassingly parallel per-card work inside one
    mapInPandas pass (Arrow-batched, no shuffle); output is a derived column
    keyed by doc_id, ready for MERGE into a derived-cards table."""

    def _derive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for row in pdf.itertuples(index=False):
                td, _prefixes = parse_turtle(getattr(row, turtle_col))
                meta = CardMeta(
                    suid_pk=int(row.suid_pk),
                    indexcard_id=str(row.indexcard_id),
                    date_created=str(row.date_created),
                    date_modified=str(row.date_modified),
                    source_name=str(row.source_name),
                    source_config_label=str(row.source_config_label),
                    source_unique_id=str(row.source_unique_id),
                )
                derived = derive_card(td, getattr(row, focus_col), meta)
                if derived is None and not keep_skipped:
                    continue
                ids.append(int(row.doc_id))
                outs.append(derived)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "derived_json": pd.Series(outs, dtype="object")})

    cols = ["doc_id", focus_col, turtle_col, *_META_COLS]
    return cards.select(*cols).mapInPandas(_derive, schema=DERIVED_SCHEMA)
