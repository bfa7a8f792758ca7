"""Card-level `oai_dc` XML deriver.

Serializes a card's extracted RDF graph into the OAI-PMH Dublin Core
metadata payload, matching the reference deriver's element set and order
(trove/derive/oaidc_xml.py:67-141: title, creator, subject, description,
publisher, contributor, date, type, identifier, language, relation, rights
inside an <oai_dc:dc> envelope with the xsi:schemaLocation attribute), with
the same focus-type skip predicate as sharev2_elastic.

Stdlib-only XML building (manual escaping via xml.sax.saxutils) — the
element order is fixed by the deriver, so no tree library is needed.

Determinism note (documented deviation): the reference emits some element
groups in arbitrary set order (title/creator/contributor/subject,
oaidc_xml.py:82-100) and sorts the rest; this deriver sorts every group —
any order satisfies OAI-DC, and output must be stable across Spark retries.

Two forms, one contract: `derive_oai_dc(tripledict, focus_iri)` (plain
Python; None = skip) and `derive_oai_dc_xml(cards)` (vectorized
mapInPandas over (doc_id, focus_iri, turtle) rows).
"""

from __future__ import annotations

import datetime
from typing import Iterator
from xml.sax.saxutils import escape, quoteattr

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .derive_sharev2 import (
    _ALLOWED_FOCUSTYPE_IRIS,
    DCAT,  # noqa: F401  (re-export convenience for callers)
    DCTERMS,
    FOAF,
    OSFMAP,
    RDF_NS,
    SHAREV2,
    SKOS,
    _Graph,
)
from .rdf import Literal, parse_turtle

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
DCTYPE = "http://purl.org/dc/dcmitype/"
DC11 = "http://purl.org/dc/elements/1.1/"
OAI_DC = "http://www.openarchives.org/OAI/2.0/oai_dc/"
XSI = "http://www.w3.org/2001/XMLSchema-instance"

# oaidc_xml.py:24-40 DC_RELATION_PREDICATES
_RELATION_PREDS = tuple(sorted({
    DCTERMS + "hasPart",
    DCTERMS + "hasVersion",
    DCTERMS + "isPartOf",
    DCTERMS + "isVersionOf",
    DCTERMS + "references",
    OSFMAP + "hasAnalyticCodeResource",
    OSFMAP + "hasDataResource",
    OSFMAP + "hasMaterialsResource",
    OSFMAP + "hasPapersResource",
    OSFMAP + "hasPreregisteredAnalysisPlan",
    OSFMAP + "hasPreregisteredStudyDesign",
    OSFMAP + "hasRoot",
    OSFMAP + "hasSupplementalResource",
    OSFMAP + "isContainedBy",
    OSFMAP + "isSupplementedBy",
    OSFMAP + "supplements",
}))

_ENVELOPE_OPEN = (
    f'<oai_dc:dc xmlns:oai_dc="{OAI_DC}" xmlns:dc="{DC11}" '
    f'xmlns:xsi="{XSI}" xsi:schemaLocation='
    + quoteattr(f"{OAI_DC} http://www.openarchives.org/OAI/2.0/oai_dc.xsd")
    + ">"
)


def _datetime_z(value) -> str:
    """datetime_isoformat_z parity (trove/util/datetime.py): ISO value ->
    'YYYY-MM-DDTHH:MM:SSZ' (naive values treated as UTC)."""
    if isinstance(value, Literal):
        value = value.value
    if isinstance(value, datetime.date) and not isinstance(value, datetime.datetime):
        value = datetime.datetime(value.year, value.month, value.day)
    if isinstance(value, str):
        value = datetime.datetime.fromisoformat(value)
    return value.strftime("%Y-%m-%dT%H:%M:%SZ")


def _text(obj) -> str:
    return obj.value if isinstance(obj, Literal) else str(obj)


def derive_oai_dc(tripledict: dict, focus_iri: str) -> str | None:
    """One card's graph -> oai_dc XML string (None = should_skip)."""
    g = _Graph(tripledict)
    focus_types = [o for o in g.objs(focus_iri, RDF_NS + "type") if isinstance(o, str)]
    if _ALLOWED_FOCUSTYPE_IRIS.isdisjoint(focus_types):
        return None

    parts: list[str] = [_ENVELOPE_OPEN]

    def emit(tag: str, value: str) -> None:
        parts.append(f"<dc:{tag}>{escape(value)}</dc:{tag}>")

    def via_name(pred: str) -> list[str]:
        return sorted(
            g.single_string(o, FOAF + "name")
            for o in g.objs(focus_iri, pred)
            if isinstance(o, str) and g.single_string(o, FOAF + "name")
        )

    for v in sorted(_text(o) for o in g.objs(focus_iri, DCTERMS + "title")):
        emit("title", v)
    for v in via_name(DCTERMS + "creator"):
        emit("creator", v)
    # subjects: literal subject names, or labels of subject IRIs
    # (oaidc_xml.py:88-96 — only literals are emitted)
    subj_vals: set[str] = set()
    for o in g.objs(focus_iri, DCTERMS + "subject"):
        if isinstance(o, Literal):
            subj_vals.add(o.value)
        elif isinstance(o, str):
            for lp in (RDFS + "label", SKOS + "prefLabel", SKOS + "altLabel"):
                for lab in g.objs(o, lp):
                    if isinstance(lab, Literal):
                        subj_vals.add(lab.value)
    for v in sorted(subj_vals):
        emit("subject", v)
    for v in sorted(_text(o) for o in g.objs(focus_iri, DCTERMS + "description")):
        emit("description", v)
    for v in via_name(DCTERMS + "publisher"):
        emit("publisher", v)
    for v in via_name(DCTERMS + "contributor"):
        emit("contributor", v)
    date_val = g.single_value(
        focus_iri,
        DCTERMS + "date", DCTERMS + "datePublished",
        DCTERMS + "modified", DCTERMS + "created",
    )
    if date_val is not None:
        emit("date", _datetime_z(date_val))
    for t in sorted(t for t in focus_types):
        for ns_ in (OSFMAP, DCTYPE, SHAREV2):
            if t.startswith(ns_):
                emit("type", t[len(ns_):])
    for v in sorted(_text(o) for o in g.objs(focus_iri, DCTERMS + "identifier")):
        emit("identifier", v)
    for v in sorted(_text(o) for o in g.objs(focus_iri, DCTERMS + "language")):
        emit("language", v)
    rel = sorted(
        _text(o) for p in _RELATION_PREDS for o in g.objs(focus_iri, p)
        if isinstance(o, str)
    )
    for v in rel:
        emit("relation", v)
    for o in sorted(g.objs(focus_iri, DCTERMS + "rights"), key=_text):
        if isinstance(o, (str, Literal)):
            val = _text(o) if isinstance(o, Literal) else (
                g.single_string(o, DCTERMS + "title") or o
            )
            if val:
                emit("rights", val)
    parts.append("</oai_dc:dc>")
    return "".join(parts)


OAIDC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("metadata_xml", T.StringType()),
    ]
)


def derive_oai_dc_xml(
    cards: DataFrame,
    *,
    turtle_col: str = "turtle",
    focus_col: str = "focus_iri",
    keep_skipped: bool = False,
) -> DataFrame:
    """Vectorized deriver: (doc_id, focus_iri, turtle) -> (doc_id,
    metadata_xml) — the column build_oai_cards consumes, so the OAI verb
    surface serves REAL derived XML rather than fixture passthrough."""

    def _derive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for doc_id, focus, turtle in zip(
                pdf["doc_id"], pdf[focus_col], pdf[turtle_col]
            ):
                td, _ = parse_turtle(turtle)
                xml = derive_oai_dc(td, focus)
                if xml is None and not keep_skipped:
                    continue
                ids.append(int(doc_id))
                outs.append(xml)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "metadata_xml": pd.Series(outs, dtype="object")})

    return cards.select("doc_id", focus_col, turtle_col).mapInPandas(
        _derive, schema=OAIDC_SCHEMA
    )
