"""Turtle-subset parser + GraphWalk + doc_values derivation goldens."""

import datetime
import json

from share_spark.rdf import (
    RDF_TYPE,
    XSD,
    Literal,
    extract_doc_values,
    parse_turtle,
    walk_tripledict,
)

TTL = """
@prefix dcterms: <http://purl.org/dc/terms/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix osf: <https://osf.example/vocab/> .
# a comment
<https://card.example/1> a osf:Preprint ;
    dcterms:title "A \\"quoted\\" title"@en ;
    dcterms:created "1999-12-31"^^<http://www.w3.org/2001/XMLSchema#date> ;
    dcterms:subject <https://subj.example/s1>, <https://subj.example/s2> ;
    dcterms:creator _:p1 ;
    osf:downloads 42 .
_:p1 foaf:name "Ada Example" ;
    a foaf:Person .
<https://subj.example/s1> foaf:name "Subject One" .
"""


def test_parse_turtle_golden():
    td, prefixes = parse_turtle(TTL)
    assert prefixes["dcterms"] == "http://purl.org/dc/terms/"
    card = td["https://card.example/1"]
    assert card[RDF_TYPE] == {"https://osf.example/vocab/Preprint"}
    assert card["http://purl.org/dc/terms/title"] == {
        Literal('A "quoted" title', None, "en")
    }
    assert card["http://purl.org/dc/terms/created"] == {
        Literal("1999-12-31", XSD + "date", None)
    }
    assert card["http://purl.org/dc/terms/subject"] == {
        "https://subj.example/s1",
        "https://subj.example/s2",
    }
    assert card["https://osf.example/vocab/downloads"] == {
        Literal("42", XSD + "integer", None)
    }
    assert td["_:p1"]["http://xmlns.com/foaf/0.1/name"] == {
        Literal("Ada Example", None, None)
    }


def test_walk_semantics():
    td, _ = parse_turtle(TTL)
    got = list(walk_tripledict(td, "https://card.example/1"))
    paths = {(p, v) for p, v in got if not isinstance(v, Literal)}
    # depth-1 iris + recursion into subject s1 (acyclic)
    assert (("http://purl.org/dc/terms/subject",), "https://subj.example/s1") in paths
    assert ((RDF_TYPE,), "https://osf.example/vocab/Preprint") in paths
    # close-to-focus rule (GraphWalk, _trovesearch_util.py:177-190): a
    # literal behind a focus-attached BLANK node is kept (blanknodes are
    # inlined, so closeness survives), but a literal behind an
    # IRI-identified resource (subject s1's name) is NOT
    deep_lits = {
        (p, v.value) for p, v in got if isinstance(v, Literal) and len(p) > 1
    }
    assert deep_lits == {
        (
            ("http://purl.org/dc/terms/creator", "http://xmlns.com/foaf/0.1/name"),
            "Ada Example",
        )
    }
    # typed values converted
    assert (("http://purl.org/dc/terms/created",), datetime.date(1999, 12, 31)) in got
    assert (("https://osf.example/vocab/downloads",), 42) in got
    # cycle safety: s1 -> card -> s1 loop terminates
    td["https://subj.example/s1"]["https://osf.example/vocab/isAbout"] = {
        "https://card.example/1"
    }
    got2 = list(walk_tripledict(td, "https://card.example/1"))
    assert len(got2) >= len(got)


def test_extract_doc_values_spark(spark):
    docs = spark.createDataFrame(
        [(1, "https://card.example/1", TTL)],
        "doc_id long, focus_iri string, turtle string",
    )
    rows = extract_doc_values(docs).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r["path_key"], r["value_type"]), []).append(r)
    subj = by_key[('["dcterms:subject"]', "iri")]
    assert sorted(r["iri_value"] for r in subj) == [
        "https://subj.example/s1",
        "https://subj.example/s2",
    ]
    assert all(r["depth"] == 1 for r in subj)
    date = by_key[('["dcterms:created"]', "date")][0]
    assert date["date_value"] == datetime.date(1999, 12, 31)
    assert by_key[('["osf:downloads"]', "int")][0]["int_value"] == 42
    title = by_key[('["dcterms:title"]', "text")][0]
    assert title["text_value"] == 'A "quoted" title'
    # blank-node creator: traversal-only, never an iri row
    assert ('["dcterms:creator"]', "iri") not in by_key
    # filters.py compiles against the derived rows directly
    from share_spark.query.filters import ANY_OF, SearchFilter, matching_doc_ids

    dv = extract_doc_values(docs)
    ids = matching_doc_ids(
        dv,
        SearchFilter(
            paths=('["dcterms:subject"]',),
            op=ANY_OF,
            values=("http://subj.example/s1/",),  # suffuniq variant
        ),
    ).collect()
    assert [r["doc_id"] for r in ids] == [1]


def test_parse_errors():
    import pytest

    with pytest.raises(ValueError, match="unknown prefix"):
        parse_turtle("<a:s> nope:x <a:o> .")
    with pytest.raises(ValueError):
        parse_turtle("<a:s> <a:p> <a:o> ")  # missing terminator
