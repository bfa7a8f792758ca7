"""osfmap_json nested JSON-LD deriver (trove/derive/osfmap_json.py:19-159
contract): nesting with cycle guard, @value/@language/@type leaf forms,
blank nodes without @id, functional single-values, deterministic
multi-value ordering."""

from __future__ import annotations

import datetime
import json

import pytest

from share_spark.derive_osfmap import (
    OsfmapJsonRenderer,
    derive_osfmap_card,
    derive_osfmap_json,
)
from share_spark.rdf import Literal

DCT = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
XSD = "http://www.w3.org/2001/XMLSchema#"
SHORT = {"dcterms": DCT, "foaf": FOAF, "xsd": XSD}


def _graph():
    return {
        "://w/focus": {
            DCT + "title": {Literal("Hello", lang="en")},
            DCT + "created": {datetime.date(2021, 10, 18)},
            DCT + "creator": {"://a/jw"},
            DCT + "identifier": {Literal("id-b"), Literal("id-a")},
            DCT + "references": {"_:b0"},
            DCT + "extent": {Literal("42", datatype=XSD + "integer")},
        },
        "://a/jw": {
            FOAF + "name": {Literal("JW")},
            DCT + "isPartOf": {"://w/focus"},  # cycle back to focus
        },
        "_:b0": {DCT + "description": {Literal("blank desc")}},
    }


def test_nested_jsonld_shapes():
    got = json.loads(derive_osfmap_card(_graph(), "://w/focus", SHORT))
    assert got["@id"] == "://w/focus"
    assert got["dcterms:title"] == [{"@value": "Hello", "@language": "en"}]
    assert got["dcterms:created"] == [{"@value": "2021-10-18"}]
    # typed literal gets @type with the compacted datatype
    assert got["dcterms:extent"] == [{"@value": "42", "@type": "xsd:integer"}]
    # multi-values sorted by json.dumps
    assert got["dcterms:identifier"] == [{"@value": "id-a"}, {"@value": "id-b"}]
    # nested described IRI, with the cycle back to focus cut to a bare @id
    jw = got["dcterms:creator"][0]
    assert jw["@id"] == "://a/jw"
    assert jw["foaf:name"] == [{"@value": "JW"}]
    assert jw["dcterms:isPartOf"] == [{"@id": "://w/focus"}]
    # blank node nests WITHOUT an @id
    blank = got["dcterms:references"][0]
    assert "@id" not in blank
    assert blank["dcterms:description"] == [{"@value": "blank desc"}]


def test_functional_property_single_value_and_violation():
    td = _graph()
    r = OsfmapJsonRenderer(SHORT, functional=frozenset({DCT + "title"}))
    got = r.render(td, "://w/focus")
    assert got["dcterms:title"] == {"@value": "Hello", "@language": "en"}
    td["://w/focus"][DCT + "title"].add(Literal("Second"))
    with pytest.raises(ValueError, match="at most one"):
        OsfmapJsonRenderer(
            SHORT, functional=frozenset({DCT + "title"})
        ).render(td, "://w/focus")


def test_undescribed_iri_stays_reference():
    td = {"://f": {DCT + "subject": {"://elsewhere/x"}}}
    got = OsfmapJsonRenderer(SHORT).render(td, "://f")
    assert got["dcterms:subject"] == [{"@id": "://elsewhere/x"}]


def test_spark_derive_osfmap(spark):
    rows = [
        (
            i,
            f"https://card.example/{i}",
            "@prefix dcterms: <http://purl.org/dc/terms/> . "
            f'<https://card.example/{i}> dcterms:title "Doc {i}" ; '
            f"dcterms:references _:x . "
            f'_:x dcterms:description "inner {i}" . ',
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, focus_iri string, turtle string"
    )
    out = {r["doc_id"]: json.loads(r["derived_json"])
           for r in derive_osfmap_json(df).collect()}
    assert set(out) == {0, 1, 2, 3}
    # turtle @prefix declarations drive compaction by default
    assert out[2]["dcterms:title"] == [{"@value": "Doc 2"}]
    assert out[2]["dcterms:references"][0]["dcterms:description"] == [
        {"@value": "inner 2"}
    ]
    # byte-identity with the plain-Python contract
    from share_spark.rdf import parse_turtle

    td, prefixes = parse_turtle(rows[0][2])
    assert (
        json.dumps(out[0])
        == derive_osfmap_card(td, "https://card.example/0", prefixes)
    )


def test_engine_deriver_registry_dispatch(spark, tmp_path):
    """SearchEngine.derive dispatches the full deriver registry
    (trove/derive/__init__.py:13-40 analog) and rejects unknown names."""
    import pytest as _pytest

    from share_spark.engine import SearchEngine
    from share_spark.index.build import IndexConfig

    pages = spark.createDataFrame(
        [(1, "https://c/1", "one doc")], "doc_id long, url string, text string"
    )
    engine = SearchEngine.build(
        spark, pages, str(tmp_path / "idx"), IndexConfig(block_size=32)
    )
    cards = spark.createDataFrame(
        [(1, "https://c/1",
          "@prefix dcterms: <http://purl.org/dc/terms/> . "
          "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> . "
          "@prefix osf: <https://osf.io/vocab/2022/> . "
          '<https://c/1> rdf:type osf:Preprint ; dcterms:title "T1" . ')],
        "doc_id long, focus_iri string, turtle string",
    )
    osf = engine.derive(cards, "osfmap_json").collect()
    assert json.loads(osf[0]["derived_json"])["dcterms:title"] == [{"@value": "T1"}]
    oai = engine.derive(cards, "oai_dc").collect()
    assert "<dc:title>T1</dc:title>" in oai[0]["metadata_xml"]
    meta_cards = cards.selectExpr(
        "doc_id", "focus_iri", "turtle", "doc_id AS suid_pk",
        "'c1' AS indexcard_id", "'2345-01-01T00:00:00' AS date_created",
        "'2345-02-02T00:00:00' AS date_modified", "'s' AS source_name",
        "'sl' AS source_config_label", "'u1' AS source_unique_id",
    )
    sv2 = engine.derive(meta_cards, "sharev2_elastic").collect()
    assert json.loads(sv2[0]["derived_json"])["title"] == "T1"
    with _pytest.raises(ValueError, match="unknown deriver"):
        engine.derive(cards, "nope")


OSFMAP = "https://osf.io/vocab/2022/"


def test_mini_prunes_contains_and_emptied_subjects():
    """osfmap_json_mini (trove/derive/osfmap_json_mini.py:24-37): drop
    osfmap:contains triples, then drop subjects left with no predicates —
    their referencing objects degrade to bare @id leaves."""
    from share_spark.derive_osfmap import derive_osfmap_card_mini

    td = {
        "://f": {
            DCT + "title": {Literal("T")},
            OSFMAP + "contains": {"://f/file1"},
            DCT + "creator": {"://a/1"},
        },
        # described ONLY via contains: emptied -> dropped entirely
        "://f/file1": {OSFMAP + "contains": {"://f/file1/sub"}},
        "://a/1": {FOAF + "name": {Literal("A")}},
    }
    short = dict(SHORT, osfmap=OSFMAP)
    full = json.loads(derive_osfmap_card(td, "://f", short))
    mini = json.loads(derive_osfmap_card_mini(td, "://f", short))
    assert "osfmap:contains" in full
    assert "osfmap:contains" not in mini
    # untouched predicates render identically to the full deriver
    assert mini["dcterms:title"] == full["dcterms:title"]
    assert mini["dcterms:creator"] == full["dcterms:creator"]
    assert set(mini) == {"@id", "dcterms:title", "dcterms:creator"}


def test_mini_focus_pruned_to_bare_reference():
    from share_spark.derive_osfmap import derive_osfmap_card_mini

    td = {"://f": {OSFMAP + "contains": {"://f/x"}}}
    got = json.loads(
        derive_osfmap_card_mini(td, "://f", {"osfmap": OSFMAP})
    )
    assert got == {"@id": "://f"}


def test_spark_mini_and_registry_dispatch(spark, tmp_path):
    from share_spark.derive_osfmap import derive_osfmap_json_mini
    from share_spark.engine import SearchEngine
    from share_spark.index.build import IndexConfig

    rows = [
        (
            i,
            f"https://card.example/{i}",
            "@prefix dcterms: <http://purl.org/dc/terms/> . "
            "@prefix osfmap: <https://osf.io/vocab/2022/> . "
            f'<https://card.example/{i}> dcterms:title "Doc {i}" ; '
            f"osfmap:contains <https://card.example/{i}/f> . "
            f'<https://card.example/{i}/f> dcterms:title "File {i}" . ',
        )
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, focus_iri string, turtle string"
    )
    out = {r["doc_id"]: json.loads(r["derived_json"])
           for r in derive_osfmap_json_mini(df).collect()}
    assert set(out) == {0, 1, 2}
    assert "osfmap:contains" not in out[1]
    assert out[1]["dcterms:title"] == [{"@value": "Doc 1"}]
    # engine registry dispatch
    pages = spark.createDataFrame(
        [(1, "https://c/1", "one doc")], "doc_id long, url string, text string"
    )
    engine = SearchEngine.build(
        spark, pages, str(tmp_path / "idx_mini"), IndexConfig(block_size=32)
    )
    via_engine = {r["doc_id"]: r["derived_json"]
                  for r in engine.derive(df, "osfmap_json_mini").collect()}
    assert json.loads(via_engine[2])["dcterms:title"] == [{"@value": "Doc 2"}]
