"""oai_dc XML deriver (derive_oaidc.py) — element set/order golden tests
(trove/derive/oaidc_xml.py:67-141 contract) and the OAI lifecycle consuming
REAL derived XML end-to-end (r3 verdict Next-round #6): turtle cards ->
derive_oai_metadata -> build_oai_cards -> verb handlers."""

from __future__ import annotations

from datetime import datetime, timezone

from share_spark.derive_oaidc import derive_oai_dc
from share_spark.derive_sharev2 import (
    DCTERMS,
    FOAF,
    OSFMAP,
    RDF_NS,
    SKOS,
)
from share_spark.rdf import Literal

OWL = "http://www.w3.org/2002/07/owl#"


def _graph():
    return {
        "://card/1": {
            RDF_NS + "type": {OSFMAP + "Registration"},
            DCTERMS + "title": {Literal("IA & IMLS <Demo>")},
            DCTERMS + "creator": {"://agent/jw"},
            DCTERMS + "publisher": {"://agent/osf"},
            DCTERMS + "created": {Literal("2021-10-18")},
            DCTERMS + "identifier": {
                Literal("https://doi.example/10.17605/2C4ST"),
                Literal("https://osf.example/2c4st"),
            },
            DCTERMS + "subject": {"://subj/edu", Literal("plain subject")},
            DCTERMS + "language": {Literal("en")},
            DCTERMS + "hasPart": {"://card/child"},
            OSFMAP + "hasDataResource": {"://data/x"},
        },
        "://agent/jw": {FOAF + "name": {Literal("JW")}},
        "://agent/osf": {FOAF + "name": {Literal("OSF Registries")}},
        "://subj/edu": {SKOS + "prefLabel": {Literal("Education")}},
    }


def test_oaidc_golden_element_order():
    xml = derive_oai_dc(_graph(), "://card/1")
    assert xml.startswith(
        '<oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"'
    )
    assert 'xsi:schemaLocation=' in xml and xml.endswith("</oai_dc:dc>")
    assert "<dc:title>IA &amp; IMLS &lt;Demo&gt;</dc:title>" in xml
    assert "<dc:creator>JW</dc:creator>" in xml
    assert "<dc:publisher>OSF Registries</dc:publisher>" in xml
    # subjects: both the literal and the labeled-IRI form, sorted
    assert xml.index("<dc:subject>Education</dc:subject>") < xml.index(
        "<dc:subject>plain subject</dc:subject>"
    )
    # date: created fallback, Z-formatted (datetime_isoformat_z parity)
    assert "<dc:date>2021-10-18T00:00:00Z</dc:date>" in xml
    assert "<dc:type>Registration</dc:type>" in xml
    assert (
        "<dc:identifier>https://doi.example/10.17605/2C4ST</dc:identifier>"
        in xml
    )
    assert "<dc:language>en</dc:language>" in xml
    # relations: hasPart + hasDataResource, sorted IRIs
    assert xml.count("<dc:relation>") == 2
    # element-group ORDER is the deriver contract (oaidc_xml.py:82-141)
    order = ["dc:title", "dc:creator", "dc:subject", "dc:publisher",
             "dc:date", "dc:type", "dc:identifier", "dc:language",
             "dc:relation"]
    idxs = [xml.index("<" + t + ">") for t in order]
    assert idxs == sorted(idxs)


def test_oaidc_skip_and_date_priority():
    td = _graph()
    td["://card/1"][RDF_NS + "type"] = {"://other/Thing"}
    assert derive_oai_dc(td, "://card/1") is None
    td2 = _graph()
    td2["://card/1"][DCTERMS + "date"] = {Literal("2022-01-01")}
    xml = derive_oai_dc(td2, "://card/1")
    assert "<dc:date>2022-01-01T00:00:00Z</dc:date>" in xml  # date beats created


def test_oai_lifecycle_consumes_derived_xml(spark):
    """End-to-end: turtle cards through the REAL deriver into the OAI verb
    surface — ListRecords/GetRecord payloads carry the derived elements,
    and out-of-scope focus types vanish (deriver-filter semantics)."""
    from share_spark.derive_sharev2 import OSFMAP as OSF_NS
    from share_spark.derive_sharev2 import SHAREV2 as SV2_NS
    from share_spark.oaipmh import (
        OaiRepository,
        build_oai_cards,
        derive_oai_metadata,
    )

    rows = []
    for i in range(6):
        typ = "osf:Preprint" if i != 4 else "sv2:Article"  # card 4 skips
        ttl = (
            "@prefix dcterms: <http://purl.org/dc/terms/> . "
            "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> . "
            f"@prefix osf: <{OSF_NS}> . @prefix sv2: <{SV2_NS}> . "
            f"<https://card.example/{i}> rdf:type {typ} ; "
            f'dcterms:title "Derived doc {i}" ; '
            f'dcterms:created "2021-10-{10 + i}" . '
        )
        rows.append((i, f"https://card.example/{i}", ttl))
    turtle_cards = spark.createDataFrame(
        rows, "card_id long, focus_iri string, turtle string"
    )
    derived = derive_oai_metadata(turtle_cards)
    got = {r["card_id"]: r for r in derived.collect()}
    assert set(got) == {0, 1, 2, 3, 5}
    assert all(r["deriver_id"] == "oai_dc" for r in got.values())
    assert "<dc:title>Derived doc 0</dc:title>" in got[0]["derived_text"]

    cards = spark.createDataFrame(
        [(i, i * 10, None) for i in range(6)],
        "card_id long, suid_id long, deleted int",
    )
    latest = spark.createDataFrame(
        [(i, datetime(2001, 1, 1 + i, 12, 0, 0)) for i in range(6)],
        "card_id long, modified timestamp",
    )
    suids = spark.createDataFrame(
        [(i * 10, f"uuid-{i:04d}", 0) for i in range(6)],
        "suid_id long, identifier string, source_config_id long",
    )
    source_configs = spark.createDataFrame(
        [(0, "src0")], "source_config_id long, source_name string"
    )
    built = build_oai_cards(cards, latest, suids, source_configs, derived)
    repo = OaiRepository(
        built, sets=[("src0", "Source Zero")],
        now=datetime(2002, 2, 2, tzinfo=timezone.utc),
    )

    def req(**kw):
        return repo.handle_request({k: [v] for k, v in kw.items()})

    lst = req(verb="ListRecords", metadataPrefix="oai_dc")
    assert "<dc:title>Derived doc 0</dc:title>" in lst
    assert "Derived doc 4" not in lst  # skipped by the deriver
    one = req(verb="GetRecord", metadataPrefix="oai_dc",
              identifier="oai:share.example:uuid-0002")
    assert "<dc:title>Derived doc 2</dc:title>" in one
    assert "<dc:date>2021-10-12T00:00:00Z</dc:date>" in one
