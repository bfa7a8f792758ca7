"""Card-level sharev2_elastic deriver — golden input/output tests in the
reference harness shape (tests/trove/_input_output_tests.py:7-70,
tests/trove/derive/_base.py:14-53): fixture graphs translated from
tests/trove/derive/_inputs.py, expected JSON from
tests/trove/derive/test_sharev2_elastic.py (byte contract: same dict after
json.loads; the serialized form is pinned separately via sort_keys)."""

from __future__ import annotations

import datetime
import json

import pytest

from share_spark.derive import obfuscate_id
from share_spark.derive_sharev2 import (
    DCAT,
    DCTERMS,
    FOAF,
    OSFMAP,
    RDF_NS,
    SHAREV2,
    SKOS,
    CardMeta,
    derive_card,
    derive_sharev2_elastic,
)
from share_spark.rdf import Literal

BLARG = "https://blarg.example/blarg/"
OWL = "http://www.w3.org/2002/07/owl#"

META = CardMeta(
    suid_pk=7,
    indexcard_id="--indexcard-id--",
    date_created="2345-01-01T00:00:00",
    date_modified="2345-02-02T00:00:00",
    source_name="--source-title--",
    source_config_label="--sourceconfig-label--",
    source_unique_id="--sourceunique-id--",
)

_META_JSON = {
    "id": obfuscate_id(7),
    "indexcard_id": "--indexcard-id--",
    "date_created": "2345-01-01T00:00:00",
    "date_modified": "2345-02-02T00:00:00",
    "sources": ["--source-title--"],
    "source_config": "--sourceconfig-label--",
    "source_unique_id": "--sourceunique-id--",
}


def test_skip_unknown_focustype():
    """blarg-item: focus type outside the allowed set -> should_skip
    (sharev2_elastic.py:140-152)."""
    td = {
        BLARG + "my_item": {
            RDF_NS + "type": {BLARG + "Item"},
            DCTERMS + "title": {Literal("title", lang="en")},
        },
    }
    assert derive_card(td, BLARG + "my_item", META) is None


def test_blarg_project_golden():
    """blarg-project fixture -> the reference's exact expected JSON
    (test_sharev2_elastic.py 'blarg-project')."""
    td = {
        BLARG + "my_project": {
            RDF_NS + "type": {BLARG + "Item", OSFMAP + "Project"},
            DCTERMS + "title": {Literal("title", lang="en")},
            DCTERMS + "creator": {BLARG + "me"},
            DCTERMS + "created": {Literal("2024-02-14")},
        },
        BLARG + "me": {
            RDF_NS + "type": {FOAF + "Person"},
            FOAF + "name": {Literal("me me")},
        },
    }
    got = derive_card(td, BLARG + "my_project", META)
    expected = {
        **_META_JSON,
        "contributors": ["me me"],
        "date": "2024-02-14",
        "date_published": "2024-02-14",
        "lists": {
            "contributors": [
                {
                    "cited_as": "me me",
                    "name": "me me",
                    "relation": "http://purl.org/dc/terms/creator",
                }
            ]
        },
        "osf_related_resource_types": {
            "analytic_code": False,
            "data": False,
            "materials": False,
            "papers": False,
            "supplements": False,
        },
        "retracted": False,
        "title": "title",
        "type": "project",
        "types": ["project"],
        "withdrawn": False,
    }
    assert json.loads(got) == expected
    # serialized-form contract: sorted keys, default separators
    assert got == json.dumps(expected, sort_keys=True)


def test_osfmap_registration_golden():
    """The reference's richest golden case ('osfmap-registration'):
    contributors/publishers/hosts agent lists, skos subject lineage, tags,
    multi-identifiers, type backcompat via OSFMAP->SHAREv2."""
    d = datetime.date(2021, 10, 18)
    td = {
        "https://api.osf.example/v2/subjects/584240da54be81056cecaae5": {
            RDF_NS + "type": {SKOS + "Concept"},
            SKOS + "inScheme": {"https://bepress.com/reference_guide_dc/disciplines/"},
            SKOS + "prefLabel": {Literal("Education")},
        },
        "https://osf.example/2c4st": {
            RDF_NS + "type": {OSFMAP + "Registration"},
            DCTERMS + "conformsTo": {
                "https://api.osf.example/v2/schemas/registrations/x/"
            },
            DCTERMS + "created": {d},
            DCTERMS + "creator": {"https://osf.example/bhcjn"},
            DCTERMS + "dateCopyrighted": {Literal("2021")},
            DCTERMS + "description": {Literal("This registration tree is intended to demonstrate linkages between the OSF view of a Registration and the Internet Archive view")},
            DCTERMS + "hasPart": {"https://osf.example/482n5"},
            DCTERMS + "identifier": {
                Literal("https://doi.example/10.17605/OSF.IO/2C4ST"),
                Literal("https://osf.example/2c4st"),
            },
            DCTERMS + "isVersionOf": {"https://osf.example/hnm67"},
            DCTERMS + "modified": {d},
            DCTERMS + "publisher": {"https://osf.example/registries/osf"},
            DCTERMS + "subject": {
                "https://api.osf.example/v2/subjects/584240da54be81056cecaae5"
            },
            DCTERMS + "title": {Literal("IA/IMLS Demo")},
            OWL + "sameAs": {"https://doi.example/10.17605/OSF.IO/2C4ST"},
            DCAT + "accessService": {"https://osf.example"},
            OSFMAP + "keyword": {
                Literal("Demo"), Literal("IA"), Literal("IMLS"), Literal("OSF")
            },
        },
        "https://osf.example": {
            RDF_NS + "type": {DCTERMS + "Agent", FOAF + "Organization"},
            DCTERMS + "identifier": {Literal("https://osf.example")},
            FOAF + "name": {Literal("OSF")},
        },
        "https://osf.example/registries/osf": {
            RDF_NS + "type": {DCTERMS + "Agent", FOAF + "Organization"},
            DCTERMS + "identifier": {
                Literal("https://osf.example/"),
                Literal("https://osf.io/registries/osf"),
            },
            FOAF + "name": {Literal("OSF Registries")},
        },
        "https://osf.example/bhcjn": {
            RDF_NS + "type": {DCTERMS + "Agent", FOAF + "Person"},
            DCTERMS + "identifier": {Literal("https://osf.example/bhcjn")},
            FOAF + "name": {Literal("JW")},
        },
    }
    got = derive_card(td, "https://osf.example/2c4st", META)
    expected = {
        **_META_JSON,
        "contributors": ["JW"],
        "date": "2021-10-18",
        "date_published": "2021-10-18",
        "date_updated": "2021-10-18",
        "description": "This registration tree is intended to demonstrate linkages between the OSF view of a Registration and the Internet Archive view",
        "hosts": ["OSF"],
        "identifiers": [
            "https://doi.example/10.17605/OSF.IO/2C4ST",
            "https://osf.example/2c4st",
        ],
        "lists": {
            "contributors": [
                {
                    "cited_as": "JW",
                    "identifiers": ["https://osf.example/bhcjn"],
                    "name": "JW",
                    "relation": "http://purl.org/dc/terms/creator",
                }
            ],
            "hosts": [
                {
                    "cited_as": "OSF",
                    "identifiers": ["https://osf.example"],
                    "name": "OSF",
                    "relation": "http://www.w3.org/ns/dcat#accessService",
                }
            ],
            "publishers": [
                {
                    "cited_as": "OSF Registries",
                    "identifiers": [
                        "https://osf.example/",
                        "https://osf.io/registries/osf",
                    ],
                    "name": "OSF Registries",
                    "relation": "http://purl.org/dc/terms/publisher",
                }
            ],
        },
        "osf_related_resource_types": {
            "analytic_code": False,
            "data": False,
            "materials": False,
            "papers": False,
            "supplements": False,
        },
        "publishers": ["OSF Registries"],
        "retracted": False,
        "subjects": ["bepress|Education"],
        "tags": ["Demo", "IA", "IMLS", "OSF"],
        "title": "IA/IMLS Demo",
        "type": "registration",
        "types": ["registration"],
        "withdrawn": False,
    }
    assert json.loads(got) == expected


def test_work_lineage_and_withdrawn():
    """isPartOf lineage root-first (sharev2_elastic.py:348-367) and the
    dateWithdrawn -> retracted/withdrawn booleans."""
    td = {
        "://w/leaf": {
            RDF_NS + "type": {OSFMAP + "Project"},
            DCTERMS + "title": {Literal("leaf")},
            DCTERMS + "isPartOf": {"://w/mid"},
            OSFMAP + "dateWithdrawn": {Literal("2020-01-01")},
            OSFMAP + "hasDataResource": {"://data"},
        },
        "://w/mid": {
            RDF_NS + "type": {OSFMAP + "Project"},
            DCTERMS + "title": {Literal("mid")},
            DCTERMS + "isPartOf": {"://w/root"},
        },
        "://w/root": {
            RDF_NS + "type": {OSFMAP + "Registration"},
            DCTERMS + "title": {Literal("root")},
        },
    }
    got = json.loads(derive_card(td, "://w/leaf", META))
    assert got["retracted"] is True and got["withdrawn"] is True
    assert got["osf_related_resource_types"]["data"] is True
    assert got["osf_related_resource_types"]["papers"] is False
    assert [x["title"] for x in got["lists"]["lineage"]] == ["root", "mid"]
    assert got["lists"]["lineage"][0]["type"] == "registration"


def test_lineage_cycle_guard():
    td = {
        "://w/a": {
            RDF_NS + "type": {OSFMAP + "Project"},
            DCTERMS + "isPartOf": {"://w/b"},
            DCTERMS + "title": {Literal("a")},
        },
        "://w/b": {
            DCTERMS + "isPartOf": {"://w/a"},
            DCTERMS + "title": {Literal("b")},
        },
    }
    got = json.loads(derive_card(td, "://w/a", META))
    # lineage lists ancestors root-first; the b->a backedge is cut by the
    # cycle guard, so a's only ancestor is b
    assert [x["title"] for x in got["lists"]["lineage"]] == ["b"]


def test_spark_derive_turtle_roundtrip(spark):
    """Vectorized mapInPandas path: turtle column -> derived_json; skipped
    cards drop (or stay NULL with keep_skipped)."""
    rows = []
    for i in range(6):
        typ = "osf:Preprint" if i % 2 == 0 else "sv2:Article"
        ttl = (
            "@prefix dcterms: <http://purl.org/dc/terms/> . "
            "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> . "
            "@prefix foaf: <http://xmlns.com/foaf/0.1/> . "
            f"@prefix osf: <{OSFMAP}> . @prefix sv2: <{SHAREV2}> . "
            f"<https://card.example/{i}> rdf:type {typ} ; "
            f'dcterms:title "Doc {i}" ; '
            f"dcterms:creator <https://agent.example/a{i % 3}> . "
            f"<https://agent.example/a{i % 3}> rdf:type sv2:Person ; "
            f'foaf:name "Agent {i % 3}" . '
        )
        rows.append((
            i, f"https://card.example/{i}", ttl, i, f"card-{i}",
            "2345-01-01T00:00:00", "2345-02-02T00:00:00",
            "srcname", "srclabel", f"uid-{i}",
        ))
    df = spark.createDataFrame(
        rows,
        "doc_id long, focus_iri string, turtle string, suid_pk long, "
        "indexcard_id string, date_created string, date_modified string, "
        "source_name string, source_config_label string, "
        "source_unique_id string",
    )
    out = {r["doc_id"]: r["derived_json"]
           for r in derive_sharev2_elastic(df).collect()}
    assert set(out) == {0, 2, 4}  # sv2:Article focus types skip
    doc0 = json.loads(out[0])
    assert doc0["type"] == "preprint" and doc0["types"] == ["preprint"]
    assert doc0["contributors"] == ["Agent 0"]
    assert doc0["id"] == obfuscate_id(0)
    assert doc0["lists"]["contributors"][0]["types"] == ["person"]
    # byte-identity with the plain-Python contract on the same graph
    from share_spark.rdf import parse_turtle

    td, _ = parse_turtle(rows[0][2])
    meta = CardMeta(0, "card-0", "2345-01-01T00:00:00",
                    "2345-02-02T00:00:00", "srcname", "srclabel", "uid-0")
    assert out[0] == derive_card(td, "https://card.example/0", meta)

    kept = derive_sharev2_elastic(df, keep_skipped=True).collect()
    assert len(kept) == 6
    assert sum(r["derived_json"] is None for r in kept) == 3
