"""OAI-PMH verb surface + XML renderers (golden-style assertions)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from share_spark.oaipmh import PAGE_SIZE, OaiRepository
from share_spark.render import (
    prepare_xml_string,
    strip_illegal_xml_chars,
    to_atom,
    to_jsonld,
    to_rss,
    to_turtle,
)


@pytest.fixture(scope="module")
def repo(spark):
    rows = [
        (
            i,
            f"uuid-{i:04d}",
            datetime(2001, 1, 1 + (i % 27), 12, 0, 0),
            f"src{i % 3}",
            f"<oai_dc:dc><dc:title>Doc {i}</dc:title></oai_dc:dc>",
        )
        for i in range(40)
    ]
    cards = spark.createDataFrame(
        rows, "card_id long, identifier string, datestamp timestamp, "
              "setspec string, metadata_xml string"
    )
    return OaiRepository(
        cards,
        sets=[("src0", "Source Zero"), ("src1", "Source One")],
        now=datetime(2002, 2, 2, tzinfo=timezone.utc),
    )


def _req(repo, **kw):
    return repo.handle_request({k: [v] for k, v in kw.items()})


def test_identify(repo):
    xml = _req(repo, verb="Identify")
    assert xml.startswith('<?xml version="1.0" encoding="UTF-8"?><OAI-PMH')
    assert "<repositoryName>share_spark/trove</repositoryName>" in xml
    assert "<earliestDatestamp>2001-01-01T12:00:00Z</earliestDatestamp>" in xml
    assert "<granularity>YYYY-MM-DD</granularity>" in xml
    assert "<sampleIdentifier>oai:share.example:0</sampleIdentifier>" in xml


def test_identify_caches_earliest_datestamp(repo):
    """The min(datestamp) scan must run at most once per repository
    instance — a second Identify serves from the memo with no Spark job."""
    fresh = OaiRepository(
        repo.cards, now=datetime(2002, 2, 2, tzinfo=timezone.utc)
    )
    first = _req(fresh, verb="Identify")
    calls = []
    real_agg = fresh.cards.agg
    fresh.cards = type(
        "Spy", (),
        {"agg": lambda self, *a, **k: calls.append(1) or real_agg(*a, **k)},
    )()
    second = _req(fresh, verb="Identify")
    assert calls == []  # no new aggregation job issued
    assert (
        "<earliestDatestamp>2001-01-01T12:00:00Z</earliestDatestamp>" in second
    )
    assert first == second


def test_list_metadata_formats_and_sets(repo):
    xml = _req(repo, verb="ListMetadataFormats")
    assert "<metadataPrefix>oai_dc</metadataPrefix>" in xml
    xml = _req(repo, verb="ListSets")
    assert "<setSpec>src0</setSpec><setName>Source Zero</setName>" in xml


def test_list_records_full_pagination_walk(repo):
    seen = []
    token = None
    pages = 0
    while True:
        if token is None:
            xml = _req(repo, verb="ListRecords", metadataPrefix="oai_dc")
        else:
            xml = _req(repo, verb="ListRecords", resumptionToken=token)
        ids = [
            part.split("</identifier>")[0]
            for part in xml.split("<identifier>")[1:]
        ]
        seen.extend(ids)
        pages += 1
        if "<resumptionToken>" in xml:
            token = xml.split("<resumptionToken>")[1].split("</resumptionToken>")[0]
        else:
            assert "<resumptionToken/>" in xml
            break
    assert len(seen) == 40
    assert len(set(seen)) == 40
    assert pages == (40 + PAGE_SIZE - 1) // PAGE_SIZE
    assert seen == sorted(seen)  # keyset order by card_id
    assert "<metadata><oai_dc:dc>" in xml


def test_list_identifiers_filters(repo):
    xml = _req(
        repo, verb="ListIdentifiers", metadataPrefix="oai_dc", set="src1"
    )
    assert "<header>" in xml and "<metadata>" not in xml
    ids = [p.split("</identifier>")[0] for p in xml.split("<identifier>")[1:]]
    # src1 = card ids with i % 3 == 1
    assert all(int(i.rsplit("-", 1)[1]) % 3 == 1 for i in ids)

    xml = _req(
        repo, verb="ListIdentifiers", metadataPrefix="oai_dc",
        **{"from": "2001-01-20T00:00:00", "until": "2001-01-22T23:59:59"},
    )
    ids = [p.split("</identifier>")[0] for p in xml.split("<identifier>")[1:]]
    assert ids and all(19 <= int(i.rsplit("-", 1)[1]) % 27 <= 21 for i in ids)


def test_get_record_and_errors(repo):
    xml = _req(
        repo, verb="GetRecord", metadataPrefix="oai_dc",
        identifier="oai:share.example:uuid-0007",
    )
    assert "<GetRecord><record><header>" in xml
    assert "<dc:title>Doc 7</dc:title>" in xml

    assert 'code="idDoesNotExist"' in _req(
        repo, verb="GetRecord", metadataPrefix="oai_dc",
        identifier="oai:share.example:nope",
    )
    assert 'code="idDoesNotExist"' in _req(
        repo, verb="GetRecord", metadataPrefix="oai_dc",
        identifier="wrong:format",
    )
    assert 'code="badVerb"' in _req(repo, verb="Bogus")
    assert 'code="cannotDisseminateFormat"' in _req(
        repo, verb="ListRecords", metadataPrefix="marc21"
    )
    assert 'code="badArgument"' in _req(
        repo, verb="Identify", metadataPrefix="oai_dc"
    )
    assert 'code="badArgument"' in _req(repo, verb="ListRecords")
    assert 'code="badResumptionToken"' in _req(
        repo, verb="ListRecords", resumptionToken="not|a|token"
    )
    assert 'code="noRecordsMatch"' in _req(
        repo, verb="ListRecords", metadataPrefix="oai_dc", set="nosuchset"
    )


def test_turtle_golden():
    triples = [
        ("https://x.example/doc/1", "http://purl.org/dc/terms/title", "A \"quoted\" title", "literal"),
        ("https://x.example/doc/1", "http://purl.org/dc/terms/subject", "https://x.example/subj/s1", "iri"),
        ("https://x.example/doc/1", "http://purl.org/dc/terms/subject", "https://x.example/subj/s0", "iri"),
        ("https://x.example/doc/2", "http://purl.org/dc/terms/title", "two", "literal"),
    ]
    got = to_turtle(triples, prefixes={"dcterms": "http://purl.org/dc/terms/"})
    want = (
        "@prefix dcterms: <http://purl.org/dc/terms/> .\n"
        "\n"
        "<https://x.example/doc/1>\n"
        '    dcterms:subject <https://x.example/subj/s0>, <https://x.example/subj/s1> ;\n'
        '    dcterms:title "A \\"quoted\\" title" .\n'
        "<https://x.example/doc/2>\n"
        '    dcterms:title "two" .\n'
    )
    assert got == want


def test_jsonld_golden():
    triples = [
        ("https://x.example/doc/1", "dcterms:title", "one", "literal"),
        ("https://x.example/doc/1", "dcterms:subject", "https://x.example/s/0", "iri"),
    ]
    got = to_jsonld(triples, context={"dcterms": "http://purl.org/dc/terms/"})
    import json

    doc = json.loads(got)
    assert doc["@context"] == {"dcterms": "http://purl.org/dc/terms/"}
    assert doc["@graph"] == [
        {
            "@id": "https://x.example/doc/1",
            "dcterms:subject": [{"@id": "https://x.example/s/0"}],
            "dcterms:title": ["one"],
        }
    ]


def test_rss_and_atom_feeds(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello & <world>", "https://x.example/1", "d\x00esc", "2001-01-01"),
            (2, "Pre&amp;escaped", "https://x.example/2", "ok", "2001-01-02"),
        ],
        "id long, title string, link string, description string, date string",
    )
    rss = to_rss(
        df, title="Feed & Co", link="https://x.example/rss",
        description="updates",
    )
    # illegal char stripped, entities unescaped then re-escaped exactly once
    assert "<title>Hello &amp; &lt;world&gt;</title>" in rss
    assert "<description>desc</description>" in rss
    assert "<title>Pre&amp;escaped</title>" in rss
    assert "\x00" not in rss

    atom = to_atom(
        df, title="Feed", link="https://x.example/atom",
        feed_id="urn:feed", updated="2001-01-02T00:00:00Z",
    )
    assert '<feed xmlns="http://www.w3.org/2005/Atom">' in atom
    assert '<link href="https://x.example/1"/>' in atom
    assert "<entry>" in atom


def test_strip_illegal_and_prepare():
    assert strip_illegal_xml_chars("a\x00b\x0bc￾") == "abc"
    assert prepare_xml_string("x &amp; y") == "x & y"
    assert prepare_xml_string(None) is None
    assert prepare_xml_string("") == ""


def test_build_oai_cards_joins_and_all_verbs(spark):
    """build_oai_cards derives the cards table from normalized inputs
    (indexcard_repository.py:244-271 annotate subqueries as joins):
    deleted cards excluded, latest description wins, setspec via the
    suid->source_config dim, other derivers filtered out — and the full
    six-verb surface runs over the result."""
    from datetime import datetime

    from share_spark.oaipmh import build_oai_cards

    cards = spark.createDataFrame(
        [(i, i * 10, 1 if i == 3 else None) for i in range(6)],
        "card_id long, suid_id long, deleted int",
    )
    latest = spark.createDataFrame(
        [(i, datetime(2001, 1, 1 + i, 12, 0, 0)) for i in range(6)]
        + [(2, datetime(2000, 5, 5))],  # older decoy for card 2
        "card_id long, modified timestamp",
    )
    suids = spark.createDataFrame(
        [(i * 10, f"uuid-{i:04d}", i % 2) for i in range(6)],
        "suid_id long, identifier string, source_config_id long",
    )
    source_configs = spark.createDataFrame(
        [(0, "src0"), (1, "src1")],
        "source_config_id long, source_name string",
    )
    derived = spark.createDataFrame(
        [(i, "oai_dc", f"<oai_dc:dc><dc:title>Doc {i}</dc:title></oai_dc:dc>")
         for i in range(6) if i != 4]
        + [(4, "turtle", "<ttl/>")],  # wrong deriver: card 4 not exposed
        "card_id long, deriver_id string, derived_text string",
    )
    built = build_oai_cards(cards, latest, suids, source_configs, derived)
    rows = {r["card_id"]: r for r in built.collect()}
    assert set(rows) == {0, 1, 2, 5}  # 3 deleted, 4 wrong deriver
    assert rows[2]["datestamp"] == datetime(2001, 1, 3, 12, 0, 0)  # max wins
    assert rows[5]["setspec"] == "src1" and rows[0]["identifier"] == "uuid-0000"

    repo2 = OaiRepository(
        built, sets=[("src0", "Source Zero"), ("src1", "Source One")],
        now=datetime(2002, 2, 2, tzinfo=timezone.utc),
    )
    assert "<Identify>" in _req(repo2, verb="Identify")
    assert "oai_dc" in _req(repo2, verb="ListMetadataFormats")
    assert "<setSpec>src0</setSpec>" in _req(repo2, verb="ListSets")
    li = _req(repo2, verb="ListIdentifiers", metadataPrefix="oai_dc")
    assert li.count("<header>") == 4
    lr = _req(repo2, verb="ListRecords", metadataPrefix="oai_dc")
    assert lr.count("<record>") == 4 and "Doc 5" in lr and "Doc 4" not in lr
    gr = _req(repo2, verb="GetRecord", metadataPrefix="oai_dc",
              identifier=repo2.oai_identifier("uuid-0002"))
    assert "Doc 2" in gr and "2001-01-03T12:00:00Z" in gr
