"""The SearchEngine facade drives the whole reference-equivalent surface."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from share_spark.engine import SearchEngine
from share_spark.index.build import IndexConfig


@pytest.fixture(scope="module")
def engine(spark, pages_pdf, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("eng") / "idx")
    pages = spark.createDataFrame(pages_pdf)
    from share_spark.corpus import make_doc_values

    dv = spark.createDataFrame(make_doc_values(pages_pdf))
    cards = pages.select(
        F.col("doc_id").alias("card_id"),
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("identifier"),
        F.col("warc_ts").alias("datestamp"),
        F.lit("srcA").alias("setspec"),
        F.lit("<oai_dc:dc/>").alias("metadata_xml"),
    )
    return SearchEngine.build(
        spark, pages, idx_dir,
        IndexConfig(block_size=32, chunk_docs=64),
        doc_values=dv, oai_cards=cards,
    )


def test_facade_topk_both_tiers(engine):
    dist = [(r["rank"], r["doc_id"]) for r in engine.topk("danger", k=5).collect()]
    served = [(rk, d) for d, _, rk in engine.topk("danger", k=5, serve=True)]
    assert dist == served and len(dist) == 5


def test_facade_cardsearch_and_valuesearch(engine):
    rows = engine.cardsearch(
        "cardSearchText=danger&page[size]=7"
    ).collect()
    assert 0 < len(rows) <= 7
    vs = engine.valuesearch(
        'valueSearchPropertyPath=["dcterms:subject"]&page[size]=5'
    ).collect()
    assert vs and vs[0]["match_count"] >= vs[-1]["match_count"]


def test_facade_path_type_catalog_replaces_probe(engine):
    engine._path_types = None
    engine.valuesearch(
        'valueSearchPropertyPath=["dcterms:subject"]&page[size]=3'
    ).collect()
    # one catalog job populated every path's type; later queries reuse it
    assert engine._path_types['["dcterms:subject"]'] == "iri"
    assert engine._path_types['["dcterms:created"]'] == "date"
    hist = engine.valuesearch(
        'valueSearchPropertyPath=["dcterms:created"]&page[size]=5'
    ).collect()
    assert hist and "year" in hist[0].asDict()
    # an unknown path falls back to the probe's empty-iri behavior
    assert engine._value_type_for('["no:such"]') == "iri"


def test_facade_jsonapi_include_compound_document(engine):
    from share_spark.query.params import parse_render_params

    page = engine.cardsearch("cardSearchText=danger&page[size]=3")
    rp = parse_render_params("include=%5B%22dcterms%3Asubject%22%5D")
    doc = engine.render(page, "application/vnd.api+json", render_params=rp)
    assert doc["included"], "include= must emit compound resources"
    assert all(i["type"] == '["dcterms:subject"]' for i in doc["included"])
    rels = doc["data"][0]["relationships"]['["dcterms:subject"]']["data"]
    assert rels and all("subjects.example" in r["id"] for r in rels)
    # every relationship id is present in included exactly once
    inc_ids = [i["id"] for i in doc["included"]]
    assert len(inc_ids) == len(set(inc_ids))
    assert {r["id"] for r in rels} <= set(inc_ids)
    # without include= the document shape is unchanged
    plain = engine.render(page, "application/vnd.api+json")
    assert "included" not in plain
    assert "relationships" not in plain["data"][0]


def test_facade_oaipmh_and_render(engine):
    xml = engine.oaipmh({"verb": ["Identify"]})
    assert "<Identify>" in xml
    xml = engine.oaipmh({"verb": ["ListRecords"], "metadataPrefix": ["oai_dc"]})
    assert "<record>" in xml
    page = engine.cardsearch("cardSearchText=danger&page[size]=3")
    csv_text = engine.render(page, "text/csv")
    assert csv_text.splitlines()[0].startswith("doc_id")
    doc = engine.render(page, "application/vnd.api+json")
    assert doc["data"] and doc["data"][0]["type"] == "index-card"
    with pytest.raises(ValueError):
        engine.render(page, "application/x-unknown")


def test_facade_renders_all_eight_mediatypes(engine):
    """The full renderer registry (trove/render/__init__.py:19-31 minus the
    html browse surface) dispatches from the one facade over the same page."""
    from share_spark.query.params import parse_render_params

    page = engine.cardsearch("cardSearchText=danger&page[size]=3")
    rp = parse_render_params(
        "iriShorthand[ex]=urn:result:&fields[index-card]=score"
    )
    csv_text = engine.render(page, "text/csv")
    assert csv_text.splitlines()[0].startswith("doc_id")
    tsv_text = engine.render(page, "text/tab-separated-values")
    assert tsv_text.splitlines()[0].startswith("doc_id")
    japi = engine.render(page, "application/vnd.api+json", render_params=rp)
    assert set(japi["data"][0]["attributes"]) == {"score"}  # fields applied
    jsonl = engine.render(page, "application/jsonlines")
    assert jsonl.count("\n") == 2
    ttl = engine.render(page, "text/turtle", render_params=rp)
    assert "@prefix ex: <urn:result:>" in ttl and "ex:" in ttl  # shorthand
    jld = engine.render(page, "application/ld+json", render_params=rp)
    assert '"@graph"' in jld and '"@context"' in jld
    rss = engine.render(page, "application/rss+xml")
    assert rss.startswith('<?xml') and "<rss" in rss and "<item>" in rss
    atom = engine.render(page, "application/atom+xml")
    assert "<feed" in atom and "<entry>" in atom
    html = engine.render(page, "text/html", render_params=rp)
    assert html.startswith("<!DOCTYPE html>") and "<table>" in html
    assert "<th>score</th>" in html and "<th>doc_id</th>" not in html  # fields[*]


def test_facade_ingest_refreshes_both_tiers(engine, spark, pages_pdf):
    target = [(r["doc_id"]) for _, r in enumerate(
        engine.topk("danger", k=1).collect())][0]
    changed = pages_pdf[pages_pdf.doc_id == target].copy()
    changed["text"] = "nothing relevant remains"
    changed["html"] = None
    engine.ingest(spark.createDataFrame(changed),
                  IndexConfig(block_size=32, chunk_docs=64))
    dist = [r["doc_id"] for r in engine.topk("danger", k=13).collect()]
    served = [d for d, _, _ in engine.topk("danger", k=13, serve=True)]
    assert target not in dist and target not in served
    assert dist == served


def test_engine_compact_refreshes_reader_and_server(spark, tmp_path):
    """Facade compact(): generations fold to one, the reader snapshot is
    reopened, the serve tier sees the rebuild, and a policy that declines
    leaves everything untouched."""
    import pandas as pd

    from share_spark.corpus import make_web_pages
    from share_spark.engine import SearchEngine
    from share_spark.index.build import IndexConfig
    from share_spark.streaming.incremental import CompactionPolicy

    pages = make_web_pages(120, seed=3)
    cfg = IndexConfig(block_size=32, chunk_docs=64)
    eng = SearchEngine.build(
        spark, spark.createDataFrame(pages), str(tmp_path / "idx"), cfg
    )
    target = eng.topk("danger", k=5, serve=True)[0][0]
    changed = pages[pages.doc_id == target].copy()
    changed["text"] = "pangolin replacement"
    changed["html"] = None
    eng.ingest(spark.createDataFrame(changed), cfg)
    assert len(eng.reader.manifest["generations"]) == 2
    # declining policy: no-op
    assert eng.compact(cfg, policy=CompactionPolicy(
        max_generations=50, max_tombstone_frac=1e9
    )) is None
    assert len(eng.reader.manifest["generations"]) == 2
    # unconditional compact: single generation, both paths see new content
    m = eng.compact(cfg)
    assert m is not None
    assert eng.reader.manifest["generations"] == [0]
    assert [r[0] for r in eng.topk("pangolin", k=5, serve=True)] == [target]
    assert {r["doc_id"] for r in eng.topk("pangolin", k=5).collect()} == {
        target
    }
