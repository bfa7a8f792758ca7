"""suid backcompat/forecompat joins, doc-build skip predicate, render params."""

from share_spark.query.params import parse_render_params
from share_spark.suid import (
    backcompat_suid_ids,
    filter_buildable,
    forecompat_replaced_suid_ids,
)


def _fixtures(spark):
    # sources: source 1 has legacy v2_push config 10 and modern config 11;
    # source 2 has only v2_push config 20
    configs = spark.createDataFrame(
        [(10, 1, "v2_push"), (11, 1, None), (20, 2, "v2_push")],
        "source_config_id long, source_id long, transformer_key string",
    )
    suids = spark.createDataFrame(
        [
            (100, "rec-a", 10),  # legacy, HAS modern successor (101) -> dead
            (101, "rec-a", 11),  # modern
            (102, "rec-b", 10),  # legacy, no successor -> alive
            (200, "rec-a", 20),  # other source, v2_push, no successor
            (103, "rec-c", 11),  # modern only
        ],
        "suid_id long, identifier string, source_config_id long",
    )
    return suids, configs


def test_backcompat_lookup(spark):
    suids, configs = _fixtures(spark)
    got = {
        (r["suid_id"], r["backcompat_suid_id"])
        for r in backcompat_suid_ids(suids, configs).collect()
    }
    # every suid maps to the v2_push suid sharing (identifier, source)
    assert (101, 100) in got  # modern rec-a -> legacy twin
    assert (100, 100) in got  # v2_push maps to itself
    assert (200, 200) in got
    # rec-c has no v2_push twin: absent (DoesNotExist analog)
    assert not any(s == 103 for s, _ in got)


def test_forecompat_replacement(spark):
    suids, configs = _fixtures(spark)
    dead = {r["suid_id"] for r in forecompat_replaced_suid_ids(suids, configs).collect()}
    assert dead == {100}


def test_filter_buildable_skip_predicate(spark):
    suids, configs = _fixtures(spark)
    docs = spark.createDataFrame(
        [(1, 100), (2, 101), (3, 102), (4, 103)], "doc_id long, suid_id long"
    )
    dv = spark.createDataFrame(
        [
            (1, '["dcterms:title"]', "T1", None),
            (2, '["dcterms:title"]', "T2", None),
            (3, '["osf:other"]', "x", None),  # NOT name-like
            (4, '["foaf:name"]', None, "https://n.example/x"),  # iri name ok
        ],
        "doc_id long, path_key string, text_value string, iri_value string",
    )
    kept = {
        r["doc_id"]
        for r in filter_buildable(
            docs, dv, suids=suids, source_configs=configs
        ).collect()
    }
    # doc 1: named but forecompat-replaced suid -> skipped
    # doc 3: suid fine but no name-like value -> skipped
    assert kept == {2, 4}


def test_parse_render_params():
    p = parse_render_params(
        "blendCards=true&iriShorthand[osf]=https://osf.example/vocab/"
        "&include=creator,subject&fields[Preprint]=title,dateCreated"
        "&fields=sameAs"
    )
    assert p.blend_cards is True
    assert p.shorthand_map() == {"osf": "https://osf.example/vocab/"}
    assert p.included_relations == ("creator", "subject")
    assert p.fields_for("Preprint") == ("title", "dateCreated")
    assert p.fields_for("Registration") == ("sameAs",)  # the fields[*] bucket
    assert parse_render_params("").blend_cards is None  # absent: tri-state
    assert parse_render_params("blendCards=0").blend_cards is False
    assert parse_render_params("q=x").fields_for("Anything") is None


def test_propertypath_shorthand_expansion():
    """Dot-delimited shorthand paths expand to the canonical JSON path_key
    (trove/util/propertypath.py:48-66 parse_propertypath semantics);
    canonical, single-step, and IRI-bearing paths pass through."""
    import pytest as _pytest

    from share_spark.query.params import (
        parse_cardsearch,
        parse_valuesearch,
        propertypath_key,
    )

    assert (
        propertypath_key("dcterms:creator.foaf:name")
        == '["dcterms:creator", "foaf:name"]'
    )
    assert propertypath_key('["a", "b"]') == '["a", "b"]'
    assert propertypath_key("title") == "title"  # plain field-key name
    assert propertypath_key("dcterms:title") == '["dcterms:title"]'
    assert propertypath_key("https://x.example/p.q") == "https://x.example/p.q"
    with _pytest.raises(ValueError, match="all \\*"):
        propertypath_key("*.foaf:name")

    p = parse_cardsearch(
        "cardSearchFilter[dcterms:creator.foaf:name][any-of]=%3A%2F%2Fa"
        "&sort=-osf:stats.osf:downloads"
        "&cardSearchText[dcterms:title]=hello"
    )
    assert p.filters[0].paths == ('["dcterms:creator", "foaf:name"]',)
    assert p.sort.field == '["osf:stats", "osf:downloads"]'
    assert p.sort.descending
    assert p.text_paths == ('["dcterms:title"]',)
    # reference dot-form glob '*.*' == legacy '**' == depth 2
    g = parse_cardsearch("cardSearchFilter[*.*][is-present]=")
    assert g.filters[0].glob_depth == 2 and g.filters[0].paths == ()

    vp = parse_valuesearch(
        "valueSearchPropertyPath=dcterms:subject.skos:prefLabel"
    )
    assert vp.value_path == '["dcterms:subject", "skos:prefLabel"]'
