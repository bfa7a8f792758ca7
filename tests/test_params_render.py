"""Query-param surface, renderers, highlights."""

import pytest
from pyspark.sql import functions as F

from share_spark import render
from share_spark.corpus import make_doc_values
from share_spark.query.highlight import make_snippet, with_highlights
from share_spark.query.paging import PageCursor
from share_spark.query.params import (
    CardsearchParams,
    compile_cardsearch,
    compile_valuesearch,
    parse_cardsearch,
    parse_valuesearch,
)
from share_spark.query.wand import wand_topk

SUBJ = '["dcterms:subject"]'
CREATED = '["dcterms:created"]'


@pytest.fixture(scope="module")
def dv(spark, pages_pdf):
    return spark.createDataFrame(make_doc_values(pages_pdf)).cache()


def test_parse_cardsearch_full_surface():
    qs = (
        "cardSearchText=danger%20-warning"
        f"&cardSearchFilter[{SUBJ}][any-of]=https://subjects.example/s0/"
        f"&cardSearchFilter[{CREATED}][after]=1999"
        "&sort=-dateCreated&page[size]=7"
    )
    p = parse_cardsearch(qs)
    assert p.texts == ("danger -warning",)
    assert len(p.filters) == 2
    ops = {f.op for f in p.filters}
    assert ops == {"any-of", "after"}
    assert p.sort.field == "dateCreated" and p.sort.descending
    assert p.page_size == 7


def test_parse_sort_relevance_noop():
    p = parse_cardsearch("cardSearchText=x&sort=-relevance")
    assert p.sort is None  # search_params.py:328-329 parity


def test_compile_text_search_matches_wand(built_index):
    p = parse_cardsearch("cardSearchText=danger&page[size]=13")
    got = [r["doc_id"] for r in compile_cardsearch(p, built_index).collect()]
    want = [r["doc_id"] for r in wand_topk(built_index, "danger", k=13).collect()]
    assert got == want


def test_compile_filter_only(built_index, dv, pages_pdf):
    qs = f"cardSearchFilter[{SUBJ}][any-of]=https://subjects.example/s0/&page[size]=101"
    p = parse_cardsearch(qs)
    got = {r["doc_id"] for r in compile_cardsearch(p, built_index, dv).collect()}
    dvp = make_doc_values(pages_pdf)
    want = set(
        dvp[
            (dvp.path_key == SUBJ)
            & (dvp.iri_value.fillna("").str.rstrip("/") == "://subjects.example/s0")
        ]["doc_id"]
    )
    assert got == want


def test_compile_text_plus_filter(built_index, dv):
    qs = f"cardSearchText=danger&cardSearchFilter[{CREATED}][after]=1999"
    p = parse_cardsearch(qs)
    out = compile_cardsearch(p, built_index, dv).collect()
    assert out  # non-degenerate
    unfiltered = {r["doc_id"] for r in wand_topk(built_index, "danger", k=300).collect()}
    assert {r["doc_id"] for r in out} <= unfiltered
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks)


def test_compile_offset_cursor(built_index):
    c = PageCursor("offset", [13]).encode()
    p = parse_cardsearch(f"cardSearchText=the&page[cursor]={c}&page[size]=13")
    page2 = [r["doc_id"] for r in compile_cardsearch(p, built_index).collect()]
    full = [r["doc_id"] for r in wand_topk(built_index, "the", k=26).collect()]
    assert page2 == full[13:26]


def test_compile_valuesearch_iri_and_date(built_index, dv):
    p = parse_valuesearch(f"valueSearchPropertyPath={SUBJ}&page[size]=5")
    vals = compile_valuesearch(p, built_index, dv).collect()
    assert vals and vals[0]["match_count"] >= vals[-1]["match_count"]
    pd_ = parse_valuesearch(f"valueSearchPropertyPath={CREATED}")
    hist = compile_valuesearch(pd_, built_index, dv).collect()
    assert hist and "year" in hist[0].asDict()


def test_csv_render(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"], "x"), (2, [], None)], "id long, tags array<string>, t string"
    )
    out = render.to_csv(df)
    lines = out.strip().splitlines()
    assert lines[0] == "id,tags,t"
    assert lines[1] == "1,a ; b,x"
    tsv = render.to_tsv(df)
    assert tsv.splitlines()[0] == "id\ttags\tt"


def test_jsonapi_render(spark):
    df = spark.createDataFrame([(5, 0.9)], "doc_id long, score double")
    doc = render.to_jsonapi(df, "index-card-search-result", "doc_id", total=1)
    assert doc["data"][0]["type"] == "index-card-search-result"
    assert doc["data"][0]["id"] == "5"
    assert doc["meta"]["total"] == 1


def test_jsonapi_unblended_wrapper_shape(spark):
    """unblended=True reproduces the reference's default wire shape
    (trovesearch_gathering.py _unblended_card): 'search-result' wrappers
    referencing 'index-card' resources carried in `included`."""
    df = spark.createDataFrame(
        [(5, 0.9), (6, 0.8)], "doc_id long, score double"
    )
    doc = render.to_jsonapi(
        df, "index-card", "doc_id", total=2, unblended=True
    )
    assert [e["type"] for e in doc["data"]] == ["search-result"] * 2
    assert doc["data"][0]["relationships"]["indexCard"]["data"] == {
        "type": "index-card", "id": "5"
    }
    assert "attributes" not in doc["data"][0]
    cards = {e["id"]: e for e in doc["included"]}
    assert cards["5"]["type"] == "index-card"
    assert cards["5"]["attributes"]["score"] == 0.9
    assert doc["meta"]["total"] == 2
    # blended default unchanged
    blended = render.to_jsonapi(df, "index-card", "doc_id")
    assert blended["data"][0]["attributes"]["score"] == 0.9
    assert "included" not in blended


def test_value_key_preference():
    assert render.pick_preferred_value({"label": "c", "name": "b", "@id": "a"}) == "a"
    assert render.pick_preferred_value({"label": "c"}) == "c"


def test_make_snippet():
    frags = make_snippet("a b danger c d", {"danger"}, window=1)
    assert frags == ["b <em>danger</em> c"]
    assert make_snippet("nothing here", {"zzz"}) == []


def test_with_highlights(built_index):
    res = wand_topk(built_index, "danger", k=3)
    hl = with_highlights(built_index, res, "danger").collect()
    assert len(hl) == 3
    for r in hl:
        assert any("<em>danger</em>" in f for f in r["highlights"])


def test_compile_sort_int_is_numeric_and_multivalue_safe(built_index, spark):
    """Int sort must be numeric (not '100' < '20' lexicographic) and a doc
    with several values at the path must appear once (max for desc)."""
    from share_spark.query.params import CardsearchParams, SortParam, compile_cardsearch

    rows = []
    for d in range(40):
        rows.append((d, "osf:downloads", 2, "int", None, None, None, d * 7 % 103))
    rows.append((3, "osf:downloads", 2, "int", None, None, None, 1000))  # multivalue
    dv = spark.createDataFrame(
        rows,
        "doc_id long, path_key string, depth int, value_type string, "
        "iri_value string, text_value string, date_value date, int_value long",
    )
    params = CardsearchParams(
        sort=SortParam("osf:downloads", descending=True), page_size=10
    )
    got = [r["doc_id"] for r in compile_cardsearch(params, built_index, dv).collect()]
    assert len(got) == len(set(got)) == 10
    assert got[0] == 3  # 1000 dominates numerically
    vals = {d: max(v for dd, *_, v in [r for r in rows] if dd == d) for d in set(x[0] for x in rows)}
    want = sorted(vals, key=lambda d: (-vals[d], d))[:10]
    assert got == want


def test_jsonapi_multihop_include(spark):
    """Dotted include paths walk further hops through value_meta
    (trovesearch_gathering.py:381-474 arbitrary-path gatherer analog):
    include=subj.type emits the subject resources WITH their own
    type relationships, and the type resources join `included`."""
    from share_spark.query.params import parse_render_params
    from share_spark.render import to_jsonapi

    df = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, t string")
    related = spark.createDataFrame(
        [(1, '["subj"]', "://s/1"), (2, '["subj"]', "://s/2")],
        "doc_id long, path_key string, iri_value string",
    )
    related_meta = spark.createDataFrame(
        [
            (1, "://s/1", '["type"]', "://t/Concept"),
            (2, "://s/2", '["type"]', "://t/Concept"),
            # decoy: right value, wrong path — must not surface
            (1, "://s/1", '["other"]', "://t/Nope"),
            # decoy: value not reached from any page doc at the prefix
            (1, "://s/9", '["type"]', "://t/Unreached"),
        ],
        "doc_id long, value_iri string, path_key string, iri_value string",
    )
    rp = parse_render_params('include=%5B%22subj%22%5D.%5B%22type%22%5D')
    doc = to_jsonapi(
        df, "card", "doc_id", render_params=rp,
        related=related, related_meta=related_meta,
    )
    # hop-1 relationships on data rows
    rel1 = doc["data"][0]["relationships"]['["subj"]']["data"]
    assert rel1 == [{"type": '["subj"]', "id": "://s/1"}]
    # included: both subjects and the hop-2 type resource, no decoys
    by_type = {}
    for e in doc["included"]:
        by_type.setdefault(e["type"], []).append(e)
    assert {e["id"] for e in by_type['["subj"]']} == {"://s/1", "://s/2"}
    assert [e["id"] for e in by_type['["type"]']] == ["://t/Concept"]
    assert "://t/Nope" not in {e["id"] for es in by_type.values() for e in es}
    # hop-2 relationships hang on the INCLUDED subject resources
    s1 = next(e for e in by_type['["subj"]'] if e["id"] == "://s/1")
    assert s1["relationships"]['["type"]']["data"] == [
        {"type": '["type"]', "id": "://t/Concept"}
    ]
    # multi-hop without related_meta refuses loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="related_meta"):
        to_jsonapi(df, "card", "doc_id", render_params=rp, related=related)


def test_blendcards_querystring_drives_wrapper(spark):
    """An explicit blendCards=false in the querystring selects the
    unblended wrapper; blendCards=1 and blendCards-absent stay blended."""
    from share_spark.query.params import parse_render_params

    df = spark.createDataFrame([(5, 0.9)], "doc_id long, score double")
    off = render.to_jsonapi(
        df, "index-card", "doc_id",
        render_params=parse_render_params("blendCards=0"),
    )
    assert off["data"][0]["type"] == "search-result"
    assert off["included"][0]["attributes"]["score"] == 0.9
    for qs in ("blendCards=1", ""):
        on = render.to_jsonapi(
            df, "index-card", "doc_id",
            render_params=parse_render_params(qs),
        )
        assert on["data"][0]["attributes"]["score"] == 0.9
