"""Path-scoped text search (cardSearchText[path]) through the field index."""

import pytest
from pyspark.sql import functions as F

from share_spark.index.build import IndexConfig
from share_spark.query.fields import build_field_index
from share_spark.query.params import compile_cardsearch, parse_cardsearch


@pytest.fixture(scope="module")
def field_index(spark, pages_pdf, tmp_path_factory):
    """Split each doc's text into two scoped fields: 'title' = first 8
    tokens, 'abstract' = the rest (deterministic, derivable in SQL too)."""
    docs = spark.createDataFrame(pages_pdf[["doc_id", "text"]])
    toks = F.split("text", " ")
    title = F.array_join(F.slice(toks, 1, 8), " ")
    abstract = F.array_join(
        F.slice(toks, 9, F.greatest(F.size(toks) - 8, F.lit(0))), " "
    )
    rows = docs.select(
        "doc_id", F.lit("title").alias("path_key"), title.alias("text")
    ).unionByName(
        docs.select(
            "doc_id", F.lit("abstract").alias("path_key"), abstract.alias("text")
        ).filter(F.col("text") != "")
    )
    d = str(tmp_path_factory.mktemp("fidx"))
    return build_field_index(
        spark, rows, d, IndexConfig(block_size=32, chunk_docs=64)
    )


def _title_tokens(pages_pdf):
    return {
        int(r.doc_id): r.text.lower().split()[:8] for r in pages_pdf.itertuples()
    }


def test_scoped_search_hits_only_in_path(field_index, pages_pdf):
    got = field_index.scoped_topk("w00000", ["title"], k=300).collect()
    got_ids = {r["doc_id"] for r in got}
    titles = _title_tokens(pages_pdf)
    want = {d for d, t in titles.items() if "w00000" in t}
    assert want and got_ids == want
    # docs with 'danger' ONLY outside the title are excluded
    body_only = {
        int(r.doc_id)
        for r in pages_pdf.itertuples()
        if "w00000" in r.text.lower().split() and int(r.doc_id) not in want
    }
    assert body_only  # fixture really exercises the distinction
    assert not (got_ids & body_only)


def test_scoped_multi_path_is_union_best_score(field_index, pages_pdf):
    t = {r["doc_id"]: r["score"] for r in
         field_index.scoped_topk("w00000", ["title"], k=300).collect()}
    a = {r["doc_id"]: r["score"] for r in
         field_index.scoped_topk("w00000", ["abstract"], k=300).collect()}
    both = field_index.scoped_topk("w00000", ["title", "abstract"], k=300).collect()
    assert {r["doc_id"] for r in both} == set(t) | set(a)
    for r in both:
        want = max(t.get(r["doc_id"], float("-inf")), a.get(r["doc_id"], float("-inf")))
        assert abs(r["score"] - want) < 1e-9


def test_scoped_phrase_stays_inside_field(field_index, pages_pdf):
    """A phrase spanning the title/abstract boundary must NOT match scoped
    fields (positions are per field row)."""
    titles = _title_tokens(pages_pdf)
    # pick a doc and a 2-gram crossing tokens 8|9 (last title + first body)
    crossing = None
    for r in pages_pdf.itertuples():
        toks = r.text.lower().split()
        if len(toks) > 9:
            crossing = (toks[7], toks[8])
            break
    q = f'"{crossing[0]} {crossing[1]}"'
    got = field_index.scoped_topk(q, ["title", "abstract"], k=300).collect()
    for row in got:
        toks_t = titles[row["doc_id"]]
        full = None
        for r in pages_pdf.itertuples():
            if int(r.doc_id) == row["doc_id"]:
                full = r.text.lower().split()
        in_title = any(
            tuple(toks_t[i : i + 2]) == crossing for i in range(len(toks_t) - 1)
        )
        in_abstract = any(
            tuple(full[8:][i : i + 2]) == crossing
            for i in range(len(full[8:]) - 1)
        )
        assert in_title or in_abstract


def test_compile_cardsearch_scoped(field_index, built_index, spark, pages_pdf):
    params = parse_cardsearch("cardSearchText[title]=w00000&page[size]=5")
    assert params.text_paths == ("title",)
    out = compile_cardsearch(params, built_index, field_index=field_index)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    titles = _title_tokens(pages_pdf)
    for r in rows:
        assert "w00000" in titles[r["doc_id"]]


def test_compile_cardsearch_scoped_without_field_index_raises(built_index):
    params = parse_cardsearch("cardSearchText[title]=danger")
    with pytest.raises(ValueError, match="FieldIndex"):
        compile_cardsearch(params, built_index)


def test_scoped_match_docs_unlimited(field_index, pages_pdf):
    """scoped_match_docs == full scoped membership (no top-k): equals the
    brute-force token check and the union of per-path scoped_topk hit sets
    at saturating k — the unbounded valuesearch card-context operator."""
    got = {
        r["doc_id"]
        for r in field_index.scoped_match_docs("the", ["title"]).collect()
    }
    want = {
        int(r.doc_id)
        for r in pages_pdf.itertuples()
        if "the" in r.text.lower().split()[:8]
    }
    assert got == want and len(got) > 13  # larger than any default page
    both = {
        r["doc_id"]
        for r in field_index.scoped_match_docs(
            "the", ["title", "abstract"]
        ).collect()
    }
    want_both = {
        int(r.doc_id)
        for r in pages_pdf.itertuples()
        if "the" in r.text.lower().split()
    }
    assert both == want_both


def test_compile_valuesearch_scoped_text_context(
    field_index, built_index, spark, pages_pdf
):
    """cardSearchText[path] inside a valuesearch compiles through
    scoped_match_docs when a FieldIndex is supplied — and refuses loudly
    without one (never silently widened)."""
    import pytest as _pytest
    from share_spark.query.params import (
        CardsearchParams,
        ValuesearchParams,
        compile_valuesearch,
    )

    dv_rows = [
        (int(r.doc_id), '["subj"]', 1, "iri", f"://v/{int(r.doc_id) % 3}",
         None, None, None)
        for r in pages_pdf.itertuples()
    ]
    dv = spark.createDataFrame(
        dv_rows,
        "doc_id long, path_key string, depth int, value_type string, "
        "iri_value string, text_value string, date_value date, int_value long",
    )
    params = ValuesearchParams(
        value_path='["subj"]',
        cardsearch=CardsearchParams(texts=("the",), text_paths=("title",)),
        page_size=10,
    )
    got = {
        r["iri_value"]: r["match_count"]
        for r in compile_valuesearch(
            params, built_index, dv, value_type="iri",
            field_index=field_index,
        ).collect()
    }
    members = {
        int(r.doc_id)
        for r in pages_pdf.itertuples()
        if "the" in r.text.lower().split()[:8]
    }
    want: dict[str, int] = {}
    for d in members:
        want[f"://v/{d % 3}"] = want.get(f"://v/{d % 3}", 0) + 1
    assert got == want
    with _pytest.raises(ValueError, match="FieldIndex"):
        compile_valuesearch(params, built_index, dv, value_type="iri")


def test_scoped_fuzzy_stays_inside_field(field_index, pages_pdf):
    """A fuzzy clause ('dta~1') scoped to a path must expand only within
    that path's term namespace and match only docs whose FIELD carries a
    term within distance — mirroring the scoped-prefix semantics."""

    from share_spark.query.serve import _lev_one as lev

    titles = _title_tokens(pages_pdf)
    want = {
        d for d, toks in titles.items()
        if any(lev(t, "dta") <= 1 for t in toks)
    }
    got = {
        r["doc_id"]
        for r in field_index.scoped_topk("dta~1", ["title"], k=300).collect()
    }
    assert got == want and got
    # in-title matches are a strict subset of anywhere-matches
    got_any = {
        r["doc_id"]
        for r in field_index.scoped_match_docs(
            "dta~1", ["title", "abstract"]
        ).collect()
    }
    assert got <= got_any and got_any > got


def test_scoped_disjunction_refused(field_index):
    """Review regression: '|' and multi-branch parens must refuse loudly
    in scoped queries, not silently parse as a conjunction."""
    import pytest

    with pytest.raises(NotImplementedError, match="single conjunctive"):
        field_index.scoped_topk("danger | warning", ["title"], k=5)
    with pytest.raises(NotImplementedError, match="single conjunctive"):
        field_index.scoped_match_docs("(danger | warning)", ["title"])
    # single-branch parens remain fine
    got = field_index.scoped_topk("(w00000)", ["title"], k=5).collect()
    assert got
