"""Structured-search semantics — the trovesearch query corpus, ported.

Mirrors tests/share/search/index_strategy/_common_trovesearch_tests.py:
expected id-sets for filters (any-of/none-of/present/absent), date
granularities, sameAs synonyms, trailing-slash normalization, sorts."""

import pytest
from pyspark.sql import functions as F

from share_spark.corpus import SUBJECT_POOL, make_doc_values, make_synonyms
from share_spark.query.filters import (
    AFTER,
    ANY_OF,
    AT_DATE,
    BEFORE,
    IS_ABSENT,
    IS_PRESENT,
    NONE_OF,
    SearchFilter,
    apply_filters,
    matching_doc_ids,
    synonym_filter,
)
from share_spark.query.valuesearch import (
    cardsearch,
    date_histogram,
    related_property_counts,
    total_with_saturation,
    value_counts,
)

SUBJ = '["dcterms:subject"]'
CREATED = '["dcterms:created"]'
DOWNLOADS = '["osf:stats","osf:downloads"]'


@pytest.fixture(scope="module")
def fixtures(spark, pages_pdf):
    dv = spark.createDataFrame(make_doc_values(pages_pdf)).cache()
    docs = spark.createDataFrame(pages_pdf[["doc_id", "url", "lang"]]).cache()
    syn = spark.createDataFrame(make_synonyms(pages_pdf)).cache()
    return docs, dv, syn


def _pids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def _expected_subject_docs(pages_pdf, subject_idx):
    dvp = make_doc_values(pages_pdf)
    iri = SUBJECT_POOL[subject_idx]
    mask = dvp["iri_value"].fillna("").str.rstrip("/") == iri
    return set(dvp[mask & (dvp["path_key"] == SUBJ)]["doc_id"])


def test_anyof_with_trailing_slash_normalization(fixtures, pages_pdf):
    docs, dv, _ = fixtures
    # filter value carries a trailing slash + scheme; rows were written
    # with/without slash -> both must match (trove/util/iris.py:31-113)
    f = SearchFilter((SUBJ,), ANY_OF, ("https://subjects.example/s0/",))
    got = _pids(apply_filters(docs, dv, [f]))
    assert got == _expected_subject_docs(pages_pdf, 0)
    assert got  # non-degenerate


def test_anyof_multi_value_is_or(fixtures, pages_pdf):
    docs, dv, _ = fixtures
    f = SearchFilter(
        (SUBJ,), ANY_OF,
        ("://subjects.example/s1", "://subjects.example/s2"),
    )
    got = _pids(apply_filters(docs, dv, [f]))
    assert got == (
        _expected_subject_docs(pages_pdf, 1) | _expected_subject_docs(pages_pdf, 2)
    )


def test_noneof_is_complement(fixtures, pages_pdf):
    docs, dv, _ = fixtures
    v = ("://subjects.example/s3",)
    any_ids = _pids(apply_filters(docs, dv, [SearchFilter((SUBJ,), ANY_OF, v)]))
    none_ids = _pids(apply_filters(docs, dv, [SearchFilter((SUBJ,), NONE_OF, v)]))
    all_ids = set(pages_pdf["doc_id"])
    assert none_ids == all_ids - any_ids


def test_present_absent(fixtures, pages_pdf):
    docs, dv, _ = fixtures
    present = _pids(apply_filters(docs, dv, [SearchFilter((DOWNLOADS,), IS_PRESENT)]))
    absent = _pids(apply_filters(docs, dv, [SearchFilter((DOWNLOADS,), IS_ABSENT)]))
    assert present == {d for d in pages_pdf["doc_id"] if d % 10 == 0}
    assert absent == set(pages_pdf["doc_id"]) - present


def test_date_granularities(fixtures, pages_pdf):
    docs, dv, _ = fixtures
    # warc_ts = 1999-12-31 + 7h*i -> doc 0..3 are in 1999
    at_1999 = _pids(apply_filters(docs, dv, [SearchFilter((CREATED,), AT_DATE, ("1999",))]))
    assert at_1999 == {
        int(r.doc_id) for r in pages_pdf.itertuples() if r.warc_ts.year == 1999
    }
    at_month = _pids(
        apply_filters(docs, dv, [SearchFilter((CREATED,), AT_DATE, ("2000-01",))])
    )
    assert at_month == {
        int(r.doc_id)
        for r in pages_pdf.itertuples()
        if (r.warc_ts.year, r.warc_ts.month) == (2000, 1)
    }
    before_2000 = _pids(
        apply_filters(docs, dv, [SearchFilter((CREATED,), BEFORE, ("2000",))])
    )
    assert before_2000 == at_1999
    after_1999 = _pids(
        apply_filters(docs, dv, [SearchFilter((CREATED,), AFTER, ("1999",))])
    )
    assert after_1999 == set(pages_pdf["doc_id"]) - at_1999


def test_filters_and_combine(fixtures, pages_pdf):
    docs, dv, _ = fixtures
    f1 = SearchFilter((DOWNLOADS,), IS_PRESENT)
    f2 = SearchFilter((CREATED,), AFTER, ("1999",))
    got = _pids(apply_filters(docs, dv, [f1, f2]))
    assert got == {
        int(r.doc_id)
        for r in pages_pdf.itertuples()
        if r.doc_id % 10 == 0 and r.warc_ts.year > 1999
    }


def test_glob_depth(fixtures):
    docs, dv, _ = fixtures
    f = SearchFilter((), IS_PRESENT, glob_depth=2)
    got = _pids(apply_filters(docs, dv, [f]))
    # depth-2 rows: creator.name (every doc) + downloads -> all docs
    assert got == _pids(docs)


def test_synonym_filter(fixtures, pages_pdf):
    docs, _, syn = fixtures
    got = _pids(synonym_filter(docs, syn, ["https://alias.example/a7/"]))
    assert got == {7}


def test_value_counts_ordering_and_overfetch(fixtures):
    docs, dv, _ = fixtures
    vc = value_counts(dv, [SUBJ], page_size=5).collect()
    assert len(vc) <= 6  # offset + page + 1 overfetch
    counts = [r["match_count"] for r in vc]
    assert counts == sorted(counts, reverse=True)


def test_value_counts_with_card_context(fixtures, pages_pdf):
    docs, dv, _ = fixtures
    scope = apply_filters(docs, dv, [SearchFilter((DOWNLOADS,), IS_PRESENT)])
    vc = value_counts(dv, [SUBJ], card_filter_docs=scope, page_size=100)
    total = sum(r["match_count"] for r in vc.collect())
    # every counted (value, doc) pair must come from the scoped docs
    dvp = make_doc_values(pages_pdf)
    scoped = dvp[(dvp["path_key"] == SUBJ) & (dvp["doc_id"] % 10 == 0)]
    assert total == len(scoped.drop_duplicates(["doc_id", "iri_value"]))


def test_date_histogram_years_desc(fixtures, pages_pdf):
    docs, dv, _ = fixtures
    hist = date_histogram(dv, [CREATED]).collect()
    years = [r["year"] for r in hist]
    assert years == sorted(years, reverse=True)
    want = {}
    for r in pages_pdf.itertuples():
        want[r.warc_ts.year] = want.get(r.warc_ts.year, 0) + 1
    assert {r["year"]: r["match_count"] for r in hist} == want


def test_related_property_counts_zero_filled(fixtures):
    docs, dv, _ = fixtures
    out = related_property_counts(dv, [SUBJ, '["never:used"]']).collect()
    as_map = {r["path_key"]: r["usage_count"] for r in out}
    assert as_map['["never:used"]'] == 0
    assert as_map[SUBJ] > 0


def test_total_saturation(fixtures):
    docs, _, _ = fixtures
    n, rel = total_with_saturation(docs, cap=100)
    assert (n, rel) == (100, "gte")
    n, rel = total_with_saturation(docs.limit(5), cap=100)
    assert (n, rel) == (5, "eq")


def test_cardsearch_sort_and_paging(fixtures, pages_pdf):
    docs, dv, _ = fixtures
    # int sort with missing-as-0 via pre-join of the int value
    ints = dv.filter(F.col("path_key") == DOWNLOADS).select(
        "doc_id", F.col("int_value")
    )
    docs_i = docs.join(ints, "doc_id", "left").withColumn(
        "dl_count", F.coalesce("int_value", F.lit(0))
    )
    page = cardsearch(
        docs_i, dv, [], sort_col="dl_count", sort_desc=True, page_size=10
    ).collect()
    vals = [r["dl_count"] for r in page]
    assert vals == sorted(vals, reverse=True)
    page2 = cardsearch(
        docs_i, dv, [], sort_col="dl_count", sort_desc=True, page_size=10, offset=10
    ).collect()
    assert len(page2) == 10
    assert set(r["doc_id"] for r in page).isdisjoint(
        r["doc_id"] for r in page2
    )
