"""Block-max WAND path must be rank-identical to the exact scorer."""

import pytest

from share_spark.corpus import make_queries
from share_spark.query.bm25 import exact_topk
from share_spark.query.wand import wand_topk


def _rows(df):
    return [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in df.collect()]


@pytest.mark.parametrize(
    "qtext,k",
    [
        ("danger", 13),
        ("the", 13),
        ("the data science", 101),
        ("w00001 w00002", 13),
        ("w09999", 13),
        ("danger -warning", 13),
        ("nosuchtermanywhere", 13),
        ("danger nosuchtermanywhere", 13),
    ],
)
def test_wand_matches_exact(built_index, qtext, k):
    exact = _rows(exact_topk(built_index, qtext, k=k)) if qtext != "nosuchtermanywhere" else []
    if "nosuchterm" in qtext:
        assert _rows(wand_topk(built_index, qtext, k=k)) == []
        return
    got = _rows(wand_topk(built_index, qtext, k=k))
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exact]
    for (_, _, gs), (_, _, es) in zip(got, exact):
        assert abs(gs - es) < 1e-9


def test_wand_query_set(built_index):
    for q in make_queries(20):
        exact = _rows(exact_topk(built_index, q["query_text"], k=q["k"]))
        got = _rows(wand_topk(built_index, q["query_text"], k=q["k"]))
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exact], q
        for (_, _, gs), (_, _, es) in zip(got, exact):
            assert abs(gs - es) < 1e-9


@pytest.mark.parametrize(
    "qtext",
    [
        '"nothing valued is here"',      # planted phrase A
        '"nothing valued here"',         # words present, order broken: no hit
        '"place of honor"',
        'danger -"warning about danger"',  # negated phrase
        '"danger is unleashed" place',   # phrase AND extra term
        '"the data"',                    # head-term phrase (many candidates)
        '"is a"',
    ],
)
def test_wand_phrases_match_exact_and_frozen(built_index, pages_pdf, qtext):
    """Phrases run natively through the positional index in BOTH paths and
    must agree with each other and the frozen pure-Python oracle."""
    from tests.frozen_bm25 import FrozenIndex

    frozen = FrozenIndex.from_pages(pages_pdf)
    want = [(r, d) for r, d, _ in frozen.topk(qtext, k=13)]
    exact = _rows(exact_topk(built_index, qtext, k=13))
    got = _rows(wand_topk(built_index, qtext, k=13))
    assert [(r, d) for r, d, _ in exact] == want, qtext
    assert [(r, d) for r, d, _ in got] == want, qtext
    for (_, _, gs), (_, _, es) in zip(got, exact):
        assert abs(gs - es) < 1e-9


def test_wand_filter_docs_full_page(built_index, spark):
    """filter_docs is applied inside the kernel BEFORE truncation: a highly
    selective filter must still return a full page when enough filtered
    matches exist (the 4x-overfetch bug class)."""
    full = _rows(wand_topk(built_index, "the", k=300))
    # filter keeps every 3rd ranked doc — selective (67% dropped)
    keep = [d for i, (_, d, _) in enumerate(full) if i % 3 == 0]
    fdf = spark.createDataFrame([(d,) for d in keep], "doc_id long")
    page = _rows(wand_topk(built_index, "the", k=13, filter_docs=fdf))
    assert [d for _, d, _ in page] == keep[:13]
    # exact path agrees
    epage = _rows(exact_topk(built_index, "the", k=13, filter_docs=fdf))
    assert [(r, d) for r, d, _ in page] == [(r, d) for r, d, _ in epage]


def test_wand_two_phase_path_matches_exact(built_index):
    """Force the two-phase bounds-pruned plan (first_batch_chunks=1) —
    the plan used at real scale — and assert rank identity."""
    for qtext, k in [("danger", 13), ("the data", 13), ("w00001 w00002", 101)]:
        exact = _rows(exact_topk(built_index, qtext, k=k))
        got = _rows(wand_topk(built_index, qtext, k=k, first_batch_chunks=1, single_phase_max_chunks=0))
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exact], qtext


def test_wand_offset(built_index):
    full = _rows(wand_topk(built_index, "the data", k=30))
    page = _rows(wand_topk(built_index, "the data", k=10, offset=10))
    assert [(d) for _, d, _ in page] == [d for _, d, _ in full[10:20]]
