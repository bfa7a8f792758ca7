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
        if '"' in q["query_text"]:
            continue
        exact = _rows(exact_topk(built_index, q["query_text"], k=q["k"]))
        got = _rows(wand_topk(built_index, q["query_text"], k=q["k"]))
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exact], q
        for (_, _, gs), (_, _, es) in zip(got, exact):
            assert abs(gs - es) < 1e-9


def test_wand_two_phase_path_matches_exact(built_index):
    """Force the two-phase bounds-pruned plan (first_batch_chunks=1) —
    the plan used at real scale — and assert rank identity."""
    for qtext, k in [("danger", 13), ("the data", 13), ("w00001 w00002", 101)]:
        exact = _rows(exact_topk(built_index, qtext, k=k))
        got = _rows(wand_topk(built_index, qtext, k=k, first_batch_chunks=1))
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exact], qtext


def test_wand_offset(built_index):
    full = _rows(wand_topk(built_index, "the data", k=30))
    page = _rows(wand_topk(built_index, "the data", k=10, offset=10))
    assert [(d) for _, d, _ in page] == [d for _, d, _ in full[10:20]]
