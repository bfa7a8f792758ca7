"""Rank-identity of the engine's BM25 top-k vs the frozen oracle
(BASELINE.json north_rule: matching top-k docIDs AND scores)."""

import pytest

from share_spark.corpus import make_queries
from share_spark.query.bm25 import exact_topk, parse_query
from tests.frozen_bm25 import FrozenIndex

N_QUERIES = 40  # subset of the 200-query reference set, for test runtime
SCORE_TOL = 1e-6  # FIXTURES.md §5


@pytest.fixture(scope="module")
def frozen(pages_pdf):
    return FrozenIndex.from_pages(pages_pdf)


def _assert_rank_identical(got_rows, want, qtext):
    got = [(r["rank"], r["doc_id"], r["score"]) for r in got_rows]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], (
        f"rank/doc mismatch for {qtext!r}:\n got={got}\nwant={want}"
    )
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert abs(gs - ws) < SCORE_TOL, f"score drift for {qtext!r}: {gs} vs {ws}"


def test_parse_query_semantics():
    pq = parse_query('danger -warning "nothing valued is here" -"bad phrase"')
    assert pq.terms == ("danger", "nothing", "valued", "is", "here")
    assert pq.neg_terms == ("warning",)
    assert pq.phrases == (("nothing", "valued", "is", "here"),)
    assert pq.neg_phrases == (("bad", "phrase"),)


def test_planted_phrase_semantics(built_index, frozen):
    # parity cases pinned by the reference tests
    # (_common_trovesearch_tests.py:455-474)
    b_or_c = {r["doc_id"] for r in exact_topk(built_index, "danger", k=300).collect()}
    assert b_or_c == {d for d in frozen.tokens if frozen.tf[d].get("danger")}
    assert all(d % 17 in (5, 7) for d in b_or_c)

    a_hits = {
        r["doc_id"]
        for r in exact_topk(built_index, '"nothing valued is here"', k=300).collect()
    }
    assert a_hits and all(d % 17 == 3 for d in a_hits)

    none_hits = exact_topk(built_index, '"nothing valued here"', k=300).collect()
    assert none_hits == []


def test_rank_identity_reference_query_set(built_index, frozen):
    queries = make_queries(N_QUERIES)
    n_nonempty = 0
    for q in queries:
        want = frozen.topk(q["query_text"], k=q["k"])
        got = exact_topk(built_index, q["query_text"], k=q["k"]).collect()
        _assert_rank_identical(got, want, q["query_text"])
        n_nonempty += bool(want)
    assert n_nonempty >= N_QUERIES // 3, "query set too degenerate to be meaningful"


def test_negation(built_index, frozen):
    want = frozen.topk("danger -warning", k=50)
    got = exact_topk(built_index, "danger -warning", k=50).collect()
    _assert_rank_identical(got, want, "danger -warning")
    # C-class docs only (B-class has 'warning')
    assert all(r["doc_id"] % 17 == 7 for r in got)


def test_offset_paging_is_consistent(built_index):
    full = exact_topk(built_index, "the data", k=30).collect()
    page2 = exact_topk(built_index, "the data", k=10, offset=10).collect()
    assert [(r["doc_id"], r["rank"]) for r in page2] == [
        (r["doc_id"], r["rank"]) for r in full[10:20]
    ]
