"""Parenthesized precedence (the simple_query_string PRECEDENCE flag) via
DNF rewrite: 'a (b | c)' == 'a b | a c' by definition, then the existing
`|` branch semantics apply (sum of matching branches). The rewrite happens
before any execution path forks, so exact / WAND / serve identity is
inherited — these tests pin the expansion itself plus end-to-end equality
with the hand-flattened query on every tier."""

import pytest

from share_spark.query.bm25 import (
    MAX_DNF_BRANCHES,
    exact_topk,
    expand_precedence,
    parse_disjunction,
)
from share_spark.query.serve import TopKServer
from share_spark.query.wand import wand_topk

PAIRS = [
    # (parenthesized, hand-flattened equivalent)
    ("warning (danger | place)", "warning danger | warning place"),
    ("(the danger) | (warning place)", "the danger | warning place"),
    ("(danger | warning) (the | nothing)",
     "danger the | danger nothing | warning the | warning nothing"),
    ('the -(danger | warning)', "the -danger -warning"),
    ('("nothing valued is here" | danger) the',
     '"nothing valued is here" the | danger the'),
]


def _norm(branches):
    return [" ".join(b.split()) for b in branches]


def test_expansion_shapes():
    assert _norm(expand_precedence("a (b | c)")) == ["a b", "a c"]
    assert _norm(expand_precedence("a ((b | c) d)")) == ["a b d", "a c d"]
    assert _norm(expand_precedence("x -(a | b)")) == ["x -a -b"]
    assert expand_precedence("no parens here") == ["no parens here"]
    # quotes protect parens and pipes
    assert expand_precedence('"a (b | c" d') == ['"a (b | c" d']


def test_expansion_refusals():
    with pytest.raises(ValueError, match="unbalanced"):
        expand_precedence("a (b")
    with pytest.raises(NotImplementedError, match="negated groups"):
        expand_precedence("-(a b)")
    with pytest.raises(ValueError, match=f"more than {MAX_DNF_BRANCHES}"):
        expand_precedence("(a|b) (c|d) (e|f) (g|h) (i|j)")


def test_parse_disjunction_integration():
    b = parse_disjunction("spark (join | window)")
    assert [x.terms for x in b] == [("spark", "join"), ("spark", "window")]
    # single-branch group keeps the legacy single-parse path (prefixes legal)
    (pq,) = parse_disjunction("(danger* the)")
    assert pq.prefixes == ("danger",) and pq.terms == ("the",)


def _rows(df):
    return [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in df.collect()]


@pytest.mark.parametrize("grouped,flat", PAIRS)
def test_exact_equals_flat(built_index, grouped, flat):
    assert _rows(exact_topk(built_index, grouped, k=13)) == _rows(
        exact_topk(built_index, flat, k=13)
    )


@pytest.mark.parametrize("grouped,flat", PAIRS)
def test_wand_equals_flat_and_exact(built_index, grouped, flat):
    want = _rows(exact_topk(built_index, flat, k=13))
    assert _rows(wand_topk(built_index, grouped, k=13)) == want
    assert (
        _rows(
            wand_topk(built_index, grouped, k=13, single_phase_max_chunks=0)
        )
        == want
    )


@pytest.fixture(scope="module")
def server(built_index):
    return TopKServer.open(built_index.index_dir)


@pytest.mark.parametrize("grouped,flat", PAIRS)
def test_serve_equals_flat(server, built_index, grouped, flat):
    want = [
        (d, round(s, 9))
        for _, d, s in _rows(exact_topk(built_index, flat, k=13))
    ]
    got = [(d, round(s, 9)) for d, s, _ in server.topk(grouped, k=13)]
    assert got == want
