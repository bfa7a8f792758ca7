"""Boolean match-set operator (wand.match_docs) + the unlimited valuesearch
cardsearch context built on it.

The reference ANDs the card-scoped query into the value query as an
UNBOUNDED bool filter (trovesearch_denorm.py:838-859) — value counts must
see every matching card, never a top-k page. These tests pin:
  1. match_docs set == exact scorer's full membership (same boolean core)
  2. filter_docs pushdown intersects correctly
  3. compile_valuesearch counts with a text context are untruncated
  4. valuesearch with NO card context still excludes expelled docs
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from share_spark.query.bm25 import exact_topk
from share_spark.query.wand import match_docs

SUBJ = '["dcterms:subject"]'
DV_SCHEMA = (
    "doc_id long, path_key string, depth int, value_type string, "
    "iri_value string, text_value string, date_value date, int_value long"
)


def _exact_members(index, qtext) -> set[int]:
    return {
        r["doc_id"] for r in exact_topk(index, qtext, k=1_000_000).collect()
    }


@pytest.mark.parametrize(
    "qtext",
    [
        "danger",
        "the",
        "the data science",
        "danger -warning",
        '"nothing valued is here"',
        '"the data"',
        'danger -"warning about danger"',
        "w00001 w00002",
    ],
)
def test_match_set_equals_exact_membership(built_index, qtext):
    got = {r["doc_id"] for r in match_docs(built_index, qtext).collect()}
    assert got == _exact_members(built_index, qtext)
    assert len(got) > 0  # every case matches something in this corpus


def test_match_docs_no_positive_terms_raises(built_index):
    with pytest.raises(ValueError):
        match_docs(built_index, "-onlynegated")


def test_match_docs_filter_pushdown(built_index):
    members = sorted(_exact_members(built_index, "the"))
    allow = members[::2]  # every other matching doc
    allow_df = built_index.spark.createDataFrame(
        [(d,) for d in allow], "doc_id long"
    )
    got = {
        r["doc_id"]
        for r in match_docs(built_index, "the", filter_docs=allow_df).collect()
    }
    assert got == set(allow)


def test_valuesearch_text_context_untruncated(spark, built_index):
    """The card context must cover EVERY matching card: counts computed
    through compile_valuesearch equal counts over the exact full match set —
    with the match set far larger than any page budget (page_size=2)."""
    from share_spark.query.params import (
        CardsearchParams,
        ValuesearchParams,
        compile_valuesearch,
    )

    members = _exact_members(built_index, "the")
    assert len(members) > 50  # 'the' is a head term; context >> page sizes
    # every doc carries subject v{doc_id % 3}
    doc_ids = [r["doc_id"] for r in built_index.docs().select("doc_id").collect()]
    dv = spark.createDataFrame(
        [(d, SUBJ, 1, "iri", f"://v/{d % 3}", None, None, None) for d in doc_ids],
        DV_SCHEMA,
    )
    params = ValuesearchParams(
        value_path=SUBJ,
        cardsearch=CardsearchParams(texts=("the",), page_size=2),
        page_size=13,
    )
    got = {
        r["iri_value"]: r["match_count"]
        for r in compile_valuesearch(
            params, built_index, dv, value_type="iri"
        ).collect()
    }
    want: dict[str, int] = {}
    for d in members:
        want[f"://v/{d % 3}"] = want.get(f"://v/{d % 3}", 0) + 1
    assert got == want


def test_valuesearch_excludes_expelled_docs(spark, pages_pdf, tmp_path):
    """What's-wrong #3 (r3 verdict): with NO cardsearch context, expelled
    docs must still vanish from value_counts AND date_histogram — deleted
    cards vanish from all aggs in the reference."""
    from share_spark.index.build import IndexConfig, IndexReader, build_index
    from share_spark.query.params import ValuesearchParams, compile_valuesearch
    from share_spark.streaming.incremental import expel

    idx_dir = str(tmp_path / "idx")
    pages = spark.createDataFrame(pages_pdf.head(40))
    build_index(
        spark, pages, idx_dir, IndexConfig(block_size=32, chunk_docs=64)
    )
    index = IndexReader.open(spark, idx_dir)
    doc_ids = sorted(
        r["doc_id"] for r in index.docs().select("doc_id").collect()
    )
    victim = doc_ids[0]
    dv_rows = [
        (d, SUBJ, 1, "iri", f"://v/{i % 3}", None, None, None)
        for i, d in enumerate(doc_ids)
    ] + [
        (d, '["dcterms:date"]', 1, "date", None, None,
         __import__("datetime").date(2000 + (i % 2), 1, 1), None)
        for i, d in enumerate(doc_ids)
    ]
    dv = spark.createDataFrame(dv_rows, DV_SCHEMA)

    def counts(path, vtype):
        out = compile_valuesearch(
            ValuesearchParams(value_path=path),
            IndexReader.open(spark, idx_dir),
            dv,
            value_type=vtype,
        ).collect()
        key = "iri_value" if vtype == "iri" else "year"
        return {r[key]: r["match_count"] for r in out}

    before_iri = counts(SUBJ, "iri")
    before_date = counts('["dcterms:date"]', "date")
    assert before_iri["://v/0"] == sum(1 for i in range(40) if i % 3 == 0)

    expel(spark, idx_dir, [victim])

    after_iri = counts(SUBJ, "iri")
    after_date = counts('["dcterms:date"]', "date")
    # victim was i=0: value ://v/0 and year 2000 each lose exactly one doc
    assert after_iri["://v/0"] == before_iri["://v/0"] - 1
    assert after_iri["://v/1"] == before_iri["://v/1"]
    assert after_date[2000] == before_date[2000] - 1
    assert after_date[2001] == before_date[2001]


def test_match_docs_multigen_tombstones(spark, pages_pdf, tmp_path):
    """The matcher kernel's aux channel: after an incremental re-ingest
    (generation + replacement tombstones), match_docs must agree with the
    exact scorer's membership — replaced docs counted once, from the new
    generation only."""
    import pandas as pd

    from share_spark.index.build import IndexConfig, IndexReader, build_index
    from share_spark.streaming.incremental import apply_incremental

    idx_dir = str(tmp_path / "mgidx")
    base = pages_pdf.head(120)
    build_index(
        spark, spark.createDataFrame(base), idx_dir,
        IndexConfig(block_size=32, chunk_docs=64),
    )
    # replace a third of the docs with MODIFIED text (some gain the marker
    # token, some lose everything else)
    changed = base[base["doc_id"] % 3 == 0].copy()
    changed["text"] = [
        ("zzmarker " + t) if i % 2 == 0 else "zzmarker only"
        for i, t in enumerate(changed["text"])
    ]
    if "html" in changed.columns:  # extract prefers html over text
        changed["html"] = None
    apply_incremental(spark, idx_dir, spark.createDataFrame(changed))
    index = IndexReader.open(spark, idx_dir)

    for q in ("the", "zzmarker", "the data", "zzmarker -only"):
        got = sorted(
            r["doc_id"] for r in match_docs(index, q).collect()
        )
        want = sorted(_exact_members(index, q))
        assert got == want, q
        assert len(got) == len(set(got)), f"duplicate doc in match set: {q}"
    # replaced docs match ONLY via their new text: doc 0 lost its old body
    # ('zzmarker only'), so any old-text-only query must not return it
    only_docs = {
        int(r.doc_id) for i, r in enumerate(changed.itertuples()) if i % 2 == 1
    }
    for q in ("the",):
        got = {r["doc_id"] for r in match_docs(index, q).collect()}
        assert not (got & only_docs)
