"""Cursors + pagination-walk exhaustiveness (the reference's 55-doc walk at
page size 7, _common_trovesearch_tests.py:104-142, scaled to our corpus)."""

import pytest
from pyspark.sql import functions as F

from share_spark.query.paging import (
    DEFAULT_PAGE_SIZE,
    MAX_OFFSET,
    MAX_PAGE_SIZE,
    PageCursor,
    clamp_page_size,
    keyset_page,
    offset_page,
    seeded_random_page,
)


def test_cursor_roundtrip():
    c = PageCursor("offset", [26, 13])
    token = c.encode()
    assert PageCursor.decode(token).args == [26, 13]
    assert PageCursor.decode(token).type_key == "offset"


def test_page_size_clamps():
    assert clamp_page_size(None) == DEFAULT_PAGE_SIZE == 13
    assert clamp_page_size(500) == MAX_PAGE_SIZE == 101
    assert clamp_page_size(0) == 1


@pytest.fixture(scope="module")
def docs55(spark):
    return spark.range(55).select(F.col("id").alias("doc_id")).cache()


def test_offset_pagination_walk_covers_everything_once(docs55):
    """Walk all pages at size 7: union must be exactly the 55 docs, no dup."""
    seen = []
    page_size = 7
    for page in range(8):
        rows = offset_page(
            docs55, [F.asc("doc_id")], offset=page * page_size, page_size=page_size
        ).collect()
        seen.extend(r["doc_id"] for r in rows)
    assert sorted(seen) == list(range(55))
    assert len(seen) == 55


def test_offset_guard():
    import pyspark.sql  # noqa

    with pytest.raises(ValueError):
        offset_page(None, [], offset=MAX_OFFSET + 1, page_size=13)


def test_keyset_walk(docs55):
    seen, last = [], None
    while True:
        rows, ps = keyset_page(docs55, "doc_id", last, page_size=7)
        got = rows.collect()
        page = got[:7]
        seen.extend(r["doc_id"] for r in page)
        if len(got) <= 7:
            break
        last = page[-1]["doc_id"]
    assert seen == list(range(55))


def test_seeded_random_reproducible_and_exhaustive(docs55):
    p1 = [r["doc_id"] for r in seeded_random_page(docs55, "doc_id", "seedA", 7).collect()]
    p1_again = [r["doc_id"] for r in seeded_random_page(docs55, "doc_id", "seedA", 7).collect()]
    assert p1 == p1_again  # reproducible (trovesearch_denorm.py:787-803 analog)
    other = [r["doc_id"] for r in seeded_random_page(docs55, "doc_id", "seedB", 7).collect()]
    assert p1 != other  # different seed -> different order (overwhelmingly)
    # page 2 excludes page 1 ids, seeded on them
    p2 = [
        r["doc_id"]
        for r in seeded_random_page(
            docs55, "doc_id", "".join(map(str, p1)), 7, exclude_ids=p1
        ).collect()
    ]
    assert not set(p1) & set(p2)


def test_random_cursor_full_walk_through_compile(built_index):
    """compile_cardsearch with no text/sort/filter is the reproducibly-random
    plan: page 1 seeded sample, cursor type 'random' walks pages >= 2 with
    first-page exclusion — every live doc seen exactly once across the walk,
    and revisiting page 1 replays the remembered ids in order."""
    from share_spark.query.params import CardsearchParams, compile_cardsearch

    n_docs = built_index.live_docs().count()
    size = 50
    p1 = [r["doc_id"] for r in compile_cardsearch(
        CardsearchParams(page_size=size), built_index, random_seed="walk"
    ).collect()]
    assert len(p1) == size
    seen = list(p1)
    offset = size
    while True:
        cur = PageCursor("random", ["walk", offset, p1])
        page = [r["doc_id"] for r in compile_cardsearch(
            CardsearchParams(page_size=size, cursor=cur),
            built_index, random_seed="walk",
        ).collect()]
        if not page:
            break
        seen.extend(page)
        offset += size
        assert offset < n_docs + 2 * size  # safety against infinite loop
    assert len(seen) == len(set(seen)) == n_docs  # each doc exactly once
    # revisit page 1: same ids, same order
    revisit = [r["doc_id"] for r in compile_cardsearch(
        CardsearchParams(page_size=size, cursor=PageCursor("random", ["walk", 0, p1])),
        built_index, random_seed="walk",
    ).collect()]
    assert revisit == p1
