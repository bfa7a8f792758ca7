"""Serving tier: rank identity vs the exact scorer, tombstone visibility."""

import pytest

from share_spark.corpus import make_queries
from share_spark.query.bm25 import exact_topk
from share_spark.query.serve import TopKServer


def _x(df):
    return [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def _s(rows):
    return [(rk, d, round(s, 9)) for d, s, rk in rows]


def test_serve_rank_identity_query_set(built_index):
    srv = TopKServer.open(built_index.index_dir)
    for q in make_queries(25):
        got = _s(srv.topk(q["query_text"], k=q["k"]))
        want = _x(exact_topk(built_index, q["query_text"], k=q["k"]))
        assert got == want, q


@pytest.mark.parametrize(
    "qtext",
    [
        '"nothing valued is here"',
        '"nothing valued here"',
        "danger -warning",
        'danger -"warning about danger"',
        "the data science",
    ],
)
def test_serve_phrases_and_negation(built_index, qtext):
    srv = TopKServer.open(built_index.index_dir)
    got = _s(srv.topk(qtext, k=13))
    want = _x(exact_topk(built_index, qtext, k=13))
    assert got == want


def test_serve_offset(built_index):
    srv = TopKServer.open(built_index.index_dir)
    full = _s(srv.topk("the data", k=30))
    page = _s(srv.topk("the data", k=10, offset=10))
    assert [d for _, d, _ in page] == [d for _, d, _ in full[10:20]]


def test_serve_sees_incremental_updates(spark, pages_pdf, tmp_path):
    """A new generation + tombstones written AFTER the server opened must be
    visible (manifest refresh + tombstone mtime check)."""
    from share_spark.index.build import IndexConfig, IndexReader, build_index
    from share_spark.streaming.incremental import apply_incremental

    idx_dir = str(tmp_path / "idx")
    cfg = IndexConfig(block_size=32, chunk_docs=64)
    build_index(spark, spark.createDataFrame(pages_pdf), idx_dir, cfg)
    srv = TopKServer.open(idx_dir)
    before = _s(srv.topk("danger", k=13))
    assert before

    # replace the current top hit with a doc that no longer matches
    top_doc = before[0][1]
    changed = pages_pdf[pages_pdf.doc_id == top_doc].copy()
    changed["text"] = "completely unrelated replacement text"
    changed["html"] = None
    apply_incremental(spark, idx_dir, spark.createDataFrame(changed), cfg)

    srv.refresh()
    after = _s(srv.topk("danger", k=13))
    assert top_doc not in [d for _, d, _ in after]
    want = _x(exact_topk(IndexReader.open(spark, idx_dir), "danger", k=13))
    assert after == want


def test_serve_cache_lru_byte_bounded(built_index):
    """Cache hygiene: insert more decoded terms than the byte budget admits.
    (a) a repeatedly-hit hot term survives (true LRU, not FIFO), (b) resident
    bytes stay <= budget after every query, (c) results after eviction are
    rank-identical to the exact scorer (re-decode, not corruption)."""
    from share_spark.query.serve import _entry_nbytes

    srv = TopKServer.open(built_index.index_dir)
    baseline = _s(srv.topk("danger", k=13))
    # budget: the hot term + one more typical entry, not the whole vocab
    hot_size = _entry_nbytes(srv._term_cache["danger"])
    srv.max_cache_bytes = int(hot_size * 3)
    srv._evict(protect=set())

    fillers = ["the", "data", "table", "merge", "window", "batch", "row",
               "fast", "slow", "value", "hash", "scan", "science", "key"]
    for i, t in enumerate(fillers):
        srv.topk(t, k=5)
        srv.topk("danger", k=5)  # keep the hot term recent
        assert srv._term_cache_nbytes <= srv.max_cache_bytes
        if i >= 3:
            assert "danger" in srv._term_cache  # survives under pressure
    # accounting invariant: tracked bytes == actual bytes
    assert srv._term_cache_nbytes == sum(
        _entry_nbytes(e) for e in srv._term_cache.values()
    )
    assert len(srv._term_cache) < len(fillers) + 1  # something was evicted
    # (c) rank identity after heavy eviction, incl. a term long since evicted
    assert _s(srv.topk("danger", k=13)) == baseline
    want = _x(exact_topk(built_index, "the data", k=13))
    assert _s(srv.topk("the data", k=13)) == want


def test_sharded_server_bit_identical_to_single(built_index):
    """The chunk-striped fan-out (ShardedTopKServer) merges per-shard top-k
    into EXACTLY the single server's result — scores, order, offsets —
    because stats stay global and every doc lives in one shard."""
    from share_spark.query.serve import ShardedTopKServer

    srv = TopKServer.open(built_index.index_dir)
    sh = ShardedTopKServer.open(built_index.index_dir, n_shards=4)
    for q in ["danger", "the data", "danger -warning",
              '"nothing valued is here"', "the data science"]:
        assert _s(sh.topk(q, k=13)) == _s(srv.topk(q, k=13)), q
    assert _s(sh.topk("the data", k=10, offset=10)) == _s(
        srv.topk("the data", k=10, offset=10)
    )
    # striping is disjoint and complete: per-shard postings partition the
    # unsharded term's postings
    srv._read_terms(["danger"])
    whole = set(srv._term_cache["danger"][0].tolist())
    parts = []
    for s in sh._shards:
        s._read_terms(["danger"])
        parts.append(set(s._term_cache["danger"][0].tolist()))
    assert set.union(*parts) == whole
    assert sum(len(p) for p in parts) == len(whole)


def test_warmup_preloads_top_df_terms(built_index):
    """warmup(preload_top_terms=N) decodes the N highest-df terms into
    the cache at startup; a subsequent head-term query touches no row
    groups, and results stay rank-identical to the exact scorer."""
    srv = TopKServer.open(built_index.index_dir)
    srv.warmup(preload_top_terms=8)
    assert len(srv._term_cache) >= 8
    # the cached set must be the df-top terms of the corpus
    import pyarrow.dataset as pads
    import os

    stats = (
        pads.dataset(
            os.path.join(built_index.index_dir, "gen0", "term_stats"),
            format="parquet",
        )
        .to_table(columns=["term", "df"])
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True])
    )
    top8 = set(stats.head(8)["term"])
    assert top8 <= set(srv._term_cache)
    head = stats.iloc[0]["term"]
    calls = []
    orig = srv._read_row_groups
    srv._read_row_groups = lambda *a, **k: calls.append(a) or orig(*a, **k)
    got = _s(srv.topk(head, k=13))
    # df lookup may hit term_stats, but postings must come from cache
    assert not any("postings" in str(a) for a in calls), calls
    assert got == _x(exact_topk(built_index, head, k=13))


def test_refresh_detects_same_numbered_rebuild(spark, pages_pdf, tmp_path):
    """compact() can land on the same generation list ([0]) with entirely
    new files; refresh must drop caches via the build_id nonce, not keep
    serving the deleted build's bytes through open handles."""
    from share_spark.index.build import IndexConfig, build_index
    from share_spark.streaming.incremental import apply_incremental, compact

    cfg = IndexConfig(block_size=32, chunk_docs=64)
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(pages_pdf), d, cfg)
    srv = TopKServer.open(d)
    target = srv.topk("danger", k=5)[0][0]
    assert srv.topk("zyzzyva", k=5) == []

    # replace one doc, then compact: generations go [0,1] -> [0] with
    # all-new files under the same numbering
    changed = pages_pdf[pages_pdf.doc_id == target].copy()
    changed["text"] = "zyzzyva replacement content"
    changed["html"] = None
    apply_incremental(spark, d, spark.createDataFrame(changed), cfg)
    compact(spark, d, cfg)

    srv.refresh()
    assert [r[0] for r in srv.topk("zyzzyva", k=5)] == [target]
    assert target not in {r[0] for r in srv.topk("danger", k=50)}
