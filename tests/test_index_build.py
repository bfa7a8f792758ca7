"""Index-build correctness: postings round-trip, stats, skew layout, resume."""

import numpy as np
from pyspark.sql import functions as F

from share_spark.corpus import make_web_pages
from share_spark.index.build import IndexConfig, IndexReader, build_index
from share_spark.query.bm25 import decode_blocks


def test_postings_roundtrip_matches_frozen(built_index, pages_pdf):
    """Decoded postings == frozen naive index's tf table, exactly."""
    from tests.frozen_bm25 import FrozenIndex

    frozen = FrozenIndex.from_pages(pages_pdf)
    decoded = decode_blocks(built_index.postings()).collect()
    got = {(r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in decoded}
    want = {
        (t, d): (c, len(frozen.tokens[d]))
        for d, cnt in frozen.tf.items()
        for t, c in cnt.items()
    }
    assert got == want


def test_term_stats_match_frozen(built_index, pages_pdf):
    from tests.frozen_bm25 import FrozenIndex

    frozen = FrozenIndex.from_pages(pages_pdf)
    stats = {r["term"]: r["df"] for r in built_index.term_stats().collect()}
    assert stats == dict(frozen.df)
    assert built_index.n_docs == frozen.n_docs
    assert abs(built_index.avgdl - frozen.avgdl) < 1e-9


def test_blocks_are_sorted_chunk_aligned_and_sized(built_index):
    rows = built_index.postings().collect()
    cfg_chunk = built_index.gen_manifests[0]["chunk_docs"]
    bs = built_index.gen_manifests[0]["block_size"]
    for r in rows:
        assert r["n"] <= bs
        assert r["first_doc"] <= r["last_doc"]
        assert r["first_doc"] // cfg_chunk == r["chunk"]
        assert r["last_doc"] // cfg_chunk == r["chunk"], "block spans a chunk"
    # per (term): doc ranges of blocks must be disjoint and increasing overall
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append((r["first_doc"], r["last_doc"]))
    for term, spans in by_term.items():
        spans.sort()
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            assert b1 < a2, f"overlapping blocks for {term}"


def test_block_bound_metadata_dominates_any_avgdl(built_index):
    """(max_tf, min_dl) must upper-bound every posting's impact under ANY
    avgdl the multi-generation index may later converge to — the stale-bound
    bug class: a bound baked with one generation's avgdl can under-estimate
    impact once the global avgdl grows."""
    k1 = built_index.k1
    b = built_index.b
    from share_spark.index.codec import varint_decode

    for avgdl in (built_index.avgdl, built_index.avgdl * 3, built_index.avgdl / 3):
        for r in built_index.postings().limit(200).collect():
            tf = varint_decode(r["tfs_bin"]).astype(float)
            dl = varint_decode(r["dls_bin"]).astype(float)
            assert r["max_tf"] == tf.max()
            assert r["min_dl"] == dl.min()
            impact = (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
            bound = (r["max_tf"] * (k1 + 1)) / (
                r["max_tf"] + k1 * (1 - b + b * r["min_dl"] / avgdl)
            )
            assert bound >= impact.max() - 1e-12


def test_positions_roundtrip(built_index, pages_pdf):
    """Positional runs must decode back to the analyzer's token offsets."""
    from share_spark.analysis import tokenize
    from share_spark.extract import extract_text
    from share_spark.index.codec import grouped_delta_decode, varint_decode

    # expected positions from the frozen analyzer
    expected: dict[tuple[str, int], list[int]] = {}
    for r in pages_pdf.head(40).itertuples():
        toks = tokenize(extract_text(r.html, r.text), "standard")
        for i, t in enumerate(toks):
            expected.setdefault((t, int(r.doc_id)), []).append(i)

    checked = 0
    for blk in built_index.postings().filter("first_doc < 40").collect():
        ids = np.cumsum(varint_decode(blk["docs_bin"])).astype(np.int64)
        tfs = varint_decode(blk["tfs_bin"]).astype(np.int64)
        flat = grouped_delta_decode(blk["pos_bin"], tfs)
        offs = np.concatenate(([0], np.cumsum(tfs)))
        for i, d in enumerate(ids):
            if d >= 40:
                continue
            got = flat[offs[i] : offs[i + 1]].tolist()
            assert got == expected[(blk["term"], int(d))]
            checked += 1
    assert checked > 100


def test_manifest_partition_metrics(built_index):
    m = built_index.gen_manifests[0]
    assert m["n_docs"] == 300
    assert m["strategy_check"]
    total = sum(p["n_postings"] for p in m["partitions"].values())
    assert total == decodecount(built_index)


def decodecount(idx):
    return idx.postings().agg(F.sum("n")).collect()[0][0]


def test_resume_skips_done_stages(spark, tmp_path):
    """Kill/resume invariant (SURVEY.md §5 item v): stage markers make
    re-runs skip completed work and produce the identical index."""
    pages = spark.createDataFrame(make_web_pages(50, seed=7))
    d = str(tmp_path / "idx")
    cfg = IndexConfig(block_size=16, chunk_docs=32)
    build_index(spark, pages, d, cfg)
    before = sorted(
        (r["term"], r["doc_id"])
        for r in decode_blocks(IndexReader.open(spark, d).postings()).collect()
    )
    # simulate a crash after termdoc: wipe later stage markers, rebuild resume=True
    import os

    os.remove(os.path.join(d, "gen0", "_DONE_postings"))
    os.remove(os.path.join(d, "gen0", "_DONE_term_stats"))
    build_index(spark, pages, d, cfg, resume=True)
    after = sorted(
        (r["term"], r["doc_id"])
        for r in decode_blocks(IndexReader.open(spark, d).postings()).collect()
    )
    assert before == after


def test_url_keyed_ids_full_range_int64(spark, tmp_path):
    """Input-hint shape: pages keyed by url only — doc ids derive as
    xxhash64(url), full-range int64 (about half NEGATIVE). Chunking
    (floor div), WAND/exact/serve rank identity, url-based replacement
    tombstones, and expel must all survive negative ids."""
    import pandas as pd
    from pyspark.sql import functions as F

    from share_spark.engine import SearchEngine
    from share_spark.index.build import IndexConfig, IndexReader
    from share_spark.query.bm25 import exact_topk
    from share_spark.query.wand import wand_topk

    n = 120
    pdf = pd.DataFrame(
        {
            "url": [f"https://s{i % 7}.example/p/{i}" for i in range(n)],
            "text": [
                ("special marker " if i % 5 == 0 else "")
                + f"w{i % 11:02d} filler body common tokens"
                for i in range(n)
            ],
            "html": None,
        }
    )
    cfg = IndexConfig(block_size=16, chunk_docs=64)
    d = str(tmp_path / "urlidx")
    eng = SearchEngine.build(spark, spark.createDataFrame(pdf), d, cfg)
    idx = eng.reader
    docs = idx.docs().select("doc_id", "url").collect()
    ids = {r["url"]: r["doc_id"] for r in docs}
    assert len(ids) == n
    assert any(v < 0 for v in ids.values())  # full-range hashing
    # chunk keys are floor-div (negative chunks exist and are consistent)
    assert any(v // cfg.chunk_docs < 0 for v in ids.values())

    w = [(r["doc_id"], round(r["score"], 9))
         for r in wand_topk(idx, "special marker", k=30).collect()]
    e = [(r["doc_id"], round(r["score"], 9))
         for r in exact_topk(idx, "special marker", k=30).collect()]
    assert w == e and len(w) == n // 5
    s = [(doc, round(sc, 9)) for doc, sc, _ in eng.topk(
        "special marker", k=30, serve=True
    )]
    assert s == w

    # url-keyed replacement: same url, new text -> old content tombstoned
    repl = pdf.iloc[[0]].copy()
    repl["text"] = "entirely new capuchin content"
    eng.ingest(spark.createDataFrame(repl), cfg)
    idx2 = eng.reader
    assert {r["doc_id"] for r in wand_topk(idx2, "capuchin", k=5).collect()} \
        == {ids[pdf.iloc[0]["url"]]}
    hits = {r["doc_id"] for r in wand_topk(idx2, "special", k=40).collect()}
    assert ids[pdf.iloc[0]["url"]] not in hits and len(hits) == n // 5 - 1

    # expel a negative-id doc through the facade
    victim = next(v for v in ids.values() if v < 0 and v in hits)
    eng.expel([victim])
    hits2 = {r["doc_id"] for r in wand_topk(eng.reader, "special", k=40).collect()}
    assert victim not in hits2 and len(hits2) == len(hits) - 1
    assert victim not in {doc for doc, _, _ in eng.topk("special", k=40, serve=True)}


def test_pfor_codec_index_rank_identical(spark, pages_pdf, built_index, tmp_path):
    """An index built with postings_codec='pfor' (hybrid PFor/varint block
    layout) must produce bit-identical query results to the varint index on
    every path: WAND top-k, phrase, boolean match set, exact verifier."""
    from share_spark.index.build import (
        IndexConfig,
        IndexReader,
        build_index,
        config_of,
    )
    from share_spark.query.bm25 import exact_topk
    from share_spark.query.wand import match_docs, wand_topk

    idx_dir = str(tmp_path / "pfor_idx")
    cfg = IndexConfig(
        analyzer="standard", block_size=32, chunk_docs=64, postings_codec="pfor"
    )
    build_index(spark, spark.createDataFrame(pages_pdf), idx_dir, cfg)
    pidx = IndexReader.open(spark, idx_dir)
    assert pidx.postings_codec == "pfor"
    assert config_of(idx_dir).postings_codec == "pfor"  # ingest inherits it
    # codec changes the layout string, so the strategy checksum must differ
    assert (
        pidx.gen_manifests[0]["strategy_check"]
        != built_index.gen_manifests[0]["strategy_check"]
    )

    toks = pages_pdf["text"].iloc[0].split()
    phrase = " ".join(toks[3:5])
    queries = [
        "w00000 w00003",
        f'"{phrase}" w00001',
        "w00002 -w00010",
    ]
    for q in queries:
        a = [(r.doc_id, r.score) for r in wand_topk(built_index, q, k=12).collect()]
        b = [(r.doc_id, r.score) for r in wand_topk(pidx, q, k=12).collect()]
        assert a == b, q
        # exact path compared codec-vs-codec (exact vs WAND fold order can
        # differ in the last ulp; cross-path identity has its own test)
        ea = [(r.doc_id, r.score) for r in exact_topk(built_index, q, k=12).collect()]
        eb = [(r.doc_id, r.score) for r in exact_topk(pidx, q, k=12).collect()]
        assert ea == eb, q
    ma = sorted(r.doc_id for r in match_docs(built_index, "w00000 w00001").collect())
    mb = sorted(r.doc_id for r in match_docs(pidx, "w00000 w00001").collect())
    assert ma == mb and len(ma) > 0

    # serve tier decodes through the same codec registry
    from share_spark.query.serve import TopKServer

    sa = TopKServer.open(built_index.index_dir).topk(queries[1], k=12)
    sb = TopKServer.open(idx_dir).topk(queries[1], k=12)
    assert str(sa) == str(sb)
