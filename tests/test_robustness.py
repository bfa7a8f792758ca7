"""SURVEY.md §7 risk-list checks: analyzer variants, extreme head-term skew."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from share_spark.index.build import IndexConfig, IndexReader, build_index
from share_spark.query.bm25 import exact_topk
from share_spark.query.wand import wand_topk
from tests.frozen_bm25 import FrozenIndex


def test_english_analyzer_end_to_end(spark, tmp_path):
    """Stemmed+stopped pipeline: index and query must agree with the frozen
    oracle under analyzer='english' (stems collide: running/run/runs)."""
    rows = [
        (0, "the running dogs are jumping over fences"),
        (1, "a dog runs and jumps"),
        (2, "cats sleep all day long"),
        (3, "he jumped while running quickly"),
        (4, "completely unrelated text about spark engines"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["html"] = None
    d = str(tmp_path / "eidx")
    cfg = IndexConfig(analyzer="english", block_size=8, chunk_docs=16)
    build_index(spark, spark.createDataFrame(pdf), d, cfg)
    idx = IndexReader.open(spark, d)
    frozen = FrozenIndex({r[0]: r[1] for r in rows}, analyzer="english")
    for q in ("running dog", "jump", "the sleeping cat", "run jumps"):
        want = frozen.topk(q, k=10)
        got = [
            (r["rank"], r["doc_id"], r["score"])
            for r in wand_topk(idx, q, k=10).collect()
        ]
        assert [(r, dd) for r, dd, _ in got] == [(r, dd) for r, dd, _ in want], q
        for (_, _, gs), (_, _, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6


def test_extreme_head_term_skew(spark, tmp_path):
    """A term present in EVERY doc (worst-case skew): salted shuffle must
    produce non-overlapping, complete, correctly-merged postings, and
    query results must match the frozen oracle."""
    rng = np.random.default_rng(11)
    n = 2000
    texts = [
        "everywhere " + " ".join(f"w{int(x):03d}" for x in rng.integers(0, 200, 8))
        for _ in range(n)
    ]
    pdf = pd.DataFrame({"doc_id": range(n), "text": texts, "html": None})
    d = str(tmp_path / "skewidx")
    cfg = IndexConfig(block_size=16, chunk_docs=64, salt_chunks=2, n_partitions=8)
    build_index(spark, spark.createDataFrame(pdf), d, cfg)
    idx = IndexReader.open(spark, d)

    # postings for the 100%-df term: complete, disjoint, sorted
    from share_spark.query.bm25 import decode_blocks

    rows = decode_blocks(
        idx.postings().filter(F.col("term") == "everywhere")
    ).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == list(range(n)), "salted merge lost or duplicated postings"

    stats = {r["term"]: r["df"] for r in idx.term_stats().collect()}
    assert stats["everywhere"] == n

    # the head term spreads across many partitions (the salt worked)
    parts = {
        r["part_id"]
        for r in idx.postings().filter(F.col("term") == "everywhere").collect()
    }
    assert len(parts) > 1, "head term not split across partitions"

    frozen = FrozenIndex({i: t for i, t in enumerate(texts)})
    for q in ("everywhere", "everywhere w001", "w005 w010"):
        want = frozen.topk(q, k=13)
        got = [
            (r["rank"], r["doc_id"], r["score"])
            for r in wand_topk(idx, q, k=13).collect()
        ]
        assert [(r, dd) for r, dd, _ in got] == [(r, dd) for r, dd, _ in want], q
