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


def test_adversarial_skew_partition_balance_and_latency(spark, tmp_path):
    """Adversarial corpus — one term in 100% of docs, a 512-doc duplicate
    cluster, one ~10 MB document — vs a uniform corpus of the same doc
    count: the salted build must keep partition byte spread within +/-25%
    of the mean, and WAND / match_docs latency within 2x of uniform."""
    import json
    import os
    import time

    from share_spark.query.wand import match_docs

    rng = np.random.default_rng(21)

    def mktexts(n):
        return [
            "omni " + " ".join(
                f"w{int(x):03d}" for x in rng.integers(0, 300, 60)
            )
            for _ in range(n)
        ]

    n_base = 2000
    uni = pd.DataFrame(
        {"doc_id": range(n_base + 513), "text": mktexts(n_base + 513),
         "html": None}
    )
    dup_text = (
        "omni duplicated cluster body "
        + " ".join(f"w{i:03d}" for i in range(40))
    )
    huge = " ".join(
        f"w{int(x):03d}" for x in rng.integers(0, 300, 2_000_000)
    )  # ~10 MB single document
    adv_texts = mktexts(n_base) + [dup_text] * 512 + ["omni " + huge]
    adv = pd.DataFrame(
        {"doc_id": range(len(adv_texts)), "text": adv_texts, "html": None}
    )

    cfg = IndexConfig(
        block_size=64, chunk_docs=256, n_partitions=8, salt_chunks=2
    )
    dirs = {}
    for name, pdf in (("uni", uni), ("adv", adv)):
        d = str(tmp_path / name)
        build_index(spark, spark.createDataFrame(pdf), d, cfg)
        dirs[name] = d

    # manifest byte balance: salting must absorb head-term + giant-doc skew
    spreads = {}
    for name, d in dirs.items():
        m = json.load(open(os.path.join(d, "gen0", "manifest.json")))
        b = [p["encoded_bytes"] for p in m["partitions"].values()]
        mean = sum(b) / len(b)
        spreads[name] = (min(b) / mean, max(b) / mean)
    lo, hi = spreads["adv"]
    assert lo >= 0.75 and hi <= 1.25, f"adversarial byte spread {spreads}"

    # latency: adversarial within 2x of uniform.  INTERLEAVED best-of-5
    # (uni/adv alternating per repeat) so transient host load degrades
    # both sides equally instead of whichever ran second; a small
    # absolute slack keeps sub-100ms timings from failing on scheduler
    # jitter alone.
    idxs = {name: IndexReader.open(spark, d) for name, d in dirs.items()}
    ops = {
        "wand_head": lambda idx: wand_topk(idx, "omni", k=10).collect(),
        "wand_mid": lambda idx: wand_topk(
            idx, "w001 w002", k=10
        ).collect(),
        "match": lambda idx: match_docs(idx, "w001").count(),
    }
    lat = {k: float("inf") for k in
           [(n, m) for n in dirs for m in ops]}
    for _ in range(5):
        for metric, fn in ops.items():
            for name in ("uni", "adv"):
                t0 = time.time()
                fn(idxs[name])
                lat[(name, metric)] = min(
                    lat[(name, metric)], time.time() - t0
                )
    for metric in ops:
        adv_t, uni_t = lat[("adv", metric)], lat[("uni", metric)]
        assert adv_t <= 2.0 * uni_t + 0.25, (metric, lat)

    # correctness spot-check on the adversarial index: the dup cluster
    # and the giant doc are all indexed and searchable
    adv_idx = idxs["adv"]
    assert match_docs(adv_idx, "duplicated cluster").count() == 512
    dfs = {
        r["term"]: r["df"]
        for r in adv_idx.term_stats().filter(
            F.col("term") == "omni"
        ).collect()
    }
    assert dfs["omni"] == len(adv_texts)
