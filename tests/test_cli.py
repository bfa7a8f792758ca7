"""The `python -m share_spark` driver-job surface (spark-submit analog)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parent.parent)


def _run(*argv: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "share_spark", *argv],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # last stdout line is the JSON result (Spark may log above it)
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def pages_parquet(spark, pages_pdf, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "pages.parquet")
    spark.createDataFrame(pages_pdf).write.mode("overwrite").parquet(path)
    return path


def test_cli_ingest_and_compact_lifecycle(spark, pages_pdf, tmp_path_factory):
    """Full lifecycle through the job surface: backfill -> incremental
    ingest (changed doc wins, tombstone kills the old copy) -> compact
    (generations fold to one) -> identical answer."""
    import pandas as pd
    from pyspark.sql import functions as F

    base = str(tmp_path_factory.mktemp("cli_lc"))
    pages_path = os.path.join(base, "pages.parquet")
    spark.createDataFrame(pages_pdf).write.parquet(pages_path)
    idx = os.path.join(base, "idx")
    _run("build", "--pages", pages_path, "--index-dir", idx,
         "--block-size", "32", "--chunk-docs", "64")

    # replace one doc so a previously-hit doc_id stops matching 'danger'
    hits = _run("query", "--index-dir", idx, "--query", "danger", "-k", "3")
    victim = hits["hits"][0]["doc_id"]
    row = pages_pdf[pages_pdf.doc_id == victim].copy()
    row["text"] = "totally replaced antelope content"
    if "html" in row.columns:
        row["html"] = None  # extraction prefers html when present
    changed_path = os.path.join(base, "changed.parquet")
    spark.createDataFrame(row).write.parquet(changed_path)
    ingested = _run("ingest", "--pages", changed_path, "--index-dir", idx)
    assert ingested["generation"] == 1 and ingested["n_docs"] == 1

    hits2 = _run("query", "--index-dir", idx, "--query", "danger", "-k", "3")
    assert victim not in [h["doc_id"] for h in hits2["hits"]]
    ant = _run("query", "--index-dir", idx, "--query", "antelope", "-k", "3")
    assert [h["doc_id"] for h in ant["hits"]] == [victim]

    _run("compact", "--index-dir", idx)
    hits3 = _run("query", "--index-dir", idx, "--query", "danger", "-k", "3")
    assert [h["doc_id"] for h in hits3["hits"]] == [
        h["doc_id"] for h in hits2["hits"]
    ]

    # soft-delete the current top hit in place (expel = all-gen tombstone)
    top = hits3["hits"][0]["doc_id"]
    ex = _run("expel", "--index-dir", idx, "--doc-ids", str(top))
    assert ex["n_expelled"] == 1
    hits4 = _run("query", "--index-dir", idx, "--query", "danger", "-k", "3")
    assert top not in [h["doc_id"] for h in hits4["hits"]]

    # lineage surface: every lifecycle step above left a snapshot record;
    # a time-travel query at the pre-expel commit still sees the victim
    snaps = _run("snapshots", "--index-dir", idx)["snapshots"]
    assert [s["operation"] for s in snaps[-2:]] == ["replace", "delete"]
    pre_expel = snaps[-2]["snapshot_id"]
    tt = _run("query", "--index-dir", idx, "--query", "danger", "-k", "3",
              "--snapshot-id", str(pre_expel))
    assert [h["doc_id"] for h in tt["hits"]] == [
        h["doc_id"] for h in hits3["hits"]
    ]
    # expiry keeps the current snapshot answering and reclaims the rest
    exp = _run("expire", "--index-dir", idx, "--keep", "1")
    assert pre_expel in exp["expired"]
    hits5 = _run("query", "--index-dir", idx, "--query", "danger", "-k", "3")
    assert [h["doc_id"] for h in hits5["hits"]] == [
        h["doc_id"] for h in hits4["hits"]
    ]


def test_cli_build_query_resume(pages_parquet, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cli_idx") / "idx")
    built = _run(
        "build", "--pages", pages_parquet, "--index-dir", idx,
        "--block-size", "32", "--chunk-docs", "64",
    )
    assert built["cmd"] == "build" and built["n_docs"] == 300
    assert built["docs_per_sec"] > 0 and "postings" in built["stage_seconds"]

    hits = _run("query", "--index-dir", idx, "--query", "danger", "-k", "5")
    assert len(hits["hits"]) == 5
    assert all(h["doc_id"] % 17 in (5, 7) for h in hits["hits"])
    assert hits["hits"][0]["rank"] == 1

    # crash-resume: nuke a done-marker, rebuild with --resume, same answer
    os.remove(os.path.join(idx, "gen0", "_DONE_postings"))
    resumed = _run(
        "build", "--pages", pages_parquet, "--index-dir", idx,
        "--block-size", "32", "--chunk-docs", "64", "--resume",
    )
    assert resumed["n_docs"] == 300
    hits2 = _run("query", "--index-dir", idx, "--query", "danger", "-k", "5")
    assert hits2["hits"] == hits["hits"]


def test_cli_corpus_from_wet(spark, tmp_path_factory):
    """python -m share_spark corpus --wet: WET records -> hygiene pipeline
    -> corpus parquet + training-shard parquet, url variants deduped."""
    import json
    import subprocess
    import sys

    from share_spark import warc

    d = tmp_path_factory.mktemp("cli_corpus")
    wet = d / "wet"
    wet.mkdir()
    recs = [
        {"url": "https://a.example/0", "date_iso": "2022-07-01T00:00:00Z",
         "text": "the quick brown fox jumps over the lazy dog near the "
                 "mill today"},
        {"url": "http://www.a.example/0/", "date_iso": "2022-07-01T01:00:00Z",
         "text": "url variant duplicate body that is long enough to pass "
                 "the gate fine"},
        {"url": "https://a.example/1", "date_iso": "2022-07-02T00:00:00Z",
         "text": "another document with plenty of fresh useful vocabulary "
                 "for the training corpus"},
    ]
    (wet / "seg.warc.wet.gz").write_bytes(warc.write_wet(recs))
    out = subprocess.run(
        [sys.executable, "-m", "share_spark", "corpus",
         "--pages", str(wet), "--wet",
         "--out", str(d / "out"), "--packs-dir", str(d / "packs"),
         "--audit"],
        capture_output=True, text=True, timeout=500,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["n_docs"] == 2
    assert res["stats"]["input"] == 3 and res["stats"]["url_dedup"] == 2
    packs = spark.read.parquet(str(d / "packs")).collect()
    assert len(packs) == 1 and packs[0]["total_tokens"] == 25
