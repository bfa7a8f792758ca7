"""Gap sessionization: the batch window-function twin and the
applyInPandasWithState streaming twin must produce identical sessions —
including the event-time-timeout finalization path across micro-batches."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from share_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

GAP_S = 600  # 10 min
T0 = datetime(2001, 5, 1, 12, 0, 0)


def _mk_events():
    """5 users, deterministic: per user three sessions of 3/2/1 events with
    >gap spacing between them and <gap spacing inside."""
    rows = []
    for u in range(5):
        base = T0 + timedelta(minutes=u)
        for s, n_ev in enumerate((3, 2, 1)):
            start = base + timedelta(seconds=s * 3 * GAP_S)
            for i in range(n_ev):
                rows.append((u, start + timedelta(seconds=i * (GAP_S // 2))))
    return rows


def _sessions(rows):
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in rows
    }


def test_batch_sessionize_shape(spark):
    ev = spark.createDataFrame(_mk_events(), "user_id long, ts timestamp")
    got = sessionize_batch(ev, GAP_S).collect()
    assert len(got) == 15  # 5 users x 3 sessions
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["session_start"])
        assert [r["n_events"] for r in rs] == [3, 2, 1]
        # 3-event session spans 2 half-gaps
        assert (rs[0]["session_end"] - rs[0]["session_start"]).seconds == GAP_S
        assert rs[2]["session_end"] == rs[2]["session_start"]


def test_stream_equals_batch_including_timeout_path(spark, tmp_path):
    """Two availableNow runs over a shared checkpoint: run 1 emits sessions
    closed by later in-stream events of the same user; run 2 appends one
    far-future event for a DIFFERENT user, advancing the watermark so every
    remaining open session of run-1 users finalizes via the TIMEOUT branch."""
    src = str(tmp_path / "events_src")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.createDataFrame(_mk_events(), "user_id long, ts timestamp")
    ev.write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
        q = (
            sessionize_stream(stream, GAP_S)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = _sessions(spark.read.parquet(out).collect())
    batch = _sessions(sessionize_batch(ev, GAP_S).collect())
    # run 1: the LAST session of every user is still open (nothing after it
    # in-stream); all earlier sessions emitted, identical to the batch twin
    open_last = {max(s for s in batch if s[0] == u) for u in range(5)}
    # (max by tuple works: same user, later start sorts greater)
    assert got1 == batch - {
        max((s for s in batch if s[0] == u), key=lambda s: s[1])
        for u in range(5)
    }

    # run 2: a sentinel event for user 99 pushes the watermark far past
    # every open session's end + gap -> timeout finalization
    spark.createDataFrame(
        [(99, T0 + timedelta(days=2))], "user_id long, ts timestamp"
    ).write.mode("append").parquet(src)
    run_once()
    got2 = _sessions(spark.read.parquet(out).collect())
    # everything from the original data is now final; only the sentinel's
    # own open session is outstanding
    assert got2 == batch
