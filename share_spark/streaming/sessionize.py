"""Gap-based event sessionization — batch + stateful-streaming twins.

The reference has no stream processor (SURVEY.md §2.9 — its "streaming" is
a RabbitMQ work queue); this operator belongs to the engine's
training-data-pipeline extension surface: group a user's events into
sessions separated by at least `gap` of inactivity (the canonical
clickstream/session-log shape a web-scale corpus pipeline needs).

Two implementations, proven equivalent by tests/test_sessionize.py:

- `sessionize_batch`: lag + cumulative-sum window functions over the whole
  history. One shuffle on user_id; sessions fall out of a groupBy — the
  right shape for backfills at any scale.
- `sessionize_stream`: Structured Streaming `applyInPandasWithState` with
  an EVENT-TIME timeout. State per active user is one open session (three
  numbers — bounded regardless of history length); a session is emitted
  exactly once, either when a later in-stream event of the same user
  closes it, or when the watermark passes `session_end + gap` (the timeout
  branch). This is the micro-batch-continuous shape for live event feeds.

Output (both forms): (user_id, session_start, session_end, n_events).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open-session state: (start_ms, end_ms, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin: a new session starts where the gap to the previous event
    of the same user exceeds `gap_seconds` (or there is no previous event);
    the session index is the running count of session starts — lag +
    cumulative sum over one user-partitioned window, then a groupBy."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # double cast: TIMESTAMP_NTZ (parquet) cannot cast straight to long
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    new_session = F.when(
        F.lag(ts_s).over(w).isNull()
        | ((ts_s - F.lag(ts_s).over(w)) > gap_seconds),
        1,
    ).otherwise(0)
    return (
        events.withColumn("_ns", new_session)
        .withColumn("_sess", F.sum("_ns").over(w))
        .groupBy(F.col(user_col).alias("user_id"), "_sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("_sess")
    )


def _make_session_fn(gap_seconds: int):
    gap_ms = gap_seconds * 1000

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        done: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            # watermark passed end + gap: the open session is final
            done.append(tuple(state.get))
            state.remove()
        else:
            ts_ms: list[int] = []
            for pdf in pdfs:
                ts_ms.extend(
                    (pdf["ts"].astype("int64") // 1_000_000).tolist()
                )
            ts_ms.sort()
            cur = tuple(state.get) if state.exists else None
            for t in ts_ms:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_ms:
                    done.append(cur)  # closed by a later in-stream event
                    cur = (t, t, 1)
                else:
                    # max(): late (pre-watermark-admitted) events may
                    # arrive out of order within the batch's sorted list
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                state.setTimeoutTimestamp(cur[1] + gap_ms)
        if done:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([user] * len(done), dtype="int64"),
                    "session_start": [
                        pd.Timestamp(s, unit="ms") for s, _, _ in done
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="ms") for _, e, _ in done
                    ],
                    "n_events": pd.Series([n for _, _, n in done], dtype="int64"),
                }
            )

    return update


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming twin over a streaming DataFrame with (user_id, ts):
    watermark -> groupBy(user) -> applyInPandasWithState with event-time
    timeout. Emits each finalized session exactly once (append mode)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
