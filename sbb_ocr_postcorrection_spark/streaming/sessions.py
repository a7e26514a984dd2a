"""Streaming sessionization: event-time session windows per user.

The streaming counterpart of the batch gaps-and-islands operator
(operators/relational.py W2): a session is a run of events by one user
with no gap larger than the timeout. Batch computes it with lag+cumsum;
Structured Streaming has a first-class construct — `session_window` — that
merges events into dynamic, data-driven windows as they arrive and closes
a session once the watermark passes its end.

Scale shape: state is keyed by (user_id, open session); the watermark
bounds it — sessions older than the allowed lateness are emitted and
evicted, so state size tracks the number of ACTIVE sessions, not history.
One shuffle on the session key per micro-batch, exactly like the batch
window's partitionBy.

The test drives the same input through this streaming query and through a
batch gaps-and-islands computation and asserts identical sessions — the
equivalence a user migrating between the two APIs relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize_stream(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """events (streaming or batch): (ts, user_id, ...) →
    per-session aggregates (user_id, session_start, session_end, n_events).

    Works unchanged on a batch DataFrame — session_window is the same
    expression in both modes, which is what makes the batch-equivalence
    test meaningful."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def sessionize_batch_oracle(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """The lag+cumsum gaps-and-islands formulation of the SAME sessions —
    the batch yardstick the streaming query must reproduce.

    session_window semantics (pinned empirically): each event extends the
    session to event_ts + gap; an event at EXACTLY prev_ts + gap still
    merges — a new session starts only when the gap is strictly greater.
    session_end is last_ts + gap."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    # timestamp_diff in MICROSECONDS, not cast('long'): the long cast
    # truncates to whole seconds, which would merge sessions whose true
    # gap is fractionally over the limit (session_window compares at full
    # precision)
    flagged = events.select("user_id", "ts").withColumn(
        "new_session",
        (
            F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
            > gap_seconds * 1_000_000
        )
        .cast("int")
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum(F.coalesce("new_session", F.lit(1))).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        (F.max("ts") + F.expr(f"INTERVAL {gap_seconds} SECONDS")).alias(
            "session_end"
        ),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("session_id")
