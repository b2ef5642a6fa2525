"""Sessionization (batch windows + streaming applyInPandasWithState)
and exact top-k."""

import datetime as dt
import os
import time

from pyspark.sql import types as T

from bigquery_delta_plugins_spark.operators.sessionize import (
    sessionize,
    sessionize_stream,
    topk_by_count,
)

SCHEMA = "user_id long, ts timestamp, event_id long"


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def _events(spark):
    rows = [
        # user 1: two sessions (gap 45 > 30 between minute 20 and 65)
        (1, _ts(0), 1), (1, _ts(10), 2), (1, _ts(20), 3),
        (1, _ts(65), 4), (1, _ts(70), 5),
        # user 2: one session
        (2, _ts(5), 6), (2, _ts(25), 7),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_sessionize_batch(spark):
    out = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["first_event_id"], r["last_event_id"]
        )
        for r in sessionize(
            _events(spark), "user_id", "ts", gap_minutes=30, order_tiebreak="event_id"
        ).collect()
    }
    assert out == {
        (1, 1): (3, 1, 3),
        (1, 2): (2, 4, 5),
        (2, 1): (2, 6, 7),
    }


def test_topk_by_count(spark):
    out = [(r["user_id"], r["n"]) for r in topk_by_count(_events(spark), "user_id", 1).collect()]
    assert out == [(1, 5)]


def test_sessionize_stream_hot_key_spanning_arrow_chunks(spark, tmp_path):
    """A hot key whose micro-batch spans MULTIPLE pandas chunks (Arrow
    maxRecordsPerBatch) must still process events in global time order:
    events arrive interleaved so per-chunk sorting would spuriously
    split the single session and miscount start_ms."""
    # one user, 12 events 1 minute apart, written in an interleaved
    # order so consecutive chunks contain non-adjacent timestamps
    order = [11, 0, 7, 3, 9, 1, 5, 10, 2, 8, 4, 6]
    rows = [(1, _ts(m), m) for m in order]
    events_dir = str(tmp_path / "ev_chunks")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(events_dir)
    # a later event closes the session (gap > 30 min)
    spark.createDataFrame([(1, _ts(120), 99)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("event_id", T.LongType()),
            ]
        )
        stream = spark.readStream.schema(schema).parquet(events_dir)
        sessions = sessionize_stream(stream, "user_id", "ts", gap_minutes=30)
        out_dir, cp = str(tmp_path / "out_chunks"), str(tmp_path / "cp_chunks")
        q = (
            sessions.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        time.sleep(0.2)
        got = {
            (r["key"], r["n_events"], r["end_ms"] - r["start_ms"])
            for r in spark.read.parquet(out_dir).collect()
        }
        # exactly ONE closed session covering all 12 events over 11 min
        assert got == {(1, 12, 11 * 60 * 1000)}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_sessionize_stream_closes_gap_sessions(spark, tmp_path):
    events_dir = str(tmp_path / "ev")
    # file 1: first session of user 1 + start of session 2
    _events(spark).coalesce(1).write.mode("append").parquet(events_dir)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(events_dir)
    sessions = sessionize_stream(stream, "user_id", "ts", gap_minutes=30)
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    time.sleep(0.2)
    got = {
        (r["key"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # user 1's FIRST session closed (in-data gap of 45 min); the still-open
    # sessions (user1 s2, user2 s1) are retained as state, not emitted
    assert (1, 3) in got
    assert (1, 2) not in got


def test_funnel_counts_greedy_subsequence(spark):
    """Funnel semantics: steps must appear as an ordered subsequence;
    wrong order doesn't count, arrival order is irrelevant (sorted by
    order_col), repeats don't double-advance."""
    from bigquery_delta_plugins_spark.operators.funnel import funnel_counts

    rows = [
        # u1: full funnel, interleaved noise, arrival shuffled
        (1, 5, "purchase"), (1, 1, "signup"), (1, 3, "click"), (1, 2, "view"),
        # u2: purchase BEFORE click -> depth 1 only (signup)
        (2, 1, "signup"), (2, 2, "purchase"), (2, 3, "view"),
        # u3: click+purchase but never signed up -> depth 0
        (3, 1, "click"), (3, 2, "purchase"),
        # u4: signup twice then click -> depth 2 (repeat doesn't skip)
        (4, 1, "signup"), (4, 2, "signup"), (4, 3, "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    got = {
        r["steps_reached"]: r["n_users"]
        for r in funnel_counts(
            df, "user_id", "event_id", "event_type",
            ["signup", "click", "purchase"],
        ).collect()
    }
    assert got == {3: 1, 1: 1, 0: 1, 2: 1}


def test_funnel_buffer_excludes_non_step_events(spark):
    """Optimization r6: only funnel-step events enter the per-user
    collect_list buffer (a bot user with millions of non-step events
    must not materialize them in one aggregation buffer), users whose
    events are ALL non-step still count at depth 0, and the result is
    unchanged."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from bigquery_delta_plugins_spark.operators.funnel import funnel_counts

    # one bot user (id 0) with 1M non-step events + a sprinkle of real
    # funnel users, including user 3 with ONLY non-step events
    bot = spark.range(1_000_000).select(
        F.lit(0).alias("user_id"),
        F.col("id").alias("event_id"),
        F.lit("view").alias("event_type"),
    )
    rows = [
        (0, 2_000_000, "signup"), (0, 2_000_001, "click"),
        (1, 1, "signup"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "signup"),
        (3, 1, "view"), (3, 2, "scroll"),  # depth 0, never filtered out
    ]
    ev = bot.unionByName(
        spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    )
    df = funnel_counts(ev, "user_id", "event_id", "event_type",
                       ["signup", "click", "purchase"])
    # the step filter sits BELOW the aggregate: the collected struct is
    # null-guarded on the step set, so non-step rows never enter the
    # partial-aggregation buffer
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "collect_list(CASE WHEN" in plan, plan
    got = {r["steps_reached"]: r["n_users"] for r in df.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}
