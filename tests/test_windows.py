"""Watermarked tumbling-window streaming aggregation
(operators/windows.py): windows emit EXACTLY ONCE when the watermark
passes, a late row whose window state is still live merges, and a late
row arriving after its window was finalized is dropped by the watermark
(numRowsDroppedByWatermark) — finalized windows are never re-emitted."""

import datetime as dt
import time

from pyspark.sql import types as T

from bigquery_delta_plugins_spark.operators.windows import (
    windowed_counts,
    windowed_counts_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_windowed_stream_exactly_once_and_late_drop(spark, tmp_path):
    """Four micro-batches (one file each, watermark delay 16 min,
    15-min windows):

    - b0: W0 gets 3 events (00:02/00:05/00:10), W1 one (00:20).
    - b1 (event 01:00): watermark advances to 00:04 — nothing closes.
    - b2 (event 01:30): watermark 00:44 — W0 and W1 are finalized and
      emitted at this batch's end.
    - b3 (late 00:05 + 02:00): W0 was already finalized, so the late
      row is DROPPED by the watermark (observable in
      numRowsDroppedByWatermark) and W0 is NOT re-emitted; the 01:00
      window (end 01:15 > watermark 01:14) closes only later.

    Append output: exactly one row per closed window, late row excluded;
    open windows (01:30, 02:00) never appear.  The batch twin over the
    same files counts everything — the delta is the watermark contract."""
    events_dir = str(tmp_path / "ev")
    files = [
        [(1, _ts(2), 1), (2, _ts(5), 2), (1, _ts(10), 3), (1, _ts(20), 4)],
        [(3, _ts(60), 5)],
        [(4, _ts(90), 6)],
        [(7, _ts(5), 7), (8, _ts(120), 8)],  # late into finalized W0
    ]
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)
        time.sleep(1.3)  # distinct mtimes => deterministic file order

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    agg = windowed_counts_stream(stream, "ts", window_minutes=15,
                                 watermark_minutes=16)
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    time.sleep(0.2)

    dropped = sum(
        (p.get("stateOperators") or [{}])[0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
    )
    assert dropped == 1  # the post-finalization 00:05 row

    rows = [
        (str(r["window_start"]), r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    ]
    assert sorted(rows) == [  # exactly once per closed window
        ("2024-01-01 00:00:00", 3),
        ("2024-01-01 00:15:00", 1),
        ("2024-01-01 01:00:00", 1),
    ]

    batch = {
        (str(r["window_start"]), r["n_events"])
        for r in windowed_counts(
            spark.read.parquet(events_dir), "ts", 15
        ).collect()
    }
    assert batch == {
        ("2024-01-01 00:00:00", 4),  # includes the row streaming dropped
        ("2024-01-01 00:15:00", 1),
        ("2024-01-01 01:00:00", 1),
        ("2024-01-01 01:30:00", 1),  # windows streaming left open
        ("2024-01-01 02:00:00", 1),
    }
