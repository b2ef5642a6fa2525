"""Tumbling event-time windows — batch and watermarked-streaming twins.

The north rule's streaming surface: windowed aggregation with watermarks
so late data is bounded (readStream -> withWatermark -> window groupBy
-> append sink).  The batch form is the exact same aggregation expressed
over a static frame, which gives the DuckDB oracle a target: both group
on the epoch-aligned window start that ``F.window`` computes.

Aggregates are deliberately order-independent (counts, distincts,
min/max) so the oracle compare is exact — no float summation order to
chase.

Scale shape: a single hash aggregation keyed on (window, key) with
map-side partial aggregation; streaming state is one row per open
window per key, expired by the watermark — bounded memory at any input
rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str,
    window_minutes: int,
    key_col: str | None = None,
) -> DataFrame:
    """Per-window (optionally per-key) order-independent aggregates."""
    w = F.window(F.col(ts_col), f"{window_minutes} minutes").alias("w")
    start = F.col("w.start").alias("window_start")
    if key_col is not None:
        return (
            events.groupBy(w, F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(start, key_col, "n_events")
        )
    return (
        events.groupBy(w)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
        .select(start, "n_events", "n_users", "min_event_id", "max_event_id")
    )


def windowed_counts_stream(
    events: DataFrame,
    ts_col: str,
    window_minutes: int,
    watermark_minutes: int,
    key_col: str | None = None,
) -> DataFrame:
    """Streaming twin: append-mode windows finalize (and emit EXACTLY
    ONCE) when the batch's watermark passes the window end.  Late rows
    whose window state is still live merge into it; a row arriving
    after its window was finalized is dropped by the watermark
    (observable as numRowsDroppedByWatermark) and the window is never
    re-emitted — so the lateness tolerance is ``watermark_minutes``
    behind the max observed event time, enforced at state-eviction
    granularity (verified batch-by-batch in tests/test_windows.py
    against recorded per-batch watermarks and drop counters)."""
    keys = [F.window(F.col(ts_col), f"{window_minutes} minutes").alias("w")]
    if key_col is not None:
        keys.append(F.col(key_col))
    out = (
        events.withWatermark(ts_col, f"{watermark_minutes} minutes")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cols = [F.col("w.start").alias("window_start")]
    if key_col is not None:
        cols.append(F.col(key_col))
    return out.select(*cols, "n_events")
