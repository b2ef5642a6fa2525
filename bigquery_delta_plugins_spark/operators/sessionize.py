"""Event sessionization and exact top-k — stream-analytics operators the
reference has no counterpart for (SURVEY.md §2 "no window functions /
no sorts/limits" gap; these close it engine-side).

- ``sessionize``: gap-based sessions per key as two stacked window
  functions — ``lag`` marks session starts, a running ``sum`` numbers
  them — then one aggregation per (key, session).  All JVM-side; one
  shuffle on the key.  At 100 TB the shuffle partitions by user key;
  Zipf-hot users are bounded because the window is per-key sequential
  anyway (a hot key is one partition-local scan, not a cross-partition
  skew join).
- ``topk_by_count``: exact global top-k via partial-aggregated counts +
  a single ``orderBy(limit)`` — map-side combine collapses the count
  shuffle to |distinct keys|, and the limit is a TakeOrdered (no global
  sort materialization).

The streaming variant (``sessionize_stream``) keeps per-key open-session
state in ``applyInPandasWithState`` with an event-time timeout — the
custom-stateful-operator pattern for Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_minutes: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key gap sessions: a new session starts when the time since
    the previous event exceeds ``gap_minutes``.  Returns one row per
    session: key, session_id (1-based per key), n_events, first/last
    ordering-column values."""
    order_cols = [F.col(ts_col)]
    if order_tiebreak:
        order_cols.append(F.col(order_tiebreak))
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap), F.lit(1)
    ).otherwise(F.lit(0))
    sess = df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w)
    )
    agg = [F.count(F.lit(1)).alias("n_events")]
    if order_tiebreak:
        agg += [
            F.min(order_tiebreak).alias(f"first_{order_tiebreak}"),
            F.max(order_tiebreak).alias(f"last_{order_tiebreak}"),
        ]
    return sess.groupBy(F.col(key_col), F.col("session_id")).agg(*agg)


def topk_by_count(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact global top-k keys by event count, deterministic tie-break
    on the key.  TakeOrdered physical op — no full sort."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col(key_col).asc()).limit(k)


def sessionize_stream(
    events, key_col: str, ts_col: str, *, gap_minutes: int = 30
):
    """Streaming sessionization: per-key open-session state with an
    event-time timeout, emitting a row per CLOSED session.  Uses
    ``applyInPandasWithState`` (Arrow-batched state updates — the
    custom stateful operator escape hatch when built-in session windows
    don't fit)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    gap_ms = gap_minutes * 60 * 1000
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("start_ms", T.LongType()),
            T.StructField("end_ms", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("start_ms", T.LongType()),
            T.StructField("end_ms", T.LongType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            n, s, e = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "start_ms": [s], "end_ms": [e]}
            )
            return
        closed = []
        n, s, e = state.get if state.exists else (0, None, None)
        # A hot key's batch arrives as MULTIPLE pandas chunks (split at
        # arrow.maxRecordsPerBatch); sorting per chunk would process
        # events out of global order and spuriously split sessions, so
        # concatenate every chunk for the key before the single sort.
        chunks = [pdf[ts_col] for pdf in pdf_iter]
        if chunks:
            ms = (pd.concat(chunks).astype("int64") // 1_000_000).sort_values()
            for t in ms:
                t = int(t)
                if s is None:
                    n, s, e = 1, t, t
                elif t - e > gap_ms:
                    closed.append((key[0], n, s, e))
                    n, s, e = 1, t, t
                else:
                    n, e = n + 1, max(e, t)
        state.update((n, s, e))
        state.setTimeoutTimestamp(e + gap_ms)
        if closed:
            yield pd.DataFrame(
                closed, columns=["key", "n_events", "start_ms", "end_ms"]
            )

    return (
        events.withWatermark(ts_col, f"{gap_minutes} minutes")
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
