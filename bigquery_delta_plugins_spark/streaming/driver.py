"""Micro-batch drivers: Structured Streaming and a deterministic loop.

Two interchangeable front-ends over ``EventConsumer.apply_batch``, both
honoring the same exactly-once contract (reference flush/commitOffset,
BigQueryEventConsumer.java:670-689,588-601):

1. ``run_structured_stream`` — ``readStream`` over a parquet event
   directory, ``foreachBatch`` apply, Spark's checkpoint offset+commit
   log for resume.  ``maxFilesPerTrigger`` bounds batch size the way the
   reference's ``loadInterval`` timer bounds batch wall-time (O27).
2. ``run_microbatch_loop`` — a deterministic batch iterator with a JSON
   commit log, used by benchmarks and crash-replay tests; identical
   commit contract: the consumer's snapshot-summary ``batch_id`` makes a
   replayed batch a no-op, so a crash between snapshot commit and
   checkpoint commit converges to byte-identical state on resume.

Both emit one lineage JSON line per (batch, table) into
``<checkpoint>/lineage.jsonl``: offset range, event counts, per-bucket
diff counts, applied snapshot id, throughput — the north-rule
resumability audit trail.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .. import constants as C
from .consumer import EventConsumer


def _append_lineage(checkpoint_dir: str, record: dict) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(os.path.join(checkpoint_dir, "lineage.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


def _commit_log_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "commits.json")


def read_commit_log(checkpoint_dir: str) -> int:
    """Highest committed batch id, -1 if none."""
    p = _commit_log_path(checkpoint_dir)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return json.load(f)["latest_batch_id"]


def _commit(checkpoint_dir: str, batch_id: int) -> None:
    import uuid

    p = _commit_log_path(checkpoint_dir)
    tmp = p + "." + uuid.uuid4().hex + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"latest_batch_id": batch_id}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def apply_batch_df(
    consumer: EventConsumer,
    batch_df: DataFrame,
    batch_id: int,
    database: str,
    table: str,
    checkpoint_dir: str | None = None,
) -> dict:
    """Apply one micro-batch DataFrame and record lineage."""
    m = consumer.apply_batch(database, table, batch_df, batch_id)
    if checkpoint_dir:
        # offset range comes from the consumer's single pre-aggregation
        # pass — no extra job per batch
        _append_lineage(checkpoint_dir, m)
    return m


def run_microbatch_loop(
    consumer: EventConsumer,
    batches: list[tuple[int, DataFrame]],
    database: str,
    table: str,
    checkpoint_dir: str,
    crash_after_apply_batch: int | None = None,
) -> list[dict]:
    """Deterministic apply loop with two-phase commit: apply (atomic
    snapshot w/ batch-id dedup), then advance the checkpoint commit log.
    ``crash_after_apply_batch`` simulates the worst-case failure window —
    death between the two phases — for exactly-once tests."""
    done = read_commit_log(checkpoint_dir)
    out = []
    for batch_id, df in batches:
        if batch_id <= done:
            continue
        m = apply_batch_df(consumer, df, batch_id, database, table, checkpoint_dir)
        out.append(m)
        if crash_after_apply_batch is not None and batch_id == crash_after_apply_batch:
            raise RuntimeError(f"simulated crash after applying batch {batch_id}")
        _commit(checkpoint_dir, batch_id)
    return out


def run_structured_stream(
    spark: SparkSession,
    events_dir: str,
    schema,
    consumer: EventConsumer,
    database: str,
    table: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Structured Streaming front-end: parquet file stream -> foreachBatch
    apply.  Spark's checkpoint gives the offset/commit log; the snapshot
    batch-id check de-duplicates the one possibly-replayed batch."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_df(consumer, batch_df, batch_id, database, table, checkpoint_dir)

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(events_dir)
    )
    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", os.path.join(checkpoint_dir, "spark")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    q = writer.trigger(
        processingTime=f"{C.DEFAULT_LOAD_INTERVAL_SECONDS} seconds"
    ).start()
    return q
