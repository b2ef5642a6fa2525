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

    os.makedirs(checkpoint_dir, exist_ok=True)
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
    changes_dir: str | None = None,
) -> list[dict]:
    """Deterministic apply loop with two-phase commit: apply (atomic
    snapshot w/ batch-id dedup), then advance the checkpoint commit log.
    ``crash_after_apply_batch`` simulates the worst-case failure window —
    death between the two phases — for exactly-once tests.

    ``changes_dir``: eager CDC-out — after each applied batch, the
    batch's changelog (LakeTable.changes_for_batch) lands as parquet
    under ``<changes_dir>/batch=<id>/`` BEFORE the checkpoint commit, so
    the feed is exactly-once with the same crash-window semantics as the
    table itself: a crash between apply and checkpoint re-applies the
    batch as a snapshot no-op and rewrites the same changelog partition
    (mode=overwrite) idempotently."""
    done = read_commit_log(checkpoint_dir)
    out = []
    for batch_id, df in batches:
        if batch_id <= done:
            continue
        m = apply_batch_df(consumer, df, batch_id, database, table, checkpoint_dir)
        out.append(m)
        if changes_dir is not None:
            part = os.path.join(changes_dir, f"batch={batch_id}")
            # freshly applied -> write; replayed-skip with the partition
            # missing -> the crash hit between apply and the changelog
            # write, so backfill it now (the snapshot is committed, the
            # feed entry is fully reconstructible)
            if not m.get("skipped") or not os.path.exists(part):
                try:
                    chg = consumer.table(database, table).changes_for_batch(
                        batch_id
                    )
                except KeyError:
                    chg = None  # batch never committed (e.g. empty)
                if chg is not None:
                    chg.write.mode("overwrite").parquet(part)
        if crash_after_apply_batch is not None and batch_id == crash_after_apply_batch:
            raise RuntimeError(f"simulated crash after applying batch {batch_id}")
        _commit(checkpoint_dir, batch_id)
    return out


def run_microbatch_loop_multi(
    consumer: EventConsumer,
    batches: list[tuple[int, DataFrame]],
    checkpoint_dir: str,
    *,
    tables: list[tuple[str, str]] | None = None,
    max_workers: int = 4,
    crash_after_apply_batch: int | None = None,
) -> list[dict]:
    """Multi-table apply loop (O23): every batch DataFrame carries
    ``(_database, _table)`` columns; per flush one apply task per table
    runs on a thread pool and the checkpoint advances only after ALL
    tables committed — the reference's flush() contract
    (BigQueryEventConsumer.java:670-729).  A replayed batch no-ops per
    table via the snapshot batch-id check, so a partial failure retries
    exactly the failed tables."""
    done = read_commit_log(checkpoint_dir)
    out = []
    for batch_id, df in batches:
        if batch_id <= done:
            continue
        ms = consumer.apply_multi_table_batch(
            df, batch_id, tables=tables, max_workers=max_workers
        )
        for m in ms:
            _append_lineage(checkpoint_dir, m)
        out.extend(ms)
        if crash_after_apply_batch is not None and batch_id == crash_after_apply_batch:
            raise RuntimeError(f"simulated crash after applying batch {batch_id}")
        _commit(checkpoint_dir, batch_id)
    return out


def run_mixed_stream(
    consumer: EventConsumer,
    items: list,
    database: str,
    table: str,
    checkpoint_dir: str,
) -> list[dict]:
    """Sequence-ordered mixed DML+DDL stream driver (O27 forced flush):
    ``items`` is the event stream as the reference's EventConsumer sees
    it — ``("dml", df)`` micro-batches and ``("ddl", DDLEvent)`` control
    events, in stream order.  Each DDL implicitly flushes everything
    before it (earlier items are separate commits); a DML item may ALSO
    carry DDL events interleaved inside its sequence range as
    ``("dml", df, [DDLEvent, ...])`` — the consumer splits the batch at
    the DDL sequence points and flushes each segment before its DDL
    (BigQueryEventConsumer.java:433,457,499).

    Every item is its own checkpoint commit, so a crash replays at most
    one item; DML replays no-op via the lake batch-id check and a
    replayed DDL is either idempotent (CREATE/ALTER) or skipped by the
    consumer when a later segment already committed."""
    done = read_commit_log(checkpoint_dir)
    out = []
    for idx, item in enumerate(items):
        if idx <= done:
            continue
        kind = item[0]
        if kind == "dml":
            df = item[1]
            if C.BATCH_ID in df.columns:
                # stream items are keyed by their position, not by any
                # generator-carried batch column
                df = df.drop(C.BATCH_ID)
            ddls = item[2] if len(item) > 2 else []
            if ddls:
                ms = consumer.apply_mixed_batch(database, table, df, ddls, idx)
            else:
                ms = [consumer.apply_batch(database, table, df, idx)]
            for m in ms:
                _append_lineage(checkpoint_dir, m)
            out.extend(ms)
        elif kind == "ddl":
            consumer.apply_ddl(item[1])
        else:
            raise ValueError(f"unknown stream item kind: {kind!r}")
        _commit(checkpoint_dir, idx)
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
    multi_table: bool = False,
    changes_dir: str | None = None,
):
    """Structured Streaming front-end: parquet file stream -> foreachBatch
    apply.  Spark's checkpoint gives the offset/commit log; the snapshot
    batch-id check de-duplicates the one possibly-replayed batch.

    ``multi_table=True``: the stream carries ``(_database, _table)``
    columns and every micro-batch fans out per table on the consumer's
    thread pool (O23); ``database``/``table`` are ignored.  foreachBatch
    raising on any table fails the trigger, so Spark's commit log only
    advances when ALL tables committed — the reference flush contract."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if multi_table:
            for m in consumer.apply_multi_table_batch(batch_df, batch_id):
                _append_lineage(checkpoint_dir, m)
        else:
            m = apply_batch_df(
                consumer, batch_df, batch_id, database, table, checkpoint_dir
            )
            if changes_dir is not None:
                # eager CDC-out inside the trigger: written before Spark
                # advances its commit log, so a replayed batch (skip via
                # snapshot batch-id) backfills an absent partition and a
                # present one is rewritten idempotently
                part = os.path.join(changes_dir, f"batch={batch_id}")
                if not m.get("skipped") or not os.path.exists(part):
                    try:
                        chg = consumer.table(database, table).changes_for_batch(
                            batch_id
                        )
                    except KeyError:
                        chg = None
                    if chg is not None:
                        chg.write.mode("overwrite").parquet(part)

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
