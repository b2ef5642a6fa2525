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

from pyspark.sql import functions as F

from .. import constants as C
from ..types import DDLEvent, ddl_event_from_json, ddl_event_to_json
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


def _write_changes_feed(
    consumer: EventConsumer,
    changes_dir: str,
    database: str,
    table: str,
    batch_id: int,
    skipped: bool,
    *,
    multi_table: bool,
) -> None:
    """Eager CDC-out: land one batch's changelog as a parquet partition
    BEFORE the checkpoint commit, so the feed is exactly-once under the
    same crash-window rule as the table itself.  Layout: single-table
    feeds keep ``<changes_dir>/batch=<id>``; multi-table feeds are
    per-table partitioned ``<changes_dir>/<db>/<table>/batch=<id>``.

    Freshly applied -> write; replayed-skip with the partition missing ->
    the crash hit between apply and the feed write, so backfill now (the
    snapshot is committed, the entry is fully reconstructible).  KeyError
    covers never-committed (empty) batches and vacuumed manifests
    (normalized by changes_for_batch); FileNotFoundError covers a table
    dropped after the batch."""
    part = (
        os.path.join(changes_dir, database, table, f"batch={batch_id}")
        if multi_table
        else os.path.join(changes_dir, f"batch={batch_id}")
    )
    if skipped and os.path.exists(part):
        return
    try:
        chg = consumer.table(database, table).changes_for_batch(batch_id)
    except (KeyError, FileNotFoundError):
        return
    chg.write.mode("overwrite").parquet(part)


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
    m["database"], m["table_name"] = database, table
    if checkpoint_dir:
        # offset range comes from the consumer's single pre-aggregation
        # pass — no extra job per batch
        _append_lineage(checkpoint_dir, m)
    return m


def _maybe_auto_compact(
    consumer: EventConsumer,
    database: str,
    table: str,
    threshold: int | None,
    checkpoint_dir: str | None = None,
) -> None:
    """Driver-loop compaction hook: when any bucket of the table holds
    more than ``threshold`` files, bin-pack it (state-neutral commit —
    batch/seq bookkeeping untouched, changelog across the commit empty).
    File counts COMPOUND in a CDC lake (measured 43 -> 315 s/batch when
    they run away, lake/table.py:overwrite_buckets), so steady-state
    ingest needs this in the loop, not as a manual CLI step.  The check
    is a driver-side manifest read — no Spark job unless compaction
    actually runs.

    Observability: each compaction that runs appends an
    ``event="auto_compact"`` lineage line (files before/after, from/to
    snapshot ids) so a production operator can see compaction cadence
    in the same audit trail as the batches."""
    if threshold is None:
        return
    try:
        t = consumer.table(database, table)
        snap = t.current_snapshot()
    except FileNotFoundError:
        return
    counts: dict[int, int] = {}
    for f in snap["files"]:
        counts[f["bucket"]] = counts.get(f["bucket"], 0) + 1
    if counts and max(counts.values()) > threshold:
        m = t.compact(max_files_per_bucket=threshold)
        if checkpoint_dir:
            _append_lineage(checkpoint_dir, {
                "event": "auto_compact",
                "table": t.path,
                "database": database,
                "table_name": table,
                "from_snapshot_id": snap["snapshot_id"],
                **m,
            })


def run_microbatch_loop(
    consumer: EventConsumer,
    batches: list[tuple[int, DataFrame]],
    database: str,
    table: str,
    checkpoint_dir: str,
    crash_after_apply_batch: int | None = None,
    changes_dir: str | None = None,
    auto_compact_files_per_bucket: int | None = None,
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
    (mode=overwrite) idempotently.

    ``auto_compact_files_per_bucket``: steady-state compaction hook —
    see :func:`_maybe_auto_compact`."""
    done = read_commit_log(checkpoint_dir)
    out = []
    for batch_id, df in batches:
        if batch_id <= done:
            continue
        m = apply_batch_df(consumer, df, batch_id, database, table, checkpoint_dir)
        out.append(m)
        if changes_dir is not None:
            _write_changes_feed(
                consumer, changes_dir, database, table, batch_id,
                bool(m.get("skipped")), multi_table=False,
            )
        if crash_after_apply_batch is not None and batch_id == crash_after_apply_batch:
            raise RuntimeError(f"simulated crash after applying batch {batch_id}")
        _commit(checkpoint_dir, batch_id)
        _maybe_auto_compact(consumer, database, table,
                            auto_compact_files_per_bucket, checkpoint_dir)
    return out


def run_microbatch_loop_multi(
    consumer: EventConsumer,
    batches: list[tuple[int, DataFrame]],
    checkpoint_dir: str,
    *,
    tables: list[tuple[str, str]] | None = None,
    max_workers: int = 4,
    crash_after_apply_batch: int | None = None,
    changes_dir: str | None = None,
    auto_compact_files_per_bucket: int | None = None,
) -> list[dict]:
    """Multi-table apply loop (O23): every batch DataFrame carries
    ``(_database, _table)`` columns; per flush one apply task per table
    runs on a thread pool and the checkpoint advances only after ALL
    tables committed — the reference's flush() contract
    (BigQueryEventConsumer.java:670-729).  A replayed batch no-ops per
    table via the snapshot batch-id check, so a partial failure retries
    exactly the failed tables.

    ``tables=None`` discovers the topology ONCE from the union of all
    supplied batches (one distinct-scan job total), not per flush — in
    steady state the driver knows its topology and should pass it.

    ``changes_dir``: eager per-table CDC-out feed, partitioned
    ``<changes_dir>/<db>/<table>/batch=<id>`` — same exactly-once
    crash-window rule as the single-table loop (the reference replicator
    normally carries MANY tables, BigQueryEventConsumer.java:691-729, so
    the feed must too)."""
    done = read_commit_log(checkpoint_dir)
    if tables is None and batches:
        from functools import reduce

        union = reduce(
            lambda a, b: a.unionByName(b), [df for _, df in batches]
        )
        tables = sorted(
            (r["d"], r["t"])
            for r in union.selectExpr("_database as d", "_table as t")
            .distinct()
            .collect()
        )
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
        if changes_dir is not None:
            for m in ms:
                _write_changes_feed(
                    consumer, changes_dir, m["database"], m["table_name"],
                    batch_id, bool(m.get("skipped")), multi_table=True,
                )
        if crash_after_apply_batch is not None and batch_id == crash_after_apply_batch:
            raise RuntimeError(f"simulated crash after applying batch {batch_id}")
        _commit(checkpoint_dir, batch_id)
        for db, tb in tables or []:
            _maybe_auto_compact(consumer, db, tb,
                                auto_compact_files_per_bucket, checkpoint_dir)
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
            # EVERY DML item routes through the STRIDE sub-id space
            # (lake ids idx*STRIDE+k), DDL-carrying or not: a plain item
            # keyed by bare ``idx`` after a mixed item would compare
            # idx <= (idx')*STRIDE+k and be silently skipped as replay —
            # the id space must be uniform for the batch-id barrier to
            # mean anything across item kinds.
            ms = consumer.apply_mixed_batch(database, table, df, ddls, idx)
            for m in ms:
                _append_lineage(checkpoint_dir, m)
            out.extend(ms)
        elif kind == "ddl":
            consumer.apply_ddl(item[1])
        else:
            raise ValueError(f"unknown stream item kind: {kind!r}")
        _commit(checkpoint_dir, idx)
    return out


def run_mixed_stream_multi(
    consumer: EventConsumer,
    items: list,
    checkpoint_dir: str,
    *,
    tables: list[tuple[str, str]] | None = None,
    max_workers: int = 4,
    changes_dir: str | None = None,
) -> list[dict]:
    """Multi-table mixed DML+DDL stream driver (O23 × O27): ``items``
    carry every table's events — ``("dml", df)`` micro-batches with
    ``(_database, _table)`` columns, optionally ``("dml", df, [DDLEvent,
    ...])`` with DDL interleaved inside the batch's sequence range, and
    standalone ``("ddl", DDLEvent)`` control events; all in stream
    order.  A standalone DDL's force-flush is implicit (earlier items
    are separate commits); an interleaved DDL routes to its table's
    fan-out task, which splits that table's sub-stream at the DDL's
    sequence point (consumer.apply_multi_table_mixed_batch).  Each item
    is one checkpoint commit over ALL tables — the reference flush
    contract (BigQueryEventConsumer.java:670-729).

    ``changes_dir``: per-table eager CDC-out feed, same layout and
    crash-window rule as run_microbatch_loop_multi — sub-segment lake
    batch ids (idx*STRIDE+k) each get their own feed partition."""
    done = read_commit_log(checkpoint_dir)
    out = []
    for idx, item in enumerate(items):
        if idx <= done:
            continue
        kind = item[0]
        if kind == "dml":
            df = item[1]
            if C.BATCH_ID in df.columns:
                df = df.drop(C.BATCH_ID)
            ddls = item[2] if len(item) > 2 else []
            ms = consumer.apply_multi_table_mixed_batch(
                df, ddls, idx, tables=tables, max_workers=max_workers
            )
            for m in ms:
                _append_lineage(checkpoint_dir, m)
            out.extend(ms)
            if changes_dir is not None:
                for m in ms:
                    _write_changes_feed(
                        consumer, changes_dir, m["database"], m["table_name"],
                        m["batch_id"], bool(m.get("skipped")), multi_table=True,
                    )
        elif kind == "ddl":
            consumer.apply_ddl(item[1])
        else:
            raise ValueError(f"unknown stream item kind: {kind!r}")
        _commit(checkpoint_dir, idx)
    return out


def ddl_marker_rows(
    spark: SparkSession, stream_schema, events: list[DDLEvent]
) -> DataFrame:
    """Producer-side helper: encode DDL events as inline control rows of
    the streamed event schema — ``_op = 'DDL'``, the serialized event in
    ``_ddl``, the sequence point in ``_sequence_num``, routing columns
    (``_database``/``_table``) filled when the schema carries them, every
    data column NULL.  Append these rows (in sequence position) to the
    same parquet stream the DML rows ride; ``run_structured_stream``
    force-flushes around them (reference: DDL arrives inline in the one
    ordered event stream, BigQueryEventConsumer.java:297-335,433,457,499)."""
    names = stream_schema.fieldNames()
    if C.DDL_PAYLOAD not in names:
        raise ValueError(f"stream schema lacks the {C.DDL_PAYLOAD} column")
    rows = []
    for ev in events:
        d = {n: None for n in names}
        d[C.OPERATION] = C.OP_DDL
        d[C.DDL_PAYLOAD] = ddl_event_to_json(ev)
        d[C.SEQUENCE_NUM] = ev.sequence_num
        if "_database" in names:
            d["_database"] = ev.database
        if "_table" in names and ev.table is not None:
            d["_table"] = ev.table
        rows.append(d)
    return spark.createDataFrame(rows, stream_schema)


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
    tables: list[tuple[str, str]] | None = None,
    auto_compact_files_per_bucket: int | None = None,
):
    """Structured Streaming front-end: parquet file stream -> foreachBatch
    apply.  Spark's checkpoint gives the offset/commit log; the snapshot
    batch-id check de-duplicates the one possibly-replayed batch.

    ``multi_table=True``: the stream carries ``(_database, _table)``
    columns and every micro-batch fans out per table on the consumer's
    thread pool (O23); ``database``/``table`` are ignored (pass
    ``tables`` to skip per-trigger topology discovery).  foreachBatch
    raising on any table fails the trigger, so Spark's commit log only
    advances when ALL tables committed — the reference flush contract.

    ``changes_dir`` works in BOTH modes: the eager CDC-out feed is
    written inside the trigger, before Spark advances its commit log, so
    a replayed batch (skip via snapshot batch-id) backfills an absent
    partition and a present one is rewritten idempotently.  Multi-table
    feeds partition per table (``<changes_dir>/<db>/<table>/batch=<id>``).

    **Inline DDL**: when the stream ``schema`` carries the
    ``constants.DDL_PAYLOAD`` column, the stream may interleave DDL
    control rows (see :func:`ddl_marker_rows`) with DML — the
    production shape: the reference's consumer receives DDL inline in
    the one ordered event stream and force-flushes the buffered DML
    before applying it (BigQueryEventConsumer.java:297-335,433,457,499).
    Every trigger then routes through the mixed-batch consumer APIs
    (DML segments split at each DDL's sequence point; sub-segment lake
    batch ids use the uniform ``batch_id*STRIDE+k`` space whether or
    not a given trigger carried DDL, so the replay barrier stays
    monotone across triggers).  Mid-stream ALTER note: a parquet file
    stream reads ONE fixed schema, so the stream schema must be the
    post-evolution superset — pre-ALTER rows carry NULL in late columns
    and the consumer projects each segment to the table's
    schema-as-of-that-segment."""
    inline_ddl = C.DDL_PAYLOAD in schema.fieldNames()

    def _extract_ddl(batch_df: DataFrame):
        """Split one micro-batch into (DML rows, sequence-ordered DDL
        events).  The collect touches ONLY control rows — DDL is a
        rare control-plane object, never the data path."""
        op = F.col(C.OPERATION)
        ddl_rows = (
            batch_df.filter(op == C.OP_DDL).select(C.DDL_PAYLOAD).collect()
        )
        ddls = sorted(
            (ddl_event_from_json(r[C.DDL_PAYLOAD]) for r in ddl_rows),
            key=lambda e: e.sequence_num,
        )
        dml = batch_df.filter(op.isNull() | (op != C.OP_DDL)).drop(C.DDL_PAYLOAD)
        return dml, ddls

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if multi_table:
            if inline_ddl:
                dml, ddls = _extract_ddl(batch_df)
                ms = consumer.apply_multi_table_mixed_batch(
                    dml, ddls, batch_id, tables=tables
                )
            else:
                ms = consumer.apply_multi_table_batch(
                    batch_df, batch_id, tables=tables
                )
            for m in ms:
                _append_lineage(checkpoint_dir, m)
            if changes_dir is not None:
                for m in ms:
                    _write_changes_feed(
                        consumer, changes_dir, m["database"], m["table_name"],
                        m.get("batch_id", batch_id), bool(m.get("skipped")),
                        multi_table=True,
                    )
            for m in ms:
                _maybe_auto_compact(
                    consumer, m["database"], m["table_name"],
                    auto_compact_files_per_bucket, checkpoint_dir,
                )
        elif inline_ddl:
            dml, ddls = _extract_ddl(batch_df)
            ms = consumer.apply_mixed_batch(database, table, dml, ddls, batch_id)
            for m in ms:
                _append_lineage(checkpoint_dir, m)
                if changes_dir is not None:
                    _write_changes_feed(
                        consumer, changes_dir, database, table,
                        m.get("batch_id", batch_id), bool(m.get("skipped")),
                        multi_table=False,
                    )
            _maybe_auto_compact(
                consumer, database, table, auto_compact_files_per_bucket,
                checkpoint_dir,
            )
        else:
            m = apply_batch_df(
                consumer, batch_df, batch_id, database, table, checkpoint_dir
            )
            if changes_dir is not None:
                _write_changes_feed(
                    consumer, changes_dir, database, table, batch_id,
                    bool(m.get("skipped")), multi_table=False,
                )
            _maybe_auto_compact(
                consumer, database, table, auto_compact_files_per_bucket,
                checkpoint_dir,
            )

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
