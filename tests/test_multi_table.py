"""O23 multi-table parallel apply + O27 forced-flush mixed DML/DDL
streams, ported from the reference's behavioral tests:

- multi-table insert flush counts (BigQueryConsumerTest.java:172-216)
- ALTER add-column mid-stream through the DRIVER, not manual apply_ddl
  calls (BigQueryConsumerTest.java:219-271; forced flush ordering
  BigQueryEventConsumer.java:433,457,499)
- partial-failure error aggregation with exactly-once retry
  (processBlobsInParallel error handling, BigQueryEventConsumer.java:
  691-729)
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
from bigquery_delta_plugins_spark.streaming.driver import (
    run_microbatch_loop_multi,
    run_mixed_stream,
)
from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp

SRC = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

STAGING = T.StructType(
    [
        T.StructField(C.OPERATION, T.StringType(), False),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("_before_user_id", T.LongType(), True),
        T.StructField("_database", T.StringType(), True),
        T.StructField("_table", T.StringType(), True),
    ]
)


def _ev(op, seq, uid, val, before=None, db="db", tb="t0"):
    return (op, seq, uid, val, before, db, tb)


def _consumer(spark, tmp_path, **kw):
    return EventConsumer(spark, os.path.join(str(tmp_path), "wh"), num_buckets=4, **kw)


def _create(consumer, tables=("t0", "t1", "t2")):
    for t in tables:
        consumer.apply_ddl(
            DDLEvent(DDLOp.CREATE_TABLE, "db", t, schema=SRC, primary_keys=["user_id"])
        )


def test_multi_table_insert_flush_counts(spark, tmp_path):
    """Each table receives exactly its own sub-batch — the reference's
    per-table event-count assertion (BigQueryConsumerTest.java:172-216)."""
    consumer = _consumer(spark, tmp_path)
    _create(consumer)
    events = [
        _ev("INSERT", s, uid, float(uid), tb=f"t{uid % 3}")
        for s, uid in enumerate(range(30), start=1)
    ]
    df = spark.createDataFrame(events, STAGING)
    ms = run_microbatch_loop_multi(
        consumer, [(0, df)], os.path.join(str(tmp_path), "cp")
    )
    assert len(ms) == 3 and all(not m["skipped"] for m in ms)
    for i in range(3):
        got = consumer.table("db", f"t{i}").read()
        uids = {r["user_id"] for r in got.collect()}
        assert uids == {u for u in range(30) if u % 3 == i}


def test_multi_table_partial_failure_and_retry(spark, tmp_path):
    """One table's failure doesn't stop the others; the error is
    aggregated; retrying the same batch applies exactly the failed
    table (committed tables no-op via snapshot batch-id dedup)."""
    consumer = _consumer(spark, tmp_path)
    _create(consumer, tables=("t0", "t1"))  # t2 missing -> its apply fails
    events = [
        _ev("INSERT", s, uid, float(uid), tb=f"t{uid % 3}")
        for s, uid in enumerate(range(30), start=1)
    ]
    df = spark.createDataFrame(events, STAGING)
    with pytest.raises(RuntimeError, match=r"1/3 table applies failed.*t2"):
        consumer.apply_multi_table_batch(df, 0)
    # the two healthy tables committed
    assert consumer.table("db", "t0").read().count() == 10
    assert consumer.table("db", "t1").read().count() == 10

    _create(consumer, tables=("t2",))
    ms = consumer.apply_multi_table_batch(df, 0)
    by_table = {m["table"].rsplit("/", 1)[-1]: m for m in ms}
    assert by_table["t0"]["skipped"] and by_table["t0"]["reason"] == "batch_id already committed"
    assert by_table["t1"]["skipped"]
    assert not by_table["t2"]["skipped"]
    for i in range(3):
        assert consumer.table("db", f"t{i}").read().count() == 10


def test_structured_stream_multi_table(spark, tmp_path):
    """O23 through Structured Streaming: a parquet file stream whose
    rows carry (_database, _table) fans out per table inside
    foreachBatch; Spark's commit log only advances when every table
    committed."""
    import time as _time

    from bigquery_delta_plugins_spark.streaming.driver import run_structured_stream

    consumer = _consumer(spark, tmp_path)
    _create(consumer)
    events_dir = str(tmp_path / "events")
    for half in range(2):
        rows = [
            _ev("INSERT", 1 + uid + half * 100, uid + half * 30,
                float(uid + half * 30), tb=f"t{uid % 3}")
            for uid in range(30)
        ]
        spark.createDataFrame(rows, STAGING).coalesce(1).write.mode("append").parquet(
            events_dir
        )
        _time.sleep(1.05)  # distinct mtimes => deterministic file order
    run_structured_stream(
        spark, events_dir, STAGING, consumer, "", "",
        os.path.join(str(tmp_path), "cp"),
        max_files_per_trigger=1, multi_table=True,
    )
    for i in range(3):
        got = {r["user_id"] for r in consumer.table("db", f"t{i}").read().collect()}
        assert got == {u for u in range(60) if u % 3 == i}


MIXED = T.StructType(
    [
        T.StructField(C.OPERATION, T.StringType(), False),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
        T.StructField("_before_user_id", T.LongType(), True),
    ]
)

SRC_EVOLVED = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _mixed_rows():
    # seqs 1-4 insert before the ALTER (props values present in the
    # stream but the table doesn't have the column yet); ALTER at seq 5;
    # seqs 6-8 update/insert after it
    pre = [("INSERT", s, s, float(s), f"p{s}", None) for s in range(1, 5)]
    post = [
        ("UPDATE", 6, 1, 11.0, "p6", 1),
        ("INSERT", 7, 9, 9.0, "p7", None),
        ("DELETE", 8, 2, 2.0, "p8", 2),
    ]
    return pre, post


def test_ddl_interleaved_forced_flush(spark, tmp_path):
    """ALTER mid-stream THROUGH THE DRIVER: the DML segment before the
    DDL sequence point flushes first, the ALTER applies, the rest
    merges against the evolved schema.  Rows last written before the
    ALTER surface NULL for the new column."""
    consumer = _consumer(spark, tmp_path)
    consumer.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=SRC, primary_keys=["user_id"])
    )
    pre, post = _mixed_rows()
    df = spark.createDataFrame(pre + post, MIXED)
    alter = DDLEvent(
        DDLOp.ALTER_TABLE, "db", "t", schema=SRC_EVOLVED,
        primary_keys=["user_id"], sequence_num=5,
    )
    ms = run_mixed_stream(
        consumer, [("dml", df, [alter])], "db", "t",
        os.path.join(str(tmp_path), "cp"),
    )
    assert len(ms) == 2 and not any(m["skipped"] for m in ms)
    got = {
        r["user_id"]: (r["value"], r["props"])
        for r in consumer.table("db", "t").read().collect()
    }
    # user 2 hard-deleted at seq 8; user 1 updated at seq 6 (gets props);
    # users 3,4 pre-ALTER rows surface NULL props; user 9 inserted post
    assert got == {
        1: (11.0, "p6"),
        3: (3.0, None),
        4: (4.0, None),
        9: (9.0, "p7"),
    }


def test_mixed_stream_resume_and_ddl_replay_skip(spark, tmp_path):
    """Crash replay of a mixed batch: committed DML segments no-op, a
    TRUNCATE whose later segment already committed is SKIPPED on replay
    (no data loss), and the final state converges."""
    consumer = _consumer(spark, tmp_path)
    consumer.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=SRC, primary_keys=["user_id"])
    )
    seed = [("INSERT", s, s, float(s), None, None) for s in range(1, 4)]
    tail = [("INSERT", s, s, float(s), None, None) for s in range(10, 13)]
    df = spark.createDataFrame(
        [(op, sq, u, v, p, b) for op, sq, u, v, p, b in seed + tail], MIXED
    )
    trunc = DDLEvent(DDLOp.TRUNCATE_TABLE, "db", "t", sequence_num=5)
    ms = consumer.apply_mixed_batch("db", "t", df.drop("props"), [trunc], batch_id=7)
    assert len(ms) == 2
    state1 = sorted(r["user_id"] for r in consumer.table("db", "t").read().collect())
    assert state1 == [10, 11, 12]  # seed rows truncated away

    # full replay of the same mixed batch: segments skip via batch-id
    # dedup AND the truncate is skipped (its later segment committed)
    ms2 = consumer.apply_mixed_batch("db", "t", df.drop("props"), [trunc], batch_id=7)
    assert all(m["skipped"] for m in ms2)
    state2 = sorted(r["user_id"] for r in consumer.table("db", "t").read().collect())
    assert state2 == state1


def test_rename_table_is_logged_and_skipped(spark, tmp_path, caplog):
    """O16: RENAME_TABLE is explicitly unsupported — logged and skipped,
    table state untouched (BigQueryEventConsumer.java:491-497)."""
    import logging

    consumer = _consumer(spark, tmp_path)
    _create(consumer, tables=("t0",))
    df = spark.createDataFrame(
        [_ev("INSERT", 1, 1, 1.0)], STAGING
    ).drop("_database", "_table")
    consumer.apply_batch("db", "t0", df, 0)
    with caplog.at_level(logging.WARNING):
        consumer.apply_ddl(
            DDLEvent(DDLOp.RENAME_TABLE, "db", "t0", sequence_num=9)
        )
    assert any("RENAME_TABLE is not supported" in r.message for r in caplog.records)
    t = consumer.table("db", "t0")
    assert t.read().count() == 1 and t.latest_batch_id() == 0


def test_mixed_stream_item_resume(spark, tmp_path):
    """run_mixed_stream resumes from its item-level commit log."""
    consumer = _consumer(spark, tmp_path)
    cp = os.path.join(str(tmp_path), "cp")
    create = DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=SRC, primary_keys=["user_id"])
    d0 = spark.createDataFrame(
        [("INSERT", 1, 1, 1.0, None, None), ("INSERT", 2, 2, 2.0, None, None)], MIXED
    ).drop("props")
    d1 = spark.createDataFrame(
        [("UPDATE", 3, 1, 10.0, None, 1), ("INSERT", 4, 5, 5.0, None, None)], MIXED
    ).drop("props")
    items = [("ddl", create), ("dml", d0), ("dml", d1)]
    run_mixed_stream(consumer, items[:2], "db", "t", cp)
    # resume with the full stream: items 0-1 skip via the commit log
    run_mixed_stream(consumer, items, "db", "t", cp)
    got = {r["user_id"]: r["value"] for r in consumer.table("db", "t").read().collect()}
    assert got == {1: 10.0, 2: 2.0, 5: 5.0}
