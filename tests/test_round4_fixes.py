"""Round-4 items, each pinned by a regression test:

- DROP + re-CREATE (generation bump) for one table mid-multi-table
  stream, via STANDALONE DDL control events — the reference's
  truncate/drop sequences (BigQueryEventConsumerTest.java:511-526,
  788-885) composed with the multi-table fan-out (O23 x O27).
- A table born by a standalone CREATE mid-stream joins the cached
  topology and receives its post-CREATE DML.
"""

import pytest
from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
from bigquery_delta_plugins_spark.streaming.driver import run_mixed_stream_multi
from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp

SRC = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

MULTI = T.StructType(
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


def _consumer(spark, path, **kw):
    return EventConsumer(spark, str(path), num_buckets=2, **kw)


def _create(c, tables):
    for t in tables:
        c.apply_ddl(
            DDLEvent(DDLOp.CREATE_TABLE, "db", t, schema=SRC, primary_keys=["user_id"])
        )


def _rows(spark, rows):
    return spark.createDataFrame(rows, MULTI)


def _state(c, db, tb):
    return {r["user_id"]: r["value"] for r in c.table(db, tb).read().collect()}


def test_multi_table_drop_recreate_mid_stream(spark, tmp_path):
    """A standalone DROP then re-CREATE for ONE table mid-multi-table
    stream bumps that table's generation: its snapshot history and
    batch-id barrier reset, post-re-CREATE DML applies from scratch,
    and the sibling table's merge chain is untouched.  The reference's
    drop/truncate sequences (BigQueryEventConsumerTest.java:511-526,
    788-885) over the O23 fan-out.

    Oracle: the re-created table's final state must equal a FRESH table
    fed only the post-re-CREATE segment of its sub-stream (drop+create
    == table born at the create point) — checked against an independent
    consumer replay, plus the sibling's full-stream replay."""
    c = _consumer(spark, tmp_path / "wh")
    _create(c, tables=("a", "b"))
    cp = str(tmp_path / "cp")
    b0 = _rows(spark, [
        ("INSERT", 1, 1, 1.0, None, "db", "a"),
        ("INSERT", 2, 2, 2.0, None, "db", "b"),
        ("INSERT", 3, 3, 3.0, None, "db", "b"),
    ])
    drop = DDLEvent(DDLOp.DROP_TABLE, "db", "b", sequence_num=4)
    recreate = DDLEvent(DDLOp.CREATE_TABLE, "db", "b", schema=SRC,
                        primary_keys=["user_id"], sequence_num=5)
    post = [  # table b's post-re-CREATE sub-stream
        ("INSERT", 6, 30, 30.0, None, "db", "b"),
        ("UPDATE", 7, 30, 31.0, 30, "db", "b"),
        ("INSERT", 8, 40, 40.0, None, "db", "b"),
        ("DELETE", 9, 40, 40.0, 40, "db", "b"),
    ]
    b1 = _rows(spark, [("UPDATE", 10, 1, 10.0, 1, "db", "a")] + post)
    items = [("dml", b0), ("ddl", drop), ("ddl", recreate), ("dml", b1)]

    # run the first three items, then resume across the DDL boundary
    # from the checkpoint (crash window between re-CREATE and b1)
    run_mixed_stream_multi(c, items[:3], cp, tables=[("db", "a"), ("db", "b")])
    assert c.table("db", "b").read().count() == 0  # generation bumped
    assert c.table("db", "b").latest_batch_id() == -1
    run_mixed_stream_multi(c, items, cp, tables=[("db", "a"), ("db", "b")])

    # oracle 1: sibling table a == full-stream replay on a fresh consumer
    # oracle 2: re-created b == fresh table fed only the post-CREATE rows
    o = _consumer(spark, tmp_path / "oracle_wh")
    _create(o, tables=("a", "b"))
    o.apply_batch("db", "a", _rows(spark, [
        ("INSERT", 1, 1, 1.0, None, "db", "a"),
        ("UPDATE", 10, 1, 10.0, 1, "db", "a"),
    ]).drop("_database", "_table"), 0)
    o.apply_batch("db", "b", _rows(spark, post).drop("_database", "_table"), 0)
    assert _state(c, "db", "a") == _state(o, "db", "a") == {1: 10.0}
    assert _state(c, "db", "b") == _state(o, "db", "b") == {30: 31.0}

    # generation bump visible in history: b has create + exactly one DML
    # commit; a has create + two
    assert c.table("db", "b").history().count() == 2
    assert c.table("db", "a").history().count() == 3
    # and the new generation's barrier reflects only the new stream ids
    assert c.table("db", "b").latest_batch_id() == 3 * EventConsumer.MIXED_BATCH_STRIDE

    # idempotent full replay: a fresh pass over the same checkpoint is
    # all skips — state and history unchanged (no double generation bump)
    run_mixed_stream_multi(c, items, cp, tables=[("db", "a"), ("db", "b")])
    assert _state(c, "db", "b") == {30: 31.0}
    assert c.table("db", "b").history().count() == 2


def test_multi_table_standalone_create_joins_cached_topology(spark, tmp_path):
    """tables=None: topology is discovered ONCE from the first batch and
    then maintained by DDL — a standalone CREATE mid-stream must add the
    new table to the cached fan-out (not wait for a re-discovery that
    never happens), and a standalone DROP must remove it so later
    batches don't fail on a missing table."""
    c = _consumer(spark, tmp_path / "wh")
    _create(c, tables=("a",))
    cp = str(tmp_path / "cp")
    b0 = _rows(spark, [("INSERT", 1, 1, 1.0, None, "db", "a")])
    create = DDLEvent(DDLOp.CREATE_TABLE, "db", "fresh", schema=SRC,
                      primary_keys=["user_id"], sequence_num=2)
    b1 = _rows(spark, [
        ("INSERT", 3, 2, 2.0, None, "db", "a"),
        ("INSERT", 4, 100, 100.0, None, "db", "fresh"),
    ])
    drop = DDLEvent(DDLOp.DROP_TABLE, "db", "fresh", sequence_num=5)
    b2 = _rows(spark, [("INSERT", 6, 3, 3.0, None, "db", "a")])
    run_mixed_stream_multi(
        c, [("dml", b0), ("ddl", create), ("dml", b1), ("ddl", drop), ("dml", b2)],
        cp, tables=None,
    )
    assert c.topology_discoveries == 1  # one cold-start scan, then DDL-maintained
    assert _state(c, "db", "a") == {1: 1.0, 2: 2.0, 3: 3.0}
    assert not c.table_exists("db", "fresh")
