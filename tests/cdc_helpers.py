"""Shared fixtures for the CDC consumer/stream test suites: the
canonical (user_id, value) source, its staged single- and multi-table
event schemas (with and without the inline-DDL control column), and
tiny builders.  Extracted from the former round-numbered regression
modules so feature-named suites can share one set of shapes."""

import os
import time as _time

from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp

SRC = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

WIDE_SRC = T.StructType(SRC.fields + [T.StructField("extra", T.StringType(), True)])

STAGING = T.StructType(
    [
        T.StructField(C.OPERATION, T.StringType(), False),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("_before_user_id", T.LongType(), True),
    ]
)

MULTI = T.StructType(
    STAGING.fields
    + [
        T.StructField("_database", T.StringType(), True),
        T.StructField("_table", T.StringType(), True),
    ]
)

# Stream schema: the post-evolution superset (a parquet file stream
# reads one fixed schema; pre-ALTER rows carry NULL in late columns)
# plus the inline-DDL control column.
STREAM = T.StructType(
    [
        T.StructField(C.OPERATION, T.StringType(), True),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("extra", T.StringType(), True),
        T.StructField("_before_user_id", T.LongType(), True),
        T.StructField("_database", T.StringType(), True),
        T.StructField("_table", T.StringType(), True),
        T.StructField(C.DDL_PAYLOAD, T.StringType(), True),
    ]
)


def consumer(spark, tmp_path, **kw):
    return EventConsumer(spark, os.path.join(str(tmp_path), "wh"),
                         num_buckets=2, **kw)


def create_tables(c, tables=("t",), schema=SRC, db="db"):
    for t in tables:
        c.apply_ddl(
            DDLEvent(DDLOp.CREATE_TABLE, db, t, schema=schema,
                     primary_keys=["user_id"])
        )


def ins(spark, rows):
    """Single-table staged rows: (op, seq, uid, val, before)."""
    return spark.createDataFrame(rows, STAGING)


def multi_rows(spark, rows):
    """Multi-table staged rows: (op, seq, uid, val, before, db, tb)."""
    return spark.createDataFrame(rows, MULTI)


def dml(spark, rows):
    """STREAM-schema rows (op, seq, uid, val, extra, before, db, tb);
    the inline-DDL column rides NULL."""
    return spark.createDataFrame([r + (None,) for r in rows], STREAM)


def write_file(df, events_dir):
    df.coalesce(1).write.mode("append").parquet(events_dir)
    _time.sleep(1.05)  # distinct mtimes => deterministic file order
