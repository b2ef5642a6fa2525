"""Type-lattice end-to-end: DATETIME (TimestampNTZ), ARRAY<primitive>
and DECIMAL columns through create -> flatten -> merge -> read.

Reference parity: Schemas.convertType/convertLogicalType
(Schemas.java:61-106) — DATETIME (:102-103) is the type that forces the
reference onto its JSON encoder with 6-digit fractional-second trim
(StructuredRecordToJsonTest.java:38-89); Spark timestamps are natively
microsecond so the trim is inherent.  ARRAY<primitive> maps to REPEATED
(:137-146), DECIMAL(p<=38) to NUMERIC/BIGNUMERIC (:95-101)."""

import datetime as dt
from decimal import Decimal

from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp

SRC = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("dt", T.TimestampNTZType(), True),
        T.StructField("tags", T.ArrayType(T.IntegerType(), containsNull=False), True),
        T.StructField("amount", T.DecimalType(20, 4), True),
    ]
)

STAGING = T.StructType(
    [
        T.StructField(C.OPERATION, T.StringType(), False),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("dt", T.TimestampNTZType(), True),
        T.StructField("tags", T.ArrayType(T.IntegerType(), containsNull=False), True),
        T.StructField("amount", T.DecimalType(20, 4), True),
        T.StructField("_before_id", T.LongType(), True),
    ]
)

# sub-microsecond input would be trimmed by Spark's native us precision,
# exactly like the reference's 6-fractional-digit JSON trim
DT1 = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
DT2 = dt.datetime(2024, 3, 2, 1, 2, 3, 999999)


def test_datetime_array_decimal_roundtrip(spark, tmp_path):
    c = EventConsumer(spark, str(tmp_path / "wh"), num_buckets=2)
    c.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=SRC, primary_keys=["id"])
    )
    events = [
        ("INSERT", 1, 1, DT1, [1, 2, 3], Decimal("12345.6789"), None),
        ("INSERT", 2, 2, DT2, [], Decimal("-0.0001"), None),
        ("UPDATE", 3, 1, DT2, [9], Decimal("99999999999999.9999"), 1),
        ("DELETE", 4, 2, None, None, None, 2),
    ]
    c.apply_batch("db", "t", spark.createDataFrame(events, STAGING), 0)

    t = c.table("db", "t")
    fields = {f.name: f.dataType for f in t.schema.fields}
    assert isinstance(fields["dt"], T.TimestampNTZType)
    assert isinstance(fields["tags"], T.ArrayType)
    assert fields["amount"] == T.DecimalType(20, 4)

    rows = {r["id"]: r for r in t.read().collect()}
    assert set(rows) == {1}  # id 2 hard-deleted
    r = rows[1]
    assert r["dt"] == DT2  # microseconds preserved exactly
    assert r["tags"] == [9]
    assert r["amount"] == Decimal("99999999999999.9999")
    assert r[C.SEQUENCE_NUM] == 3

    # replay idempotence holds for exotic payload types too
    m = c.apply_batch("db", "t", spark.createDataFrame(events, STAGING), 0)
    assert m["skipped"]


NESTED = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("author", T.StringType(), True),
                    T.StructField("score", T.DoubleType(), True),
                ]
            ),
            True,
        ),
    ]
)

NESTED_STAGING = T.StructType(
    [
        T.StructField(C.OPERATION, T.StringType(), False),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("meta", NESTED["meta"].dataType, True),
        T.StructField("_before_id", T.LongType(), True),
    ]
)


def test_nested_struct_column_roundtrip(spark, tmp_path):
    """O19 RECORD -> STRUCT: nested struct payloads flow through
    flatten/merge/read untouched (Schemas.java:147-149)."""
    c = EventConsumer(spark, str(tmp_path / "whn"), num_buckets=2)
    c.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=NESTED, primary_keys=["id"])
    )
    events = [
        ("INSERT", 1, 1, ("alice", 0.5), None),
        ("UPDATE", 2, 1, ("bob", None), 1),
        ("INSERT", 3, 2, None, None),
    ]
    c.apply_batch("db", "t", spark.createDataFrame(events, NESTED_STAGING), 0)
    rows = {r["id"]: r["meta"] for r in c.table("db", "t").read().collect()}
    assert rows[1]["author"] == "bob" and rows[1]["score"] is None
    assert rows[2] is None


def test_exotic_types_in_single_job_mode(spark, tmp_path):
    c = EventConsumer(
        spark, str(tmp_path / "wh2"), num_buckets=2,
        single_job_per_batch=True, single_job_merge_strategy="broadcast",
    )
    c.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=SRC, primary_keys=["id"])
    )
    b0 = [("INSERT", 1, 1, DT1, [1], Decimal("1.0000"), None)]
    b1 = [("UPDATE", 2, 1, DT2, [1, 2], Decimal("2.5000"), 1)]
    c.apply_batch("db", "t", spark.createDataFrame(b0, STAGING), 0)
    c.apply_batch("db", "t", spark.createDataFrame(b1, STAGING), 1)
    t = c.table("db", "t")
    r = t.read().collect()[0]
    assert (r["dt"], r["tags"], r["amount"]) == (DT2, [1, 2], Decimal("2.5000"))
    # footer-based seq bookkeeping survives exotic column footers
    assert t.latest_merged_seq() == 2
