"""O22 late sort-key upgrade + persisted sort-key state + flexible
column naming through the consumer.

Reference parity: addSortKeyToTargetTable
(BigQueryEventConsumer.java:1587-1603), sort-key persistence via
BigQueryTableState/putState (:551-552,1605-1613), flexible naming
(BigQueryUtils.java:45-48).
"""

import os

from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp, SourceProperties

SRC = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

ORDERED_STAGING = T.StructType(
    [
        T.StructField(C.OPERATION, T.StringType(), False),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("_before_user_id", T.LongType(), True),
    ]
)

UNORDERED_STAGING = T.StructType(
    list(ORDERED_STAGING.fields)
    + [
        T.StructField(C.SOURCE_TIMESTAMP, T.LongType(), True),
        T.StructField(
            C.SORT_KEYS,
            T.StructType([T.StructField("_key_0", T.LongType(), True)]),
            True,
        ),
    ]
)


def test_ordered_to_unordered_upgrade_and_default_resume(spark, tmp_path):
    wh = os.path.join(str(tmp_path), "wh")

    # phase 1: ordered source creates the table and loads two rows
    a = EventConsumer(spark, wh, num_buckets=2)
    a.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=SRC, primary_keys=["user_id"])
    )
    b0 = spark.createDataFrame(
        [("INSERT", 1, 1, 1.0, None), ("INSERT", 2, 2, 2.0, None)], ORDERED_STAGING
    )
    a.apply_batch("db", "t", b0, 0)
    assert all(f.name != C.SORT_KEYS for f in a.table("db", "t").schema.fields)

    # phase 2: source upgrades to unordered with one sort key — the
    # first unordered merge appends _sort to the target and persists the
    # types in the same snapshot
    up = EventConsumer(
        spark, wh,
        source=SourceProperties(
            ordering=C.UN_ORDERED, sort_key_types=[T.LongType()]
        ),
        num_buckets=2,
    )
    b1 = spark.createDataFrame(
        [
            ("INSERT", 3, 3, 3.0, None, 1, (1,)),
            ("UPDATE", 4, 3, 33.0, 3, 2, (2,)),  # newer sort key wins
            ("UPDATE", 5, 1, 111.0, 1, 2, (2,)),  # pre-upgrade row: NULL
            # ordering metadata on T -> guard NULL -> no-op (faithful to
            # the reference's ternary ordering condition)
        ],
        UNORDERED_STAGING,
    )
    up.apply_batch("db", "t", b1, 1)
    t = up.table("db", "t")
    assert any(f.name == C.SORT_KEYS for f in t.schema.fields)
    props = t.current_snapshot()["properties"]
    assert props["ordering"] == C.UN_ORDERED
    assert props["sort_key_types"] == [T.LongType().json()]
    state = {r["user_id"]: r for r in t.read().collect()}
    assert state[3]["value"] == 33.0 and state[3][C.SEQUENCE_NUM] == 4
    assert state[1]["value"] == 1.0  # late event vs NULL ordering: no-op

    # phase 3: resume with a DEFAULT-constructed consumer — ordering and
    # sort-key types come from the persisted table properties.  The
    # discriminator: an unordered DELETE leaves a tombstone carrying the
    # delete's values (ordered semantics would hard-remove the row).
    c = EventConsumer(spark, wh, num_buckets=2)
    b2 = spark.createDataFrame(
        [("DELETE", 6, 3, 33.0, 3, 3, (3,))], UNORDERED_STAGING
    )
    c.apply_batch("db", "t", b2, 2)
    state = {r["user_id"]: r for r in c.table("db", "t").read().collect()}
    assert state[3][C.IS_DELETED] is True
    assert state[3][C.SEQUENCE_NUM] == 6  # tombstone carries D's seq


def test_dataset_name_override_and_empty_fallback(spark, tmp_path):
    """Reference datasetName conf: a fixed dataset override routes every
    source database into one dataset; empty string falls back to the
    normalized database name (BigQueryTarget.java:332-338,
    BigQueryConsumerTest.java:274-305)."""
    import os as _os

    rows = [("INSERT", 1, 1, 1.0, None)]
    fixed = EventConsumer(
        spark, _os.path.join(str(tmp_path), "w1"), num_buckets=2,
        dataset_name="lake_ds",
    )
    fixed.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "src_db", "t", schema=SRC,
                 primary_keys=["user_id"])
    )
    fixed.apply_batch(
        "src_db", "t", spark.createDataFrame(rows, ORDERED_STAGING), 0
    )
    assert _os.path.isdir(_os.path.join(str(tmp_path), "w1", "lake_ds", "t"))
    assert fixed.table("src_db", "t").read().count() == 1

    fallback = EventConsumer(
        spark, _os.path.join(str(tmp_path), "w2"), num_buckets=2,
        dataset_name="",
    )
    fallback.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "src db!", "t", schema=SRC,
                 primary_keys=["user_id"])
    )
    assert _os.path.isdir(_os.path.join(str(tmp_path), "w2", "src_db_", "t"))


def test_flexible_column_naming_through_consumer(spark, tmp_path):
    dirty = T.StructType(
        [
            T.StructField("user id", T.LongType(), True),
            T.StructField("a&b", T.DoubleType(), True),
        ]
    )
    staging = T.StructType(
        [
            T.StructField(C.OPERATION, T.StringType(), False),
            T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
            T.StructField("user id", T.LongType(), True),
            T.StructField("a&b", T.DoubleType(), True),
            T.StructField("_before_user id", T.LongType(), True),
        ]
    )
    rows = [("INSERT", 1, 1, 1.5, None)]

    strict = EventConsumer(spark, os.path.join(str(tmp_path), "s"), num_buckets=2)
    strict.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=dirty, primary_keys=["user id"])
    )
    strict.apply_batch("db", "t", spark.createDataFrame(rows, staging), 0)
    cols = set(strict.table("db", "t").read().columns)
    assert {"user_id", "a_b"} <= cols

    flex = EventConsumer(
        spark, os.path.join(str(tmp_path), "f"), num_buckets=2,
        flexible_column_naming=True,
    )
    flex.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=dirty, primary_keys=["user id"])
    )
    flex.apply_batch("db", "t", spark.createDataFrame(rows, staging), 0)
    cols = set(flex.table("db", "t").read().columns)
    # flexible charset keeps '&' and space (BigQueryUtils.java:45-48)
    assert {"user id", "a&b"} <= cols
