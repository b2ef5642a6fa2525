"""Flexible naming + dataset override end-to-end through the
structured-stream front-end: dirty database/table/field names land
normalized in the overridden dataset with correct final state."""

import os

from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp


def test_dirty_names_streaming_e2e(spark, tmp_path):
    """VERDICT #9: flexible naming + dataset_name override exercised END
    TO END through run_structured_stream — dirty database/table/field
    names in the stream land normalized in the overridden dataset with
    correct final state."""
    import time as _time

    from bigquery_delta_plugins_spark.normalize import (
        get_normalized_dataset_name,
        normalize_field_name,
        normalize_table_name,
    )
    from bigquery_delta_plugins_spark.streaming.driver import run_structured_stream

    dirty_db, dirty_tb = "prod db!", "page-stats 2024"
    dirty_field = "2 weird field"
    src = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField(dirty_field, T.DoubleType(), True),
        ]
    )
    staging = T.StructType(
        [
            T.StructField(C.OPERATION, T.StringType(), False),
            T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField(dirty_field, T.DoubleType(), True),
            T.StructField("_before_user_id", T.LongType(), True),
        ]
    )
    c = EventConsumer(
        spark, str(tmp_path / "wh"),
        num_buckets=2,
        flexible_column_naming=True,
        dataset_name="lake ds override",
    )
    c.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, dirty_db, dirty_tb, schema=src,
                 primary_keys=["user_id"])
    )
    events_dir = str(tmp_path / "events")
    rows0 = [("INSERT", 1, 1, 1.5, None), ("INSERT", 2, 2, 2.5, None)]
    rows1 = [("UPDATE", 3, 1, 10.5, 1), ("DELETE", 4, 2, 2.5, 2)]
    for rows in (rows0, rows1):
        spark.createDataFrame(rows, staging).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)
        _time.sleep(1.05)  # distinct mtimes => deterministic file order
    run_structured_stream(
        spark, events_dir, staging, c, dirty_db, dirty_tb,
        str(tmp_path / "cp"), max_files_per_trigger=1,
    )
    # physical layout: overridden dataset + normalized table dir
    norm_ds = get_normalized_dataset_name("lake ds override", dirty_db)
    norm_tb = normalize_table_name(dirty_tb)
    assert os.path.isdir(os.path.join(str(tmp_path / "wh"), norm_ds, norm_tb))
    t = c.table(dirty_db, dirty_tb)
    norm_field = normalize_field_name(dirty_field, True)
    assert norm_field in [f.name for f in t.schema.fields]
    got = {r["user_id"]: r[norm_field] for r in t.read().collect()}
    assert got == {1: 10.5}
