#!/usr/bin/env python
"""One level of the scaling pipeline with per-batch phase timing.
Usage: python tools/diag_level.py <cpus> <events_dir> <n_batches>
(run the generator first via scaling_bench, or pass any partitioned
events dir).  Must run in a FRESH process — see memory: JVM reuse
contaminates timings."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus, events_dir, n_batches = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])

from tools.scaling_bench import NUM_BUCKETS, session  # noqa: E402

spark = session(cpus)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from bigquery_delta_plugins_spark import constants as C  # noqa: E402
from bigquery_delta_plugins_spark.functions.extract import (  # noqa: E402
    extract_text_transform,
)
from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer  # noqa: E402
from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp  # noqa: E402

pages = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)
root = tempfile.mkdtemp(prefix=f"diaglvl-{cpus}-")
consumer = EventConsumer(
    spark,
    os.path.join(root, "wh"),
    num_buckets=NUM_BUCKETS,
    count_diff_rows=False,
    row_transform=None
    if os.environ.get("SPARK_GRAFT_DIAG_NO_EXTRACT")
    else extract_text_transform,
    single_job_per_batch=os.environ.get("SPARK_GRAFT_SINGLE_JOB", "1") != "0",
    single_job_merge_strategy=os.environ.get("SPARK_GRAFT_MERGE_STRATEGY", "broadcast"),
)
consumer.apply_ddl(
    DDLEvent(DDLOp.CREATE_TABLE, "web", "pages", schema=pages, primary_keys=["url"])
)
ev = spark.read.parquet(events_dir)
for b in range(n_batches):
    t = time.monotonic()
    m = consumer.apply_batch("web", "pages", ev.filter(F.col(C.BATCH_ID) == b), b)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "batch": b,
                "wall": round(time.monotonic() - t, 2),
                "phases": m.get("phases"),
                "n_events": m.get("n_events"),
            }
        ),
        flush=True,
    )
import shutil

shutil.rmtree(root, ignore_errors=True)
spark.stop()
