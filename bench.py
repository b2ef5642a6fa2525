#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Runs every operator query exposed by ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32), plus the flagship CDC apply
throughput benchmark (synthetic binlog replayed through the consumer's
flatten+merge+snapshot-commit pipeline).

Output: {"metric": ..., "value": <total query sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ..., "cdc": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CDC_EVENTS = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "200000"))


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    # Pinned heap: G1 commit/uncommit churn causes kernel page-fault
    # storms at high thread counts on this box (see BENCH/BASELINE.md).
    os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Xms8g -XX:+AlwaysPreTouch")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.local.dir", "/dev/shm/bdps-spark-tmp")
        .appName(f"bdps-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _force(df) -> int:
    """Execute the full plan; cheap terminal action (count of rows)."""
    return df.write.format("noop").mode("overwrite").save() or 0


def _warmup(spark, sf_dir: str) -> None:
    """Spin up the one-time session machinery (JIT, Arrow, python
    workers, parquet reader) so the FIRST timed query doesn't pay it —
    a long-lived engine amortizes these to zero.  Touches no query's
    actual data beyond one small table scan."""
    spark.range(100_000).selectExpr("sum(id * 3)").collect()
    try:
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
    except Exception:
        pass
    # spin the Arrow/python worker bridge once
    spark.range(1_000).mapInPandas(lambda it: it, "id long").count()


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    _warmup(spark, sf_dir)
    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)
    return timings


def run_cdc_apply(spark, n_events: int, batch_size: int = 50000) -> dict:
    """Flagship: end-to-end CDC apply throughput (events/sec) — generator
    -> staged batches -> flatten -> merge -> atomic snapshot commits."""
    from pyspark.sql import types as T

    from bigquery_delta_plugins_spark import constants as C
    from bigquery_delta_plugins_spark.sources.gen import synth_events
    from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
    from bigquery_delta_plugins_spark.streaming.driver import run_microbatch_loop
    from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp

    pages = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    root = tempfile.mkdtemp(prefix="bdps-bench-")
    consumer = EventConsumer(
        spark, os.path.join(root, "wh"), num_buckets=32, count_diff_rows=False,
        # the documented throughput mode (BENCH/BASELINE.md): one Spark
        # job per steady batch, byte-identical to the standard path;
        # synth_events is a valid binlog, so the unique-key source
        # contract holds and the merge scans the target exactly once
        single_job_per_batch=True, single_job_merge_strategy="broadcast",
        assume_unique_keys=True,
    )
    consumer.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "web", "pages", schema=pages, primary_keys=["url"])
    )
    n_keys = max(1000, n_events // 20)
    ev = synth_events(
        spark, n_events, n_keys, batch_size=batch_size, pk_move_frac=0.02
    ).persist()
    ev.count()  # materialize the generator outside the timed region
    batches = [
        (b, ev.filter(ev[C.BATCH_ID] == b))
        for b in range((n_events + batch_size - 1) // batch_size)
    ]
    t0 = time.monotonic()
    run_microbatch_loop(consumer, batches, "web", "pages", os.path.join(root, "cp"))
    wall = time.monotonic() - t0
    ev.unpersist()
    final_rows = consumer.table("web", "pages").read().count()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return {
        "n_events": n_events,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        "final_rows": final_rows,
        "cpus": CPUS,
    }


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = build_session(CPUS)
    try:
        timings = run_queries(spark, SF_DIR)
        cdc = run_cdc_apply(spark, CDC_EVENTS)
    finally:
        spark.stop()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cdc": cdc,
            }
        )
    )


if __name__ == "__main__":
    main()
