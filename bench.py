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
# Default sized so the CDC number is the STEADY-STATE one: per-batch wall
# has a ~6-14s serial floor (driver actions + commit), so small batches
# report fixed overhead, not throughput (round 2's 12.7k ev/s artifact vs
# the 495k ev/s the 8M-batch scaling harness measures — VERDICT r2 #4).
# 16M events = 1 warmup + 3 steady 4M-event batches; the headline rate is
# the median steady batch, the same statistic BENCH/BASELINE.md reports.
CDC_EVENTS = int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "16000000"))
CDC_BATCH = int(os.environ.get("SPARK_GRAFT_CDC_BATCH", "4000000"))


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


def run_cdc_apply(
    spark, n_events: int, batch_size: int | None = None, warmup_batches: int = 1
) -> dict:
    """Flagship: end-to-end CDC apply throughput (events/sec) — generator
    -> staged batches -> flatten -> merge -> atomic snapshot commits.

    ``events_per_sec`` is the MEDIAN STEADY BATCH rate (first
    ``warmup_batches`` excluded — they pay JIT/codegen/Arrow spin-up a
    long-lived replicator amortizes to zero); the overall rate including
    warmup is reported alongside."""
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
    if batch_size is None:
        batch_size = min(CDC_BATCH, n_events)
    n_keys = max(1000, n_events // 20)
    ev = synth_events(
        spark, n_events, n_keys, batch_size=batch_size, pk_move_frac=0.02
    ).persist()
    ev.count()  # materialize the generator outside the timed region
    n_batches = (n_events + batch_size - 1) // batch_size
    batches = [(b, ev.filter(ev[C.BATCH_ID] == b)) for b in range(n_batches)]
    t0 = time.monotonic()
    metrics = run_microbatch_loop(
        consumer, batches, "web", "pages", os.path.join(root, "cp")
    )
    wall = time.monotonic() - t0
    ev.unpersist()
    final_rows = consumer.table("web", "pages").read().count()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    per_batch = [m["wall_sec"] for m in metrics if not m.get("skipped")]
    steady = per_batch[warmup_batches:] if len(per_batch) > warmup_batches else per_batch
    steady_rates = sorted(batch_size / w for w in steady)
    median_rate = steady_rates[len(steady_rates) // 2]
    return {
        "n_events": n_events,
        "batch_size": batch_size,
        "wall_sec": round(wall, 3),
        # headline: median steady batch (the statistic the scaling
        # harness and BENCH/BASELINE.md report)
        "events_per_sec": round(median_rate, 1),
        "overall_events_per_sec": round(n_events / wall, 1),
        "per_batch_sec": [round(w, 3) for w in per_batch],
        "warmup_batches": warmup_batches,
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
