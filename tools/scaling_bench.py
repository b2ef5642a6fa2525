#!/usr/bin/env python
"""Two-parallelism scaling benchmark for the CDC apply pipeline.

BASELINE.json's north rule requires throughput scaling efficiency >=0.8
from N to 4N executors; the sandbox proxy (BASELINE.md) is the same job
on the same input at ``local[8]`` vs ``local[32]``.

Protocol:
1. Generate a deterministic synthetic binlog (Zipf-skewed urls, pk-moving
   updates, deletes) ONCE and write it to parquet — both runs read the
   identical bytes.
2. For each parallelism level, spawn a FRESH python/JVM subprocess (no
   warm-JIT bias) that replays every batch through the full pipeline:
   read -> normalize -> vectorized html->text extraction (pandas UDF) ->
   salted flatten -> merge -> atomic snapshot commit, and report wall
   time + a value fingerprint of the final table.
3. Efficiency = (thr_hi / thr_lo) / (cpus_hi / cpus_lo).  The final-state
   fingerprints must be identical across levels (determinism evidence).

Usage:
  python tools/scaling_bench.py                 # orchestrate both levels
  python tools/scaling_bench.py --run 8 <dir>   # (internal) one level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "2000000"))
BATCH_SIZE = int(os.environ.get("SPARK_GRAFT_SCALE_BATCH", "500000"))
N_URLS = max(1000, N_EVENTS // 20)
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")]


def session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bdps-scale-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def generate(events_dir: str) -> None:
    from bigquery_delta_plugins_spark.sources.gen import synth_events

    spark = session(32)
    ev = synth_events(
        spark, N_EVENTS, N_URLS, batch_size=BATCH_SIZE, pk_move_frac=0.02
    )
    ev.write.mode("overwrite").partitionBy("_batch_id").parquet(events_dir)
    spark.stop()


def run_level(cpus: int, events_dir: str) -> None:
    from pyspark.sql import functions as F

    from bigquery_delta_plugins_spark import constants as C
    from bigquery_delta_plugins_spark.functions.extract import (
        extract_text_transform,
    )
    from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
    from bigquery_delta_plugins_spark.streaming.driver import run_microbatch_loop
    from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp
    from pyspark.sql import types as T

    spark = session(cpus)
    pages = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    root = tempfile.mkdtemp(prefix=f"bdps-scale-{cpus}-")
    consumer = EventConsumer(
        spark,
        os.path.join(root, "wh"),
        num_buckets=cpus * 2,
        count_diff_rows=False,
        row_transform=extract_text_transform,
    )
    consumer.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "web", "pages", schema=pages, primary_keys=["url"])
    )
    ev = spark.read.parquet(events_dir)
    n_batches = N_EVENTS // BATCH_SIZE
    batches = [(b, ev.filter(F.col(C.BATCH_ID) == b)) for b in range(n_batches)]

    t0 = time.monotonic()
    run_microbatch_loop(consumer, batches, "web", "pages", os.path.join(root, "cp"))
    wall = time.monotonic() - t0

    final = consumer.table("web", "pages").read()
    fp = final.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.pmod(
                F.xxhash64("url", C.SEQUENCE_NUM, "text", "lang"),
                F.lit(1_000_000_007),
            )
        ).alias("h"),
        F.max(C.SEQUENCE_NUM).alias("max_seq"),
    ).first()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_sec": round(wall, 3),
                "events_per_sec": round(N_EVENTS / wall, 1),
                "final_rows": fp["rows"],
                "state_hash": int(fp["h"]),
                "max_seq": fp["max_seq"],
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        run_level(int(sys.argv[2]), sys.argv[3])
        return

    events_dir = tempfile.mkdtemp(prefix="bdps-scale-events-") + "/events"
    t0 = time.monotonic()
    generate(events_dir)
    gen_sec = round(time.monotonic() - t0, 1)

    results = []
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cpus), events_dir],
            capture_output=True,
            text=True,
            env={**os.environ},
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))

    lo, hi = results[0], results[-1]
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (hi["cpus"] / lo["cpus"])
    report = {
        "n_events": N_EVENTS,
        "batch_size": BATCH_SIZE,
        "n_urls": N_URLS,
        "gen_sec": gen_sec,
        "levels": results,
        "scaling_efficiency": round(eff, 3),
        "state_identical": len({r["state_hash"] for r in results}) == 1
        and len({r["final_rows"] for r in results}) == 1,
    }
    print(json.dumps(report))
    import shutil

    shutil.rmtree(os.path.dirname(events_dir), ignore_errors=True)


if __name__ == "__main__":
    main()
