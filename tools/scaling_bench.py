#!/usr/bin/env python
"""Two-parallelism scaling benchmark for the CDC apply pipeline.

BASELINE.json's north rule requires throughput scaling efficiency >=0.8
from N to 4N executors; the sandbox proxy (BASELINE.md) is the same job
on the same input at ``local[8]`` vs ``local[32]``.

Protocol:
1. Generate a deterministic synthetic binlog (Zipf-skewed urls, pk-moving
   updates, deletes) ONCE and write it to parquet — both runs read the
   identical bytes.
2. For each parallelism level, spawn a FRESH python/JVM subprocess (a
   shared JVM contaminates timings); the level replays every batch
   through the full pipeline: read -> normalize -> salted flatten ->
   vectorized html->text extraction on the survivors (pandas UDF) ->
   merge -> atomic snapshot commit.  Batch 0 is warmup (JIT/codegen/
   Arrow/python-worker spinup — one-time costs a long-lived streaming
   job amortizes to zero); steady-state throughput is batches 1..N.
3. Efficiency = (thr_hi / thr_lo) / (cpus_hi / cpus_lo).  The final-state
   fingerprints must be identical across levels (determinism evidence).

Environment findings baked into the session config (see BENCH/BASELINE.md):
- ``spark.local.dir`` on tmpfs: shuffle to RAM — on this box disk shuffle
  caps flatten scaling at ~1.6x.
- ``-Xms`` pinned + ``-XX:+AlwaysPreTouch``: without a pinned heap, G1
  repeatedly commits/uncommits pages and the kernel spends >95% sys time
  in page-table/TLB churn at 32 threads (observed 60-100s random stalls).
- ``num_buckets`` is a TABLE property — identical at every cluster size.

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

N_EVENTS = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "16000000"))
BATCH_SIZE = int(os.environ.get("SPARK_GRAFT_SCALE_BATCH", "2000000"))
NUM_BUCKETS = int(os.environ.get("SPARK_GRAFT_SCALE_BUCKETS", "32"))
# Two warmup batches: batch 0 merges into an EMPTY table (a different
# physical plan than the steady path), so its codegen doesn't warm the
# real merge; batch 1 compiles + JITs the steady plan.
WARMUP_BATCHES = int(os.environ.get("SPARK_GRAFT_SCALE_WARMUP", "2"))
# Fixed keyspace so the target table CONVERGES (~N_URLS rows) after the
# warmup batches — steady-state batches then do stationary work; a
# growing table would conflate scaling with table-size drift.
N_URLS = int(os.environ.get("SPARK_GRAFT_SCALE_URLS", "200000"))
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")]
JVM_OPTS = os.environ.get("SPARK_GRAFT_JVM_OPTS", "-Xms8g -XX:+AlwaysPreTouch")


def session(cpus: int):
    from pyspark.sql import SparkSession

    if JVM_OPTS:
        os.environ["SPARK_SUBMIT_OPTS"] = (
            os.environ.get("SPARK_SUBMIT_OPTS", "") + " " + JVM_OPTS
        )
    sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS") or str(cpus * 2)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bdps-scale-{cpus}")
        .config("spark.sql.shuffle.partitions", sp)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.local.dir", "/dev/shm/bdps-spark-tmp")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, extra.split(";")):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()


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
    from pyspark.sql import types as T

    from bigquery_delta_plugins_spark import constants as C
    from bigquery_delta_plugins_spark.functions.extract import (
        extract_text_transform,
    )
    from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
    from bigquery_delta_plugins_spark.streaming.driver import run_microbatch_loop
    from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp

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
    # num_buckets is a TABLE property — identical at every cluster size,
    # exactly as a real Iceberg table's bucket spec would be.
    consumer = EventConsumer(
        spark,
        os.path.join(root, "wh"),
        num_buckets=NUM_BUCKETS,
        count_diff_rows=False,
        row_transform=extract_text_transform,
        # ONE Spark job per steady batch (stats folded away; seq
        # bookkeeping from parquet footers) — the serial-floor cut that
        # the N->4N efficiency gate needs.
        single_job_per_batch=os.environ.get("SPARK_GRAFT_SINGLE_JOB", "1") != "0",
        single_job_merge_strategy=os.environ.get(
            "SPARK_GRAFT_MERGE_STRATEGY", "broadcast"
        ),
        # synth_events is a valid binlog -> the unique-key source
        # contract holds -> single-target-scan broadcast merge
        assume_unique_keys=os.environ.get("SPARK_GRAFT_UNIQUE_KEYS", "1") != "0",
    )
    consumer.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "web", "pages", schema=pages, primary_keys=["url"])
    )
    ev = spark.read.parquet(events_dir)
    n_batches = N_EVENTS // BATCH_SIZE
    batches = [(b, ev.filter(F.col(C.BATCH_ID) == b)) for b in range(n_batches)]

    # First WARMUP_BATCHES batches warm the process; steady-state
    # throughput is measured over the rest.
    cp = os.path.join(root, "cp")
    t0 = time.monotonic()
    run_microbatch_loop(consumer, batches[:WARMUP_BATCHES], "web", "pages", cp)
    warmup = time.monotonic() - t0
    t0 = time.monotonic()
    metrics = run_microbatch_loop(consumer, batches, "web", "pages", cp)
    wall = time.monotonic() - t0
    steady_events = N_EVENTS - WARMUP_BATCHES * BATCH_SIZE

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
    import statistics

    walls = [m["wall_sec"] for m in metrics]
    med = statistics.median(walls) if walls else None
    print(
        json.dumps(
            {
                "cpus": cpus,
                "warmup_sec": round(warmup, 3),
                "wall_sec": round(wall, 3),
                "events_per_sec": round(steady_events / wall, 1),
                "median_batch_sec": med,
                "median_events_per_sec": round(BATCH_SIZE / med, 1) if med else None,
                "per_batch_sec": walls,
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

    reuse = os.environ.get("SPARK_GRAFT_SCALE_EVENTS_DIR")
    if reuse and os.path.exists(os.path.join(reuse, "_SUCCESS")):
        events_dir, gen_sec = reuse, 0.0
    else:
        events_dir = (reuse or tempfile.mkdtemp(prefix="bdps-scale-events-") + "/events")
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

    def eff(lo, hi, key):
        return round((hi[key] / lo[key]) / (hi["cpus"] / lo["cpus"]), 3)

    pairs = {
        f"{lo['cpus']}->{hi['cpus']}": {
            "overall": eff(lo, hi, "events_per_sec"),
            "median_batch": eff(lo, hi, "median_events_per_sec"),
        }
        for lo, hi in zip(results, results[1:])
    }
    report = {
        "n_events": N_EVENTS,
        "batch_size": BATCH_SIZE,
        "n_urls": N_URLS,
        "num_buckets": NUM_BUCKETS,
        "warmup_batches": WARMUP_BATCHES,
        "gen_sec": gen_sec,
        "levels": results,
        "scaling_efficiency": pairs,
        "state_identical": len({r["state_hash"] for r in results}) == 1
        and len({r["final_rows"] for r in results}) == 1,
    }
    print(json.dumps(report))
    if not reuse:
        import shutil

        shutil.rmtree(os.path.dirname(events_dir), ignore_errors=True)


if __name__ == "__main__":
    main()
