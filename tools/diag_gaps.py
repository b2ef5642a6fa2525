#!/usr/bin/env python
"""Driver-gap diagnosis for the single-job apply: runs N batches with
the Spark event log enabled, then attributes each batch's wall to
(a) time covered by at least one RUNNING STAGE (executor-parallel) and
(b) driver gaps (planning, AQE re-plans, broadcast builds, commit) —
the per-batch serial floor the N->4N scaling gate pays at every level.
Usage: python tools/diag_gaps.py <cpus> <events_dir> <n_batches>
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus, events_dir, n_batches = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])

from tools.scaling_bench import NUM_BUCKETS, session  # noqa: E402

eventlog_dir = tempfile.mkdtemp(prefix="bdps-eventlog-")
os.makedirs("/dev/shm/bdps-spark-tmp", exist_ok=True)
# keep any caller-supplied extra conf (e.g. an AQE on/off experiment)
# and append the event-log settings this tool needs
_caller_extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
    (_caller_extra + ";" if _caller_extra else "")
    + f"spark.eventLog.enabled=true;spark.eventLog.dir={eventlog_dir};"
    "spark.eventLog.compress=false;spark.eventLog.rolling.enabled=false"
)
spark = session(cpus)
spark.sparkContext.setLogLevel("ERROR")

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
root = tempfile.mkdtemp(prefix=f"diaggap-{cpus}-")
consumer = EventConsumer(
    spark,
    os.path.join(root, "wh"),
    num_buckets=NUM_BUCKETS,
    count_diff_rows=False,
    row_transform=extract_text_transform,
    single_job_per_batch=True,
    single_job_merge_strategy="broadcast",
    assume_unique_keys=True,
)
consumer.apply_ddl(
    DDLEvent(DDLOp.CREATE_TABLE, "web", "pages", schema=pages, primary_keys=["url"])
)
ev = spark.read.parquet(events_dir)

windows = []  # (batch, t_start_ms, t_end_ms, wall, phases)
for b in range(n_batches):
    t0 = time.time() * 1000
    tm = time.monotonic()
    m = consumer.apply_batch("web", "pages", ev.filter(F.col(C.BATCH_ID) == b), b)
    windows.append((b, t0, time.time() * 1000, time.monotonic() - tm, m.get("phases")))

spark.stop()

# ---- parse event log: stage submit/complete intervals + task time sums
app = os.path.join(
    eventlog_dir,
    [f for f in os.listdir(eventlog_dir) if not f.startswith(".")][0],
)
if os.path.isdir(app):  # Spark 4 rolling event-log v2 layout
    parts = sorted(
        os.path.join(app, f)
        for f in os.listdir(app)
        if f.startswith("events")
    )
else:
    parts = [app]


def _lines():
    for p in parts:
        with open(p) as f:
            yield from f


stages = {}  # id -> [submit_ms, complete_ms]
task_ms = {}  # stage id -> sum of task run times
if True:
    for line in _lines():
        e = json.loads(line)
        ev_t = e.get("Event")
        if ev_t == "SparkListenerStageSubmitted":
            si = e["Stage Info"]
            stages.setdefault(si["Stage ID"], [None, None])[0] = si.get(
                "Submission Time"
            )
        elif ev_t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            rec = stages.setdefault(si["Stage ID"], [None, None])
            rec[0] = rec[0] or si.get("Submission Time")
            rec[1] = si.get("Completion Time")
        elif ev_t == "SparkListenerTaskEnd":
            ti = e.get("Task Info", {})
            sid = e.get("Stage ID")
            dur = (ti.get("Finish Time") or 0) - (ti.get("Launch Time") or 0)
            task_ms[sid] = task_ms.get(sid, 0) + max(dur, 0)

for b, t0, t1, wall, phases in windows:
    ivs = sorted(
        (max(s, t0), min(c, t1))
        for s, c in stages.values()
        if s is not None and c is not None and c > t0 and s < t1
    )
    covered = 0.0
    cur_s, cur_e = None, None
    for s, c in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, c
        else:
            cur_e = max(cur_e, c)
    if cur_e is not None:
        covered += cur_e - cur_s
    tsum = sum(
        tm
        for sid, tm in task_ms.items()
        if sid in stages
        and stages[sid][0] is not None
        and stages[sid][1] is not None
        and stages[sid][1] > t0
        and stages[sid][0] < t1
    )
    print(
        json.dumps(
            {
                "batch": b,
                "wall_s": round(wall, 2),
                "stage_covered_s": round(covered / 1000, 2),
                "driver_gap_s": round((t1 - t0 - covered) / 1000, 2),
                "task_time_core_s": round(tsum / 1000, 1),
                "parallelism_efficiency": round(tsum / max(covered, 1) / cpus, 2),
                "phases": phases,
            }
        ),
        flush=True,
    )
import shutil

shutil.rmtree(root, ignore_errors=True)
shutil.rmtree(eventlog_dir, ignore_errors=True)
