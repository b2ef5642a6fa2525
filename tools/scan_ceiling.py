#!/usr/bin/env python
"""Interleaved bare-parquet-scan ceiling for the scaling gate.

The strongest baseline any input-reading job can post on this box:
``read.parquet -> sum(length(html)) + max(seq)`` over the SAME staged
binlog batches the CDC pipeline replays — no engine code at all.  Run
under the SAME interleaved protocol as tools/scaling_bench.py (both
level JVMs alive, single batches alternated, leader swapped per pair)
so the pipeline efficiency and the ceiling are measured apples-to-
apples under identical noise conditions.

Usage:
  SPARK_GRAFT_SCALE_EVENTS_DIR=<events> python tools/scan_ceiling.py
  (env knobs shared with scaling_bench: SPARK_GRAFT_SCALE_EVENTS/_BATCH/
   _LEVELS/_WARMUP, SPARK_GRAFT_JVM_OPTS)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scaling_bench as SB


def run_worker(cpus: int, events_dir: str) -> None:
    from pyspark.sql import functions as F

    from bigquery_delta_plugins_spark import constants as C

    spark = SB.session(cpus)
    ev = spark.read.parquet(events_dir)

    def scan(b: int):
        return ev.filter(F.col(C.BATCH_ID) == b).agg(
            F.sum(F.length("html")), F.max(C.SEQUENCE_NUM)
        ).first()

    def say(obj) -> None:
        print(json.dumps(obj), flush=True)

    say({"ready": cpus})
    for line in sys.stdin:
        cmd = line.strip().split()
        if not cmd:
            continue
        if cmd[0] == "warmup":
            t0 = time.monotonic()
            for b in range(SB.WARMUP_BATCHES):
                scan(b)
            say({"warmup_sec": round(time.monotonic() - t0, 3)})
        elif cmd[0] == "batch":
            b = int(cmd[1])
            t0 = time.monotonic()
            r = scan(b)
            say({"batch": b, "sec": round(time.monotonic() - t0, 4),
                 "bytes": int(r[0]), "max_seq": int(r[1])})
        elif cmd[0] == "finish":
            say({"done": True})
            break
    spark.stop()


class _Worker(SB._Worker):
    def __init__(self, cpus: int, events_dir: str):
        self.cpus = cpus
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cpus), events_dir],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1, env={**os.environ},
        )
        ready = self._read()
        assert ready.get("ready") == cpus, ready


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]), sys.argv[3])
        return

    events_dir = os.environ["SPARK_GRAFT_SCALE_EVENTS_DIR"]
    assert len(SB.LEVELS) == 2
    lo_cpus, hi_cpus = SB.LEVELS
    n_batches = SB.N_EVENTS // SB.BATCH_SIZE
    steady = list(range(SB.WARMUP_BATCHES, n_batches))

    lo = _Worker(lo_cpus, events_dir)
    warm_lo = lo.send("warmup")["warmup_sec"]
    hi = _Worker(hi_cpus, events_dir)
    warm_hi = hi.send("warmup")["warmup_sec"]

    walls: dict[int, list[float]] = {lo_cpus: [], hi_cpus: []}
    for i, b in enumerate(steady):
        order = (lo, hi) if i % 2 == 0 else (hi, lo)
        for w in order:
            r = w.send(f"batch {b}")
            walls[w.cpus].append(r["sec"])
            print(json.dumps({"cpus": w.cpus, **r}), file=sys.stderr, flush=True)
    lo.send("finish")
    hi.send("finish")
    lo.close()
    hi.close()

    speedup = hi_cpus / lo_cpus
    pair_eff = [
        round((a / b) / speedup, 4)
        for a, b in zip(walls[lo_cpus], walls[hi_cpus])
    ]
    med = {c: statistics.median(walls[c]) for c in walls}
    print(json.dumps({
        "protocol": "interleaved-scan-ceiling",
        "n_events": SB.N_EVENTS,
        "batch_size": SB.BATCH_SIZE,
        "levels": [
            {"cpus": c, "warmup_sec": w, "median_batch_sec": med[c],
             "per_batch_sec": walls[c]}
            for c, w in ((lo_cpus, warm_lo), (hi_cpus, warm_hi))
        ],
        "scaling_efficiency": {
            f"{lo_cpus}->{hi_cpus}": {
                "median_batch": round((med[lo_cpus] / med[hi_cpus]) / speedup, 3),
                "median_pair": round(statistics.median(pair_eff), 3),
                "per_pair": pair_eff,
            }
        },
    }))


if __name__ == "__main__":
    main()
