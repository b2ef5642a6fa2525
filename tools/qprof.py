#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

Times selected ``__spark_entry__.queries()`` entries with the noop sink
(so the computation, not the sink, is measured), labels jobs, and
optionally dumps ``.explain("formatted")`` to a plans directory.

Usage:
  python tools/qprof.py [--sf DIR] [--repeat N] [--plans OUTDIR] [query ...]

With no query names, runs every query.  Prints one line per query with
all repeat timings; plans are written as ``<query>.txt`` in OUTDIR.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import _warmup, build_session

    spark = build_session(args.cpus)
    qs = entrymod.queries()
    names = args.queries or list(qs)
    _warmup(spark, args.sf)
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
    for name in names:
        fn = qs[name]
        if args.plans:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        walls = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"qprof:{name}")
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: {walls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
